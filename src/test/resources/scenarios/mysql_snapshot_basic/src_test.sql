INSERT INTO test_db_1.one_pk_no_uk VALUES (1,2,123456.1234,'ab'),(2,20,654321.4321,'cd'),(3,NULL,NULL,NULL),(4,4,4.0000,'ef'),(5,5,5.5000,'gh');
INSERT INTO test_db_1.no_pk_no_uk VALUES (1,'a'),(1,'a'),(NULL,NULL);
