INSERT INTO test_db_1.no_pk_one_uk VALUES (1,1,1,'a');
INSERT INTO test_db_1.no_pk_one_uk VALUES (2,NULL,2,'null-key-b');
INSERT INTO test_db_1.no_pk_one_uk VALUES (3,3,NULL,'null-key-c');
INSERT INTO test_db_1.no_pk_one_uk VALUES (4,4,4,'d');
UPDATE test_db_1.no_pk_one_uk SET f_3='b2' WHERE f_0=2;
UPDATE test_db_1.no_pk_one_uk SET f_1=5 WHERE f_0=3;
DELETE FROM test_db_1.no_pk_one_uk WHERE f_0=1;
UPDATE test_db_1.no_pk_one_uk SET f_1=NULL WHERE f_0=4;
