INSERT INTO test_db_1.one_pk_no_uk VALUES (1,10),(2,20),(3,30),(4,40),(5,50);
UPDATE test_db_1.one_pk_no_uk SET f_1=11 WHERE f_0=1;
DELETE FROM test_db_1.one_pk_no_uk WHERE f_0=4;
DELETE FROM test_db_1.one_pk_no_uk WHERE f_0=5;
