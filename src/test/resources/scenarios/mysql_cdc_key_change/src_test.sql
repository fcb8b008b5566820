INSERT INTO test_db_1.one_pk_no_uk VALUES (1,10,'a'),(2,20,'b'),(3,30,'c');
UPDATE test_db_1.one_pk_no_uk SET f_0=11 WHERE f_0=1;
UPDATE test_db_1.one_pk_no_uk SET f_0=22, f_1=21 WHERE f_0=2;
UPDATE test_db_1.one_pk_no_uk SET f_1=31 WHERE f_0=3;
DELETE FROM test_db_1.one_pk_no_uk WHERE f_0=22;
