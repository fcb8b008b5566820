INSERT INTO test_db_1.one_pk_no_uk VALUES (1,10,'a'),(2,20,'b'),(3,30,'c');
UPDATE test_db_1.one_pk_no_uk SET f_1=11 WHERE f_0=1;
DELETE FROM test_db_1.one_pk_no_uk WHERE f_0=2;
UPDATE test_db_1.one_pk_no_uk SET f_2='late' WHERE f_0=3;
