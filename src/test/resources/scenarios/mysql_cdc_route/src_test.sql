INSERT INTO src_db_1.one_pk_no_uk VALUES (1,10,'a'),(2,20,'b'),(3,30,'c');
INSERT INTO src_db_2.plain_tb VALUES (1,'x'),(2,'y');
UPDATE src_db_1.one_pk_no_uk SET f_1=11 WHERE f_0=1;
DELETE FROM src_db_2.plain_tb WHERE id=2;
DELETE FROM src_db_1.one_pk_no_uk WHERE f_0=3;
