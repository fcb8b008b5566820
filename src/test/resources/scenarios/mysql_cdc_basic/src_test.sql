INSERT INTO test_db_1.no_pk_no_uk VALUES (1,2,123456.1234,'2022-01-02 03:04:05.123456','ab',x'0123456789ABCDEF');
INSERT INTO test_db_1.no_pk_no_uk VALUES (2,2,123456.1234,'2022-01-02 03:04:05.123456','ab',x'0123456789ABCDEF');
INSERT INTO test_db_1.no_pk_no_uk VALUES (NULL, NULL, NULL, NULL, NULL, NULL);
INSERT INTO test_db_1.no_pk_no_uk VALUES (3,2,123456.1234,'2022-01-02 03:04:05.123456','ab',x'0123456789ABCDEF');
INSERT INTO test_db_1.no_pk_no_uk VALUES (NULL, NULL, NULL, NULL, NULL, NULL);

INSERT INTO test_db_1.one_pk_no_uk VALUES (1,2,123456.1234,'2022-01-02 03:04:05.123456','ab',x'0123456789ABCDEF');
INSERT INTO test_db_1.one_pk_no_uk VALUES (2,20,654321.4321,'2021-02-01 04:05:06.654321','1',x'ABCDEF0123456789');
INSERT INTO test_db_1.one_pk_no_uk VALUES (3, NULL, NULL, NULL, NULL, NULL);
INSERT INTO test_db_1.one_pk_no_uk VALUES (4,2,123456.1234,'2022-01-02 03:04:05.123456','ab',x'0123456789ABCDEF');
INSERT INTO test_db_1.one_pk_no_uk VALUES (5,20,654321.4321,'2021-02-01 04:05:06.654321','1',x'ABCDEF0123456789');

INSERT INTO test_db_1.no_pk_one_uk VALUES (1,1,1,'a');
INSERT INTO test_db_1.no_pk_one_uk VALUES (2,2,1,'b');
INSERT INTO test_db_1.no_pk_one_uk VALUES (3,3,1,'c');
INSERT INTO test_db_1.no_pk_one_uk VALUES (NULL, NULL, NULL, NULL);

INSERT INTO test_db_1.no_pk_multi_uk VALUES (1,1,1,1,5,'a');
INSERT INTO test_db_1.no_pk_multi_uk VALUES (2,2,1,2,50,'b');
INSERT INTO test_db_1.no_pk_multi_uk VALUES (3,3,1,3,5,'c');
INSERT INTO test_db_1.no_pk_multi_uk VALUES (NULL, NULL, NULL, NULL, NULL, NULL);

INSERT INTO test_db_1.one_pk_multi_uk VALUES (1,1,1,1,'a');
INSERT INTO test_db_1.one_pk_multi_uk VALUES (2,2,1,2,'b');
INSERT INTO test_db_1.one_pk_multi_uk VALUES (3,3,1,3,'c');
INSERT INTO test_db_1.one_pk_multi_uk VALUES (9, NULL, NULL, NULL, NULL);

UPDATE test_db_1.no_pk_no_uk SET f_1=20, f_4='upd' WHERE f_0=1;
UPDATE test_db_1.one_pk_no_uk SET f_1=21, f_4='upd' WHERE f_0=2;
UPDATE test_db_1.no_pk_one_uk SET f_3='upd' WHERE f_1=2;
UPDATE test_db_1.no_pk_multi_uk SET f_5='upd' WHERE f_1=2;
UPDATE test_db_1.one_pk_multi_uk SET f_4='upd' WHERE f_0=2;

DELETE FROM test_db_1.no_pk_no_uk WHERE f_0=3;
DELETE FROM test_db_1.one_pk_no_uk WHERE f_0=4;
DELETE FROM test_db_1.no_pk_one_uk WHERE f_1=3;
DELETE FROM test_db_1.no_pk_multi_uk WHERE f_1=3;
DELETE FROM test_db_1.one_pk_multi_uk WHERE f_0=3;
