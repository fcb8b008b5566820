INSERT INTO test_db_1.ignore_cols_1 VALUES(1, 1, 1, 1),(2, 2, 2, 2);
INSERT INTO test_db_1.ignore_cols_2 VALUES(1, 1, 1, 1),(2, 2, 2, 2);
UPDATE test_db_1.ignore_cols_1 SET f_1=9, f_2=9 WHERE f_0=1;
DELETE FROM test_db_1.ignore_cols_2 WHERE f_0=2;
