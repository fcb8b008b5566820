CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.no_pk_one_uk ( f_0 tinyint DEFAULT NULL, f_1 smallint, f_2 smallint, f_3 varchar(64), UNIQUE KEY uk_1 (f_1,f_2) );
