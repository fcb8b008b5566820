CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.one_pk_no_uk ( f_0 tinyint, f_1 smallint, f_2 varchar(64), PRIMARY KEY (f_0) );
