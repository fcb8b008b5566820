DROP DATABASE IF EXISTS test_db_1;
CREATE DATABASE test_db_1;

CREATE TABLE test_db_1.no_pk_no_uk ( f_0 tinyint DEFAULT NULL, f_1 smallint DEFAULT NULL, f_2 decimal(10,4) DEFAULT NULL, f_3 datetime(6) DEFAULT NULL, f_4 varchar(255) DEFAULT NULL, f_5 blob );
CREATE TABLE test_db_1.one_pk_no_uk ( f_0 tinyint, f_1 smallint DEFAULT NULL, f_2 decimal(10,4) DEFAULT NULL, f_3 datetime(6) DEFAULT NULL, f_4 varchar(255) DEFAULT NULL, f_5 blob, PRIMARY KEY (f_0) );
CREATE TABLE test_db_1.no_pk_one_uk ( f_0 tinyint DEFAULT NULL, f_1 smallint, f_2 smallint, f_3 varchar(255) DEFAULT NULL, UNIQUE KEY uk_1 (f_1,f_2) );
CREATE TABLE test_db_1.no_pk_multi_uk ( f_0 tinyint DEFAULT NULL, f_1 smallint, f_2 smallint, f_3 int, f_4 bigint, f_5 varchar(255), UNIQUE KEY uk_1 (f_1,f_2), UNIQUE KEY uk_2 (f_3,f_4) );
CREATE TABLE test_db_1.one_pk_multi_uk ( f_0 tinyint, f_1 smallint, f_2 smallint, f_3 int, f_4 varchar(255), PRIMARY KEY (f_0), UNIQUE KEY uk_1 (f_1,f_2) );
