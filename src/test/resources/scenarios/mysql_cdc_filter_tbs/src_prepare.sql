CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.sync_a ( id int, v varchar(64), PRIMARY KEY (id) );
CREATE TABLE test_db_1.sync_skip ( id int, v varchar(64), PRIMARY KEY (id) );
CREATE TABLE test_db_1.other ( id int, v varchar(64), PRIMARY KEY (id) );
