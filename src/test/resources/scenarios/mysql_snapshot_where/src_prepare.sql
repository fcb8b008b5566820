CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.events_tb ( id int, kind varchar(16), v varchar(32), PRIMARY KEY (id) );
CREATE TABLE test_db_1.plain_tb ( id int, v varchar(32), PRIMARY KEY (id) );
