CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.tb_a ( id int, v varchar(64), PRIMARY KEY (id) );
CREATE TABLE test_db_1.tb_b ( id int, v varchar(64), PRIMARY KEY (id) );
