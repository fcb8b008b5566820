DROP DATABASE IF EXISTS lua_test;
CREATE DATABASE lua_test;

CREATE TABLE lua_test.default_table ( id int, cvarchar varchar(255) DEFAULT NULL, cnumeric varchar(64) DEFAULT NULL, cbool varchar(8) DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE lua_test.filter_tail_test ( id int, note varchar(255) DEFAULT NULL, PRIMARY KEY (id) );
