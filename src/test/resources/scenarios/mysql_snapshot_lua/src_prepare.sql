DROP DATABASE IF EXISTS lua_test;
CREATE DATABASE lua_test;

CREATE TABLE lua_test.change_column_value_test ( id int, f_1 int DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE lua_test.filter_row_test ( id int, f_1 varchar(255) DEFAULT NULL, PRIMARY KEY (id) );
