CREATE DATABASE src_db_1;
CREATE DATABASE src_db_2;
CREATE TABLE src_db_1.one_pk_no_uk ( f_0 tinyint, f_1 smallint, f_2 varchar(64), PRIMARY KEY (f_0) );
CREATE TABLE src_db_2.plain_tb ( id int, v varchar(64), PRIMARY KEY (id) );
