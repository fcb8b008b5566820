DROP DATABASE IF EXISTS chk_db;
CREATE DATABASE chk_db;

CREATE TABLE chk_db.accounts ( id int, owner varchar(32) DEFAULT NULL, balance decimal(10,2) DEFAULT NULL, PRIMARY KEY (id) );
-- shared baseline both sides start from
INSERT INTO chk_db.accounts VALUES (1,'ann',100.00);
INSERT INTO chk_db.accounts VALUES (2,'bob',200.00);
INSERT INTO chk_db.accounts VALUES (3,'cat',300.00);
