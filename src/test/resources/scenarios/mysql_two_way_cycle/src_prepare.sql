DROP DATABASE IF EXISTS tw_db;
CREATE DATABASE tw_db;

CREATE TABLE tw_db.accounts ( id int, owner varchar(32) DEFAULT NULL, balance int DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE tw_db.notes ( id int, body varchar(64) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO tw_db.accounts VALUES (1,'shared',100);
INSERT INTO tw_db.notes VALUES (1,'baseline');
