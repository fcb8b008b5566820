DROP DATABASE IF EXISTS feed_db;
CREATE DATABASE feed_db;

CREATE TABLE feed_db.orders ( id int, state varchar(32) DEFAULT NULL, amount decimal(10,2) DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE feed_db.audit ( id int, note varchar(64) DEFAULT NULL, PRIMARY KEY (id) );
