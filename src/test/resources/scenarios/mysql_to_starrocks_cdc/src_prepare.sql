DROP DATABASE IF EXISTS wh_db;
CREATE DATABASE wh_db;

CREATE TABLE wh_db.metrics ( id int, name varchar(32), val decimal(8,2) DEFAULT NULL, PRIMARY KEY (id) );
