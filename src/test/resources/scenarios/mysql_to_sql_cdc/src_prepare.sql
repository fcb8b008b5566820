DROP DATABASE IF EXISTS log_db;
CREATE DATABASE log_db;

CREATE TABLE log_db.orders ( id int, state varchar(32) DEFAULT NULL, amount decimal(8,2) DEFAULT NULL, PRIMARY KEY (id) );
INSERT INTO log_db.orders VALUES (1,'new',10.50);
INSERT INTO log_db.orders VALUES (2,'new',NULL);
