DROP DATABASE IF EXISTS live_db;
CREATE DATABASE live_db;

CREATE TABLE live_db.orders_tb ( id int, v varchar(32), qty int, PRIMARY KEY (id) );
CREATE TABLE live_db.noise_tb ( id int, v varchar(32), PRIMARY KEY (id) );

INSERT INTO live_db.orders_tb VALUES (1,'a',10);
INSERT INTO live_db.orders_tb VALUES (2,'b',20);
INSERT INTO live_db.orders_tb VALUES (3,'c',NULL);
INSERT INTO live_db.noise_tb VALUES (9,'x');
