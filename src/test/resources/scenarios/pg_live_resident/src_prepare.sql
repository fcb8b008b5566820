DROP DATABASE IF EXISTS live_pg;
CREATE DATABASE live_pg;

CREATE TABLE live_pg.orders_tb ( id int, v varchar(32), qty int, PRIMARY KEY (id) );
CREATE TABLE live_pg.noise_tb ( id int, v varchar(32), PRIMARY KEY (id) );

INSERT INTO live_pg.orders_tb VALUES (1,'a',10);
INSERT INTO live_pg.orders_tb VALUES (2,'b',20);
