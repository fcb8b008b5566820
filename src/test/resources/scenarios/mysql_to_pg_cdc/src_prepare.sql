CREATE DATABASE app_db;
CREATE TABLE app_db.orders_tb ( id int, status varchar(16), total decimal(10,4), PRIMARY KEY (id) );
CREATE TABLE app_db.lines_tb ( oid int, ln int, sku varchar(32), UNIQUE KEY uk (oid, ln) );
