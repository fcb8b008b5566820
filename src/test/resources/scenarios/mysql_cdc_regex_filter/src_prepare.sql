DROP DATABASE IF EXISTS rf_db;
CREATE DATABASE rf_db;

CREATE TABLE rf_db.orders_2023 ( id int, v varchar(16), PRIMARY KEY (id) );
CREATE TABLE rf_db.orders_2024 ( id int, v varchar(16), PRIMARY KEY (id) );
CREATE TABLE rf_db.orders_tmp ( id int, v varchar(16), PRIMARY KEY (id) );
CREATE TABLE rf_db.audit_log ( id int, v varchar(16), PRIMARY KEY (id) );
