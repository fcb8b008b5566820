DROP DATABASE IF EXISTS tw_db;
CREATE DATABASE tw_db;

CREATE TABLE tw_db.t ( id int, v varchar(32), PRIMARY KEY (id) );
