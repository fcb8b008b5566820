DROP DATABASE IF EXISTS sub_db;
CREATE DATABASE sub_db;

CREATE TABLE sub_db.tickets ( id int, state varchar(32) DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE sub_db.alerts ( id int, state varchar(32) DEFAULT NULL, PRIMARY KEY (id) );
