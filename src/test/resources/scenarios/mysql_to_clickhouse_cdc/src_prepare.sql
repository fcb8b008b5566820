DROP DATABASE IF EXISTS ch_db;
CREATE DATABASE ch_db;

CREATE TABLE ch_db.events ( id int, kind varchar(32) DEFAULT NULL, score int DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE ch_db.dims ( id int, label varchar(32) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO ch_db.events VALUES (1,'view',10);
INSERT INTO ch_db.events VALUES (2,'click',20);
INSERT INTO ch_db.dims VALUES (1,'alpha');
