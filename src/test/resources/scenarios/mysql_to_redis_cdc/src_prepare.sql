DROP DATABASE IF EXISTS cache_db;
CREATE DATABASE cache_db;

CREATE TABLE cache_db.sessions ( id int, user varchar(255) DEFAULT NULL, score int DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO cache_db.sessions VALUES (1,'ann',10);
