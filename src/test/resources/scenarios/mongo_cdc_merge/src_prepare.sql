DROP DATABASE IF EXISTS app;
CREATE DATABASE app;

CREATE TABLE app.pure_merge ( id int, name varchar(255) DEFAULT NULL, qty int DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE app.with_updates ( id int, status varchar(255) DEFAULT NULL, note varchar(255) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO app.pure_merge VALUES (1,'anvil',10);
INSERT INTO app.with_updates VALUES (1,'new','first');
