DROP DATABASE IF EXISTS ddl_src;
CREATE DATABASE ddl_src;

CREATE TABLE ddl_src.widgets ( id int, name varchar(255) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO ddl_src.widgets VALUES (1,'anvil');
INSERT INTO ddl_src.widgets VALUES (2,'bolt');
