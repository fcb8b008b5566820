DROP DATABASE IF EXISTS ddl_db_1;
CREATE DATABASE ddl_db_1;

CREATE TABLE ddl_db_1.evolving ( id int, val varchar(255) DEFAULT NULL, PRIMARY KEY (id) );
CREATE TABLE ddl_db_1.truncated ( id int, note varchar(255) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO ddl_db_1.evolving VALUES (1,'a');
INSERT INTO ddl_db_1.truncated VALUES (1,'before');
