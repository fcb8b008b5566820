DROP DATABASE IF EXISTS fs_db;
CREATE DATABASE fs_db;

CREATE TABLE fs_db.inventory ( id int, sku varchar(32), qty int DEFAULT NULL, PRIMARY KEY (id) );
-- snapshot half: the state the chunked scan would copy
INSERT INTO fs_db.inventory VALUES (1,'apple',10);
INSERT INTO fs_db.inventory VALUES (2,'pear',20);
INSERT INTO fs_db.inventory VALUES (3,'plum',30);
