DROP DATABASE IF EXISTS live_mg;
CREATE DATABASE live_mg;

CREATE TABLE live_mg.docs_tb ( id int, v varchar(32), PRIMARY KEY (id) );

INSERT INTO live_mg.docs_tb VALUES (1,'a');
INSERT INTO live_mg.docs_tb VALUES (2,'b');
