DROP DATABASE IF EXISTS app;
CREATE DATABASE app;

CREATE TABLE app.docs ( id int, title varchar(64) DEFAULT NULL, body varchar(255) DEFAULT NULL, tags varchar(64) DEFAULT NULL, PRIMARY KEY (id) );

INSERT INTO app.docs VALUES (1,'alpha','first body','x');
INSERT INTO app.docs VALUES (2,'beta','second body',NULL);
INSERT INTO app.docs VALUES (3,'gamma',NULL,'y');
INSERT INTO app.docs VALUES (4,'delta','fourth body','z');
