DROP DATABASE IF EXISTS gt_db;
CREATE DATABASE gt_db;

CREATE TABLE gt_db.jobs ( id int, state varchar(32) DEFAULT NULL, PRIMARY KEY (id) );
