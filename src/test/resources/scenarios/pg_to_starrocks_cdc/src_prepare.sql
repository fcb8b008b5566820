DROP DATABASE IF EXISTS analytics;
CREATE DATABASE analytics;

CREATE TABLE analytics.events ( id int, kind varchar(32), score decimal(8,2) DEFAULT NULL, PRIMARY KEY (id) );
