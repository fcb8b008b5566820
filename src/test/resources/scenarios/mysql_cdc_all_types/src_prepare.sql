DROP DATABASE IF EXISTS types_db;
CREATE DATABASE types_db;

-- the reference cdc basic_test's typed surface, one table: every
-- value rides the REAL binlog codec for its declared type
CREATE TABLE types_db.all_types ( id int, f_tiny tinyint DEFAULT NULL, f_small smallint DEFAULT NULL, f_medium mediumint DEFAULT NULL, f_big bigint DEFAULT NULL, f_dec decimal(12,4) DEFAULT NULL, f_float float DEFAULT NULL, f_double double DEFAULT NULL, f_date date DEFAULT NULL, f_time time(3) DEFAULT NULL, f_dt datetime(6) DEFAULT NULL, f_year year DEFAULT NULL, f_vc varchar(255) DEFAULT NULL, f_ch char(8) DEFAULT NULL, f_blob blob, PRIMARY KEY (id) );
