CREATE DATABASE public;
CREATE TABLE public.full_column_type ( id int, char_col varchar(255), int_col int, numeric_col decimal(10,4), ts_col datetime(6), PRIMARY KEY (id) );
CREATE TABLE public.no_key_tb ( a int, b varchar(64) );
