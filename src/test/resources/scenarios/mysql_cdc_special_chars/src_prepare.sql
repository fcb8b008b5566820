CREATE DATABASE test_db_1;
CREATE TABLE test_db_1.col_has_special_character_table (`p:k` tinyint, `col"1` text, `col,2` text, PRIMARY KEY(`p:k`));
