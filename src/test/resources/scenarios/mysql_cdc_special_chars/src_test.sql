INSERT INTO test_db_1.col_has_special_character_table VALUES(1, 'col:1:value', 'col&2:value');
INSERT INTO test_db_1.col_has_special_character_table VALUES(2, NULL, NULL);
INSERT INTO test_db_1.col_has_special_character_table VALUES(3, 'it''s quoted', 'a=b, c');
UPDATE test_db_1.col_has_special_character_table SET `col"1`='updated' WHERE `p:k`=1;
DELETE FROM test_db_1.col_has_special_character_table WHERE `p:k`=2;
