INSERT INTO lua_test.change_column_value_test VALUES (1,7);
INSERT INTO lua_test.change_column_value_test VALUES (2,8);

INSERT INTO lua_test.filter_row_test VALUES (1,'drop');
INSERT INTO lua_test.filter_row_test VALUES (2,'keep');
