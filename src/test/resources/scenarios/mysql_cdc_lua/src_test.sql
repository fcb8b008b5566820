INSERT INTO lua_test.change_column_value_test VALUES (1,1);
INSERT INTO lua_test.change_column_value_test VALUES (2,2);
UPDATE lua_test.change_column_value_test SET f_1=7 WHERE id=1;

INSERT INTO lua_test.change_string_column_value_test VALUES (1,'x');
INSERT INTO lua_test.change_string_column_value_test VALUES (2,'y');

INSERT INTO lua_test.drop_column_test VALUES (1,'keep','gone');
INSERT INTO lua_test.drop_column_test VALUES (2,'keep2','gone2');

INSERT INTO lua_test.filter_row_test VALUES (1,'drop me');
INSERT INTO lua_test.filter_row_test VALUES (2,'keep me');
DELETE FROM lua_test.filter_row_test WHERE id=1;
