INSERT INTO lua_test.default_table VALUES (1,'old','0','false');
INSERT INTO lua_test.default_table VALUES (2,'two','2.2','false');
UPDATE lua_test.default_table SET cbool='false' WHERE id=1;

INSERT INTO lua_test.filter_tail_test VALUES (1,'aaa drop');
INSERT INTO lua_test.filter_tail_test VALUES (2,'zzz keep');
