INSERT INTO test_db_1.sync_a VALUES (1,'a'),(2,'b');
INSERT INTO test_db_1.sync_skip VALUES (1,'nope');
INSERT INTO test_db_1.other VALUES (1,'nope');
UPDATE test_db_1.sync_a SET v='b2' WHERE id=2;
