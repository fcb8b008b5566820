INSERT INTO test_db_1.tb_a VALUES (1,'a1'),(2,'a2');
INSERT INTO test_db_1.tb_b VALUES (1,'b1'),(2,'b2'),(3,'b3');
UPDATE test_db_1.tb_a SET v='a1x' WHERE id=1;
DELETE FROM test_db_1.tb_b WHERE id=2;
INSERT INTO test_db_1.tb_a VALUES (3,'a3');
UPDATE test_db_1.tb_b SET v='b3x' WHERE id=3;
DELETE FROM test_db_1.tb_a WHERE id=2;
