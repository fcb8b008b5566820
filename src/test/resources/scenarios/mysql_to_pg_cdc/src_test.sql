INSERT INTO app_db.orders_tb VALUES (1,'new',10.5000),(2,'new',20.2500),(3,'new',0.0001);
INSERT INTO app_db.lines_tb VALUES (1,1,'sku-a'),(1,2,'sku-b'),(2,1,'sku-c'),(NULL,NULL,NULL);
UPDATE app_db.orders_tb SET status='paid' WHERE id=1;
UPDATE app_db.orders_tb SET status='void', total=0.0000 WHERE id=2;
DELETE FROM app_db.lines_tb WHERE oid=2;
DELETE FROM app_db.orders_tb WHERE id=3;
