INSERT INTO live_db.orders_tb VALUES (4,'d',40);
UPDATE live_db.orders_tb SET v='b2', qty=21 WHERE id=2;
INSERT INTO live_db.noise_tb VALUES (10,'y');
DELETE FROM live_db.orders_tb WHERE id=3;
