INSERT INTO live_pg.orders_tb VALUES (3,'c',NULL);
INSERT INTO live_pg.noise_tb VALUES (9,'x');
UPDATE live_pg.orders_tb SET v='b2', qty=21 WHERE id=2;
DELETE FROM live_pg.orders_tb WHERE id=1;
INSERT INTO live_pg.orders_tb VALUES (4,'d',40);
