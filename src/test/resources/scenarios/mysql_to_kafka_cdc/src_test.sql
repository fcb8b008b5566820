INSERT INTO feed_db.orders VALUES (1,'new',10.50);
INSERT INTO feed_db.orders VALUES (2,'new',20);
INSERT INTO feed_db.audit VALUES (1,'created');
-- update rides the envelope with BOTH images
UPDATE feed_db.orders SET state = 'paid' WHERE id = 1;
-- key-changing update: the consumer must move the row
UPDATE feed_db.orders SET id = 3 WHERE id = 2;
DELETE FROM feed_db.orders WHERE id = 1;
INSERT INTO feed_db.orders VALUES (4,NULL,NULL);
UPDATE feed_db.audit SET note = 'touched' WHERE id = 1;
