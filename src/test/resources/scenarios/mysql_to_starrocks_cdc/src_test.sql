INSERT INTO wh_db.metrics VALUES (1,'cpu',0.50);
INSERT INTO wh_db.metrics VALUES (2,'mem',70);
INSERT INTO wh_db.metrics VALUES (3,'disk',30);
-- higher-version upsert must beat the original insert at the warehouse
UPDATE wh_db.metrics SET val = 0.75 WHERE id = 1;
-- sign row: the delete must remove id=2 despite its earlier upserts
DELETE FROM wh_db.metrics WHERE id = 2;
-- key-changing update: delete+insert pair through the version lane
UPDATE wh_db.metrics SET id = 4 WHERE id = 3;
INSERT INTO wh_db.metrics VALUES (5,'net',NULL);
