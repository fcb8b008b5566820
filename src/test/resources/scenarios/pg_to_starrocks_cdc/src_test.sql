-- the flagship reference story at corpus level: pgoutput wire in
-- (incl. v2 streamed txns), sign+version stream-load PUTs out
INSERT INTO analytics.events VALUES (1,'click',0.50);
INSERT INTO analytics.events VALUES (2,'view',NULL);
UPDATE analytics.events SET score = 1.25 WHERE id = 1;
INSERT INTO analytics.events VALUES (3,'click',2);
DELETE FROM analytics.events WHERE id = 2;
UPDATE analytics.events SET id = 4 WHERE id = 3;
UPDATE analytics.events SET kind = 'tap' WHERE id = 1;
