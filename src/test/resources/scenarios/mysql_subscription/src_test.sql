INSERT INTO sub_db.tickets VALUES (1,'open');
INSERT INTO sub_db.tickets VALUES (2,'open');
INSERT INTO sub_db.alerts VALUES (1,'firing');
UPDATE sub_db.tickets SET state = 'closed' WHERE id = 1;
DELETE FROM sub_db.tickets WHERE id = 2;
INSERT INTO sub_db.tickets VALUES (3,NULL);
UPDATE sub_db.alerts SET state = 'resolved' WHERE id = 1;
-- key-changing update pages across micro-batches
UPDATE sub_db.tickets SET id = 4 WHERE id = 3;
