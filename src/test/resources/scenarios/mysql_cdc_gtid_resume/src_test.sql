-- gno 1-2 are contained in the configured gtid_set (a reconnect after
-- they were already applied): the wire must skip them whole
INSERT INTO gt_db.jobs VALUES (1,'already-applied');
INSERT INTO gt_db.jobs VALUES (2,'already-applied');
-- gno 3+ stream normally
INSERT INTO gt_db.jobs VALUES (3,'fresh');
UPDATE gt_db.jobs SET state = 'running' WHERE id = 3;
INSERT INTO gt_db.jobs VALUES (4,'fresh');
DELETE FROM gt_db.jobs WHERE id = 4;
