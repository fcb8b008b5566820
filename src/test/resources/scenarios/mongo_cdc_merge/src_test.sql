-- pure insert/delete stream: every row rides the MERGED lanes
INSERT INTO app.pure_merge VALUES (2,'bolt',20);
INSERT INTO app.pure_merge VALUES (3,'clamp',30);
DELETE FROM app.pure_merge WHERE id = 1;
INSERT INTO app.pure_merge VALUES (4,'drill',40);
DELETE FROM app.pure_merge WHERE id = 3;
INSERT INTO app.pure_merge VALUES (3,'clamp-v2',31);

-- first UPDATE demotes the table's tail to the SERIAL lane
INSERT INTO app.with_updates VALUES (2,'new','second');
UPDATE app.with_updates SET status = 'active' WHERE id = 1;
INSERT INTO app.with_updates VALUES (3,'new','third');
UPDATE app.with_updates SET note = 'revised' WHERE id = 2;
DELETE FROM app.with_updates WHERE id = 3;
UPDATE app.with_updates SET status = 'done' WHERE id = 2;

-- field-level $v:2 shapes: NULL->value rebuilds via diff.i,
-- value->NULL via diff.d, value->value via diff.u — all three in one
-- statement stream (the oplog rebuild asserts each)
INSERT INTO app.with_updates VALUES (5,'new',NULL);
UPDATE app.with_updates SET note = 'added' WHERE id = 5;
UPDATE app.with_updates SET status = NULL, note = 'kept' WHERE id = 5;
UPDATE app.with_updates SET status = 'back', note = NULL WHERE id = 5;
