INSERT INTO tw_db.accounts VALUES (20,'from_b',700);
INSERT INTO tw_db.notes VALUES (20,'written at b');
UPDATE tw_db.notes SET body='baseline v2 from b' WHERE id=1;
DELETE FROM tw_db.notes WHERE id=20;
INSERT INTO tw_db.notes VALUES (21,'b final note');
