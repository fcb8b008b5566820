INSERT INTO ch_db.events VALUES (3,'view',30);
INSERT INTO ch_db.events VALUES (4,'purchase',NULL);
UPDATE ch_db.events SET score=25 WHERE id=2;
UPDATE ch_db.events SET kind='scroll', score=11 WHERE id=1;
DELETE FROM ch_db.events WHERE id=3;
INSERT INTO ch_db.dims VALUES (2,'beta');
UPDATE ch_db.dims SET label='alpha2' WHERE id=1;
DELETE FROM ch_db.dims WHERE id=2;
INSERT INTO ch_db.dims VALUES (2,'gamma');
