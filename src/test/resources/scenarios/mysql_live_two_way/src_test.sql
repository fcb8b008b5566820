INSERT INTO tw_db.t VALUES (1,'a');
INSERT INTO tw_db.t VALUES (2,'b');
UPDATE tw_db.t SET v='a2' WHERE id=1;
