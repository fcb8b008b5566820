INSERT INTO tw_db.accounts VALUES (10,'from_a',500);
INSERT INTO tw_db.accounts VALUES (11,'from_a_too',0);
UPDATE tw_db.accounts SET balance=150 WHERE id=1;
DELETE FROM tw_db.accounts WHERE id=11;
INSERT INTO tw_db.notes VALUES (10,'written at a');
