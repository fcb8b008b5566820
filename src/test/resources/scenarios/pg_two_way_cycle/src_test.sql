INSERT INTO tw_db.accounts VALUES (10,'from_a',500);
UPDATE tw_db.accounts SET id=12 WHERE id=10;
UPDATE tw_db.accounts SET balance=175 WHERE id=1;
INSERT INTO tw_db.notes VALUES (10,'pg note a');
DELETE FROM tw_db.notes WHERE id=10;
INSERT INTO tw_db.notes VALUES (11,'pg note a2');
