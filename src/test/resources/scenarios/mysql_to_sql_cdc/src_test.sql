-- forward log must replay to this end state; the reversed log must
-- undo back to the two seeded rows
INSERT INTO log_db.orders VALUES (3,'it''s quoted',30);
UPDATE log_db.orders SET state = 'paid', amount = 11 WHERE id = 1;
UPDATE log_db.orders SET amount = 5.25 WHERE id = 2;
-- NULL transitions ride literal NULLs and IS NULL predicates
UPDATE log_db.orders SET state = NULL WHERE id = 3;
DELETE FROM log_db.orders WHERE id = 2;
-- key-changing update stays an UPDATE in the sql log
UPDATE log_db.orders SET id = 4 WHERE id = 3;
