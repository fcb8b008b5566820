-- src-only row: MISS at dst -> revise inserts it
INSERT INTO chk_db.accounts VALUES (4,'dan',400.00);
-- src-side change: dst keeps the stale value -> DIFF on balance
UPDATE chk_db.accounts SET balance = 150.00 WHERE id = 1;
-- NULL-vs-value difference must classify as DIFF too
UPDATE chk_db.accounts SET owner = NULL WHERE id = 2;
