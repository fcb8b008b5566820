-- dst-only row: ORPHAN -> revise deletes it
INSERT INTO chk_db.accounts VALUES (9,'zed',900.00);
