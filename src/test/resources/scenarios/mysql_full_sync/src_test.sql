-- CDC tail picks up after the snapshot position: the update must
-- overwrite the snapshot-copied row, the delete must remove one,
-- and the key-change must move one
UPDATE fs_db.inventory SET qty = 11 WHERE id = 1;
DELETE FROM fs_db.inventory WHERE id = 2;
UPDATE fs_db.inventory SET id = 4 WHERE id = 3;
INSERT INTO fs_db.inventory VALUES (5,'quince',NULL);
UPDATE fs_db.inventory SET sku = 'golden' WHERE id = 1;
