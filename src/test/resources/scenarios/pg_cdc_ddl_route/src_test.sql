-- the routed ALTER must land on ddl_dst.widgets (db_map), and the
-- rows that follow carry the widened shape
ALTER TABLE ddl_src.widgets ADD COLUMN qty int;
INSERT INTO ddl_src.widgets (id, name, qty) VALUES (3,'clamp',7);
UPDATE ddl_src.widgets SET qty = 2 WHERE id = 1;
DELETE FROM ddl_src.widgets WHERE id = 2;
