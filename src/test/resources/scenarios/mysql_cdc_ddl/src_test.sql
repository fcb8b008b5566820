-- DML against the CREATE-time shape
INSERT INTO ddl_db_1.evolving VALUES (2,'b');

-- barrier 1: widen, then ship rows carrying the new column
ALTER TABLE ddl_db_1.evolving ADD COLUMN extra int;
INSERT INTO ddl_db_1.evolving (id, val, extra) VALUES (3,'c',30);
UPDATE ddl_db_1.evolving SET extra = 10 WHERE id = 1;

-- barrier 2: widen again
ALTER TABLE ddl_db_1.evolving ADD COLUMN tag varchar(255);
INSERT INTO ddl_db_1.evolving (id, val, extra, tag) VALUES (4,'d',40,'t4');

-- barrier 3: narrow — rows shipped after this carry no val
ALTER TABLE ddl_db_1.evolving DROP COLUMN val;
UPDATE ddl_db_1.evolving SET tag = 'x' WHERE id = 2;
DELETE FROM ddl_db_1.evolving WHERE id = 3;
INSERT INTO ddl_db_1.evolving VALUES (5, 50, 't5');

-- truncate barrier: pre-truncate rows vanish, later rows land
INSERT INTO ddl_db_1.truncated VALUES (2,'gone');
TRUNCATE TABLE ddl_db_1.truncated;
INSERT INTO ddl_db_1.truncated VALUES (3,'after');
