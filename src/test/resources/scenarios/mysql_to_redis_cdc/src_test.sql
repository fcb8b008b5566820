INSERT INTO cache_db.sessions VALUES (2,'bob',20);
INSERT INTO cache_db.sessions VALUES (3,'cat',30);
-- NULLing a field must REMOVE it from the hash (DEL+HSET replace, not merge)
UPDATE cache_db.sessions SET score = NULL WHERE id = 1;
-- key-changing update: DEL of the old key + replace under the new one
UPDATE cache_db.sessions SET id = 4 WHERE id = 2;
DELETE FROM cache_db.sessions WHERE id = 3;
UPDATE cache_db.sessions SET user = 'dan' WHERE id = 4;
