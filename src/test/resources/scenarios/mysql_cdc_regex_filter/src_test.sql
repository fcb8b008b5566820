INSERT INTO rf_db.orders_2023 VALUES (1,'a');
INSERT INTO rf_db.orders_2024 VALUES (1,'b');
UPDATE rf_db.orders_2024 SET v = 'b2' WHERE id = 1;
-- matches the regex but is subtracted by ignore_tbs
INSERT INTO rf_db.orders_tmp VALUES (1,'x');
-- does not match the regex at all
INSERT INTO rf_db.audit_log VALUES (1,'y');
DELETE FROM rf_db.orders_2023 WHERE id = 1;
INSERT INTO rf_db.orders_2023 VALUES (2,'a2');
