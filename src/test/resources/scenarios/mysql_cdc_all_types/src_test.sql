INSERT INTO types_db.all_types VALUES (1, -128, -32768, 8388607, 9223372036854775807, 12345678.9999, 0.5, -2.25, '2023-04-05', '11:22:33.4', '2022-01-02 03:04:05.123456', 2024, 'hello', 'ab', x'DEADBEEF');
INSERT INTO types_db.all_types VALUES (2, 127, 32767, -8388608, -9223372036854775808, -0.0001, -1.5, 1024.125, '1970-01-01', '00:00:00', '1999-12-31 23:59:59', 1901, '', 'cdEF', x'00');
INSERT INTO types_db.all_types VALUES (3, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL);
-- typed updates: every column changes at least once across the stream
UPDATE types_db.all_types SET f_dec = 0.5, f_dt = '2024-06-07 08:09:10.5', f_blob = x'CAFE' WHERE id = 1;
UPDATE types_db.all_types SET f_tiny = 7, f_vc = 'naïve ≠ ascii', f_time = '23:59:59.999' WHERE id = 2;
-- NULL in, value out and back
UPDATE types_db.all_types SET f_small = 42 WHERE id = 3;
UPDATE types_db.all_types SET f_small = NULL, f_date = '2000-02-29' WHERE id = 3;
DELETE FROM types_db.all_types WHERE id = 2;
