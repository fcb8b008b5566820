UPDATE live_mg.docs_tb SET v='a2' WHERE id=1;
INSERT INTO live_mg.docs_tb VALUES (3,'c');
DELETE FROM live_mg.docs_tb WHERE id=2;
