INSERT INTO Upper_Case_DB.Upper_Case_TB VALUES(1, 1, 1, 1),(2, 2, 2, 2);
UPDATE Upper_Case_DB.Upper_Case_TB SET Field_3=9 WHERE Id=1;
DELETE FROM Upper_Case_DB.Upper_Case_TB WHERE Id=2;
