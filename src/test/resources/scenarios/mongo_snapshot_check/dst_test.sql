DELETE FROM app.docs WHERE id=2;
UPDATE app.docs SET tags=NULL WHERE id=3;
INSERT INTO app.docs VALUES (9,'orphan','not at src','q');
