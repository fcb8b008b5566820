INSERT INTO app.docs VALUES (5,'epsilon','fifth body',NULL);
UPDATE app.docs SET body='first body v2' WHERE id=1;
