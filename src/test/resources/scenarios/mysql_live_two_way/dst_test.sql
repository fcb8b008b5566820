INSERT INTO tw_db.t VALUES (3,'b-local');
