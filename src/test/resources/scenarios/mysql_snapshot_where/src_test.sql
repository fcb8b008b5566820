INSERT INTO test_db_1.events_tb VALUES (1,'keep','a'),(2,'drop','b'),(3,'keep','c'),(4,'drop','d');
INSERT INTO test_db_1.plain_tb VALUES (1,'x'),(2,'y');
