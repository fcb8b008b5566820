CREATE DATABASE Upper_Case_DB;
CREATE TABLE Upper_Case_DB.Upper_Case_TB ( Id INT, FIELD_1 INT, field_2 INT, Field_3 INT, PRIMARY KEY(Id), UNIQUE KEY uk (FIELD_1, field_2) );
