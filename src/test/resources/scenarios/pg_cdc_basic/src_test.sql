INSERT INTO public.full_column_type VALUES (1,'a',1,1.2500,'2022-01-02 03:04:05.123456');
INSERT INTO public.full_column_type VALUES (2,'b',2,2.5000,'2022-01-02 03:04:05.123456');
INSERT INTO public.full_column_type VALUES (3,NULL,NULL,NULL,NULL);
INSERT INTO public.no_key_tb VALUES (1,'x'),(NULL,NULL);
UPDATE public.full_column_type SET char_col='a2', numeric_col=9.9900 WHERE id=1;
DELETE FROM public.full_column_type WHERE id=2;
UPDATE public.no_key_tb SET b='x2' WHERE a=1;
