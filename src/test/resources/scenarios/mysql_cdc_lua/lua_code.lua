-- the reference basic_test shapes, verbatim idioms
-- (docs/en/etl/lua.md + dt-tests mysql_to_mysql_lua)

-- change value of column f_1
if (schema == "lua_test" and tb == "change_column_value_test")
then
    after.f_1 = 1000
end

-- change value of string columns on one keyed row
if (schema == "lua_test" and tb == "change_string_column_value_test")
then
    if (before.id == 1 or after.id == 1)
    then
        after.f_1 = "😀中文a"
    end
end

-- drop column f_2
if (schema == "lua_test" and tb == "drop_column_test")
then
    after.f_2 = nil
end

-- filter row
if (schema == "lua_test" and tb == "filter_row_test")
then
    if (before.id == 1 or after.id == 1)
    then
        row_type = ""
    end
end
