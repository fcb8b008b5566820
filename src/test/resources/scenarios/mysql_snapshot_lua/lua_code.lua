-- mysql_to_mysql_lua/snapshot/basic_test shapes
if (schema == "lua_test" and tb == "change_column_value_test" and row_type == "insert")
then
    after.f_1 = 1000
end

if (schema == "lua_test" and tb == "filter_row_test")
then
    if (after.id == 1)
    then
        row_type = ""
    end
end
