-- pg_to_pg_lua/cdc/basic_test shape: literal value rewrites on one
-- table keyed by id, the rest pass through
if (schema == "lua_test" and tb == "default_table")
then
    if (after.id ~= nil and after.id == 1)
    then
        after["cvarchar"] = 'Test'
        after["cnumeric"] = '1234.56'
        after["cbool"] = 'true'
    end
end

if (schema == "lua_test" and tb == "filter_tail_test")
then
    if (after.note ~= nil and after.note < 'keep')
    then
        row_type = ""
    end
end
