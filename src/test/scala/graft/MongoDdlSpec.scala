package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.DdlParser.MongoCommand
import graft.meta.{DdlParser, MongoDdl}
import graft.operators.Router

/** Change-stream DDL event mapping vectors — one per reference
  * DdlType (ddl_type.rs:35-55), command shapes per mongo_ddl.rs.
  */
class MongoDdlSpec extends AnyFunSuite {
  import MongoDdl.changeStreamEventToDdl

  private def ev(json: String) = changeStreamEventToDdl(json).get

  test("create: idIndex dropped, other description fields kept") {
    val d = ev("""{"operationType":"create",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{
        "idIndex":{"v":2,"key":{"_id":1},"name":"_id_"},
        "capped":true,"size":1024}}""")
    assert(d.mongoType == "mongo_create_collection")
    assert((d.schema, d.tb) == (("db1", "tb1")))
    assert(d.command ==
      """{"create":"tb1","capped":true,"size":1024}""")
    assert(DdlParser.ddlType(d) == "mongo_create_collection")
  }

  test("drop / dropDatabase") {
    val drop = ev("""{"operationType":"drop",
      "ns":{"db":"db1","coll":"tb1"}}""")
    assert(drop.mongoType == "mongo_drop_collection")
    assert(drop.command == """{"drop":"tb1"}""")

    val dropDb = ev("""{"operationType":"dropDatabase",
      "ns":{"db":"db1"}}""")
    assert(dropDb.mongoType == "mongo_drop_database")
    assert((dropDb.schema, dropDb.tb) == (("db1", "")))
    assert(dropDb.command == """{"dropDatabase":1}""")
  }

  test("rename: maps source and target namespace " +
      "(mongo_ddl.rs test vector)") {
    val d = ev("""{"operationType":"rename",
      "ns":{"db":"db1","coll":"old_tb"},
      "to":{"db":"db2","coll":"new_tb"}}""")
    assert(d.mongoType == "mongo_rename_collection")
    assert((d.schema, d.tb) == (("db1", "old_tb")))
    assert((d.newSchema, d.newTb) == (("db2", "new_tb")))
    assert(d.command ==
      """{"renameCollection":"db1.old_tb","to":"db2.new_tb"}""")
  }

  test("createIndexes keeps index specs (mongo_ddl.rs test vector)") {
    val d = ev("""{"operationType":"createIndexes",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"indexes":[
        {"name":"idx_tenant","key":{"tenant_id":1}}]}}""")
    assert(d.mongoType == "mongo_create_index")
    assert(d.command == """{"createIndexes":"tb1","indexes":""" +
      """[{"name":"idx_tenant","key":{"tenant_id":1}}]}""")
    // missing operationDescription → not a replayable DDL
    assert(changeStreamEventToDdl("""{"operationType":"createIndexes",
      "ns":{"db":"db1","coll":"tb1"}}""").isEmpty)
  }

  test("dropIndexes resolves the first index NAME from spec doc, " +
      "spec array, or bare string") {
    val fromDocs = ev("""{"operationType":"dropIndexes",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"indexes":[
        {"name":"idx_a","key":{"a":1}},{"name":"idx_b"}]}}""")
    assert(fromDocs.command ==
      """{"dropIndexes":"tb1","index":"idx_a"}""")
    val fromSingle = ev("""{"operationType":"dropIndexes",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"indexes":{"name":"idx_one"}}}""")
    assert(fromSingle.command ==
      """{"dropIndexes":"tb1","index":"idx_one"}""")
    val fromName = ev("""{"operationType":"dropIndexes",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"indexes":["idx_s"]}}""")
    assert(fromName.mongoType == "mongo_drop_index")
    assert(fromName.command ==
      """{"dropIndexes":"tb1","index":"idx_s"}""")
  }

  test("modify → collMod with all description fields") {
    val d = ev("""{"operationType":"modify",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{
        "index":{"name":"age_1","hidden":true}},
      "stateBeforeChange":{"indexOptions":{"hidden":false}}}""")
    assert(d.mongoType == "mongo_coll_mod")
    assert(d.command ==
      """{"collMod":"tb1","index":{"name":"age_1","hidden":true}}""")
  }

  test("sharding family: key from shardKey, internal fields ignored") {
    val shard = ev("""{"operationType":"shardCollection",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{
        "shardKey":{"tenant_id":1,"_id":1},
        "unique":false,"presplitHashedZones":false}}""")
    assert(shard.mongoType == "mongo_shard_collection")
    assert(shard.isShardDdl)
    assert(shard.command == """{"shardCollection":"db1.tb1",""" +
      """"key":{"tenant_id":1,"_id":1},"unique":false,""" +
      """"presplitHashedZones":false}""")

    val reshard = ev("""{"operationType":"reshardCollection",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{
        "reshardUUID":"aaa","shardKey":{"region":1},
        "oldShardKey":{"tenant_id":1},"unique":false}}""")
    assert(reshard.mongoType == "mongo_reshard_collection")
    assert(reshard.isShardDdl)
    assert(reshard.command == """{"reshardCollection":"db1.tb1",""" +
      """"key":{"region":1},"unique":false}""")

    val refine = ev("""{"operationType":"refineCollectionShardKey",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"shardKey":{"tenant_id":1,"ts":1}}}""")
    assert(refine.mongoType == "mongo_refine_collection_shard_key")
    assert(refine.isShardDdl)
    assert(refine.command ==
      """{"refineCollectionShardKey":"db1.tb1",""" +
      """"key":{"tenant_id":1,"ts":1}}""")
  }

  test("non-DDL and unknown operation types → None") {
    assert(changeStreamEventToDdl("""{"operationType":"insert",
      "ns":{"db":"db1","coll":"tb1"},
      "fullDocument":{"_id":1}}""").isEmpty)
    assert(changeStreamEventToDdl("""{"operationType":"invalidate",
      "ns":{"db":"db1","coll":"tb1"}}""").isEmpty)
    assert(changeStreamEventToDdl("""{"ns":{"db":"d"}}""").isEmpty)
  }

  test("build_shard_collection_ddl round-trips the command " +
      "(mongo_ddl.rs test vector)") {
    val d = MongoDdl.buildShardCollectionDdl("db1.tb1",
      """{"tenant_id":1,"_id":1}""", unique = false).get
    assert(d.mongoType == "mongo_shard_collection")
    assert((d.schema, d.tb) == (("db1", "tb1")))
    assert(d.command == """{"shardCollection":"db1.tb1",""" +
      """"key":{"tenant_id":1,"_id":1},"unique":false}""")
    assert(MongoDdl.buildShardCollectionDdl("noDot",
      """{"a":1}""", unique = false).isEmpty)
  }

  test("routing rewrites the replay command's namespaces " +
      "(rdb_router.rs:286-317 + mongo_sinker namespace rewrite)") {
    val router = Router(schemaMap = Map("db1" -> "r1", "db2" -> "r2"))
    // collection-scoped command: bare collection name stays
    val create = ev("""{"operationType":"create",
      "ns":{"db":"db1","coll":"tb1"}}""")
    val createRouted = DdlParser.route(create, router, "db1")
      .asInstanceOf[MongoCommand]
    assert(createRouted.schema == "r1")
    assert(createRouted.render == """{"create":"tb1"}""")
    // rename: BOTH namespaces route, command carries db-qualified
    val ren = ev("""{"operationType":"rename",
      "ns":{"db":"db1","coll":"old_tb"},
      "to":{"db":"db2","coll":"new_tb"}}""")
    val renRouted = DdlParser.route(ren, router, "db1")
      .asInstanceOf[MongoCommand]
    assert((renRouted.schema, renRouted.tb) == (("r1", "old_tb")))
    assert((renRouted.newSchema, renRouted.newTb) == (("r2", "new_tb")))
    assert(renRouted.render ==
      """{"renameCollection":"r1.old_tb","to":"r2.new_tb"}""")
    // shard command: db-qualified source namespace rewrites
    val shard = ev("""{"operationType":"shardCollection",
      "ns":{"db":"db1","coll":"tb1"},
      "operationDescription":{"shardKey":{"_id":1}}}""")
    assert(DdlParser.route(shard, router, "db1").render ==
      """{"shardCollection":"r1.tb1","key":{"_id":1}}""")
    // per-table map wins over the schema map
    val tbRouter = Router(tbMap =
      Map(("db1", "tb1") -> (("r9", "t9"))))
    assert(DdlParser.route(create, tbRouter, "db1").render ==
      """{"create":"t9"}""")
  }
}
