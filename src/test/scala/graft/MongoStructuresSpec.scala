package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NameFilter
import graft.struct.MongoStructures._

/** Mongo structure statements — rendering, normalization, routing, and
  * the shard-key decision table per mongo_struct_sinker.rs:103-215.
  */
class MongoStructuresSpec extends AnyFunSuite {

  private val all = NameFilter(doStructures = Set("*"))

  private val coll = MongoCollectionStatement("app", "events",
    options = Seq("capped" -> "true", "size" -> "1048576"),
    indexes = Seq(
      Seq("v" -> "2", "key" -> """{"_id":1}""", "name" -> "\"_id_\"",
        "ns" -> "\"app.events\""),
      Seq("v" -> "2", "key" -> """{"user_id":1,"ts":-1}""",
        "name" -> "\"ix_user_ts\"", "ns" -> "\"app.events\"",
        "unique" -> "false"),
      Seq("key" -> """{"email":1}""", "name" -> "\"ix_email\"",
        "unique" -> "true")))

  test("create + createIndexes render with options and normalization") {
    val cmds = coll.toCommands(all)
    assert(cmds.map(_._1) ==
      Seq("collection.app.events", "indexes.app.events"))
    assert(cmds.head._2 ==
      """{"create":"events","capped":true,"size":1048576}""")
    val ix = cmds(1)._2
    // command keys on the FIRST field
    assert(ix.startsWith("""{"createIndexes":"events","indexes":["""))
    // the implicit _id_ index dropped; ns and v stripped
    assert(!ix.contains("_id_") && !ix.contains("\"ns\"") &&
      !ix.contains("\"v\""))
    assert(ix.contains(
      """{"key":{"user_id":1,"ts":-1},"name":"ix_user_ts","unique":false}"""))
    assert(ix.contains(
      """{"key":{"email":1},"name":"ix_email","unique":true}"""))
  }

  test("no indexes → create only; collection kind gates everything") {
    val bare = MongoCollectionStatement("app", "logs")
    assert(bare.toCommands(all) ==
      Seq(("collection.app.logs", """{"create":"logs"}""")))
    assert(coll.toCommands(NameFilter(doStructures = Set("table"))) == Nil)
  }

  test("routing rewrites db and collection") {
    val cmds = coll.route("dst", "audit").toCommands(all)
    assert(cmds.map(_._1) == Seq("collection.dst.audit", "indexes.dst.audit"))
    assert(cmds.head._2.startsWith("""{"create":"audit""""))
  }

  test("shard key: fresh target gets enableSharding then shardCollection") {
    val sk = MongoShardKeyStatement("app.events",
      Seq("user_id" -> "\"hashed\""), unique = false)
    val cmds = sk.toCommands(all, targetIsMongos = true, Map.empty)
    assert(cmds == Seq(
      ("enable_sharding.app", """{"enableSharding":"app"}"""),
      ("shard_key.app.events",
        """{"shardCollection":"app.events",""" +
          """"key":{"user_id":"hashed"},"unique":false}""")))
  }

  test("shard key: identical target is idempotent, mismatch is loud") {
    val sk = MongoShardKeyStatement("app.events", Seq("user_id" -> "1"),
      unique = true)
    assert(sk.toCommands(all, targetIsMongos = true,
      Map("app.events" -> ("""{"user_id":1}""", true))) == Nil)
    val err = intercept[IllegalArgumentException] {
      sk.toCommands(all, targetIsMongos = true,
        Map("app.events" -> ("""{"other":1}""", true)))
    }
    assert(err.getMessage.contains("shard key mismatch"))
  }

  test("shard key: non-mongos target and kind gating skip cleanly") {
    val sk = MongoShardKeyStatement("app.events", Seq("user_id" -> "1"))
    assert(sk.toCommands(all, targetIsMongos = false, Map.empty) == Nil)
    assert(sk.toCommands(NameFilter(doStructures = Set("collection")),
      targetIsMongos = true, Map.empty) == Nil)
  }

  test("shard key routes only the matching namespace") {
    val sk = MongoShardKeyStatement("app.events", Seq("k" -> "1"))
    assert(sk.route("app", "events", "dst", "audit").ns == "dst.audit")
    assert(sk.route("other", "x", "dst", "audit").ns == "app.events")
  }
}
