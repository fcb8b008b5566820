package graft.struct

import graft.operators.NameFilter

/** MongoDB structure migration — create-collection (+options +indexes)
  * and shard-key statements, rendered as the runCommand documents the
  * target executes (reference statement model:
  * /root/reference/dt-common/src/meta/struct_meta/statement/
  * mongo_create_collection_statement.rs, mongo_shard_key_statement.rs;
  * apply semantics: dt-connector/src/sinker/mongo/mongo_struct_sinker.rs:
  * 103-215; fetch-side normalization: meta_fetcher/mongo/
  * mongo_struct_fetcher.rs:100-125).
  *
  * Like the other struct migrators: metadata-in, command-strings-out —
  * no driver, no Spark execution; each (key, commandJson) pair runs over
  * the wire client and the key dedups across restarts. Documents are
  * ordered field maps (field → JSON-literal value) so command field
  * order — Mongo commands key on the FIRST field — is preserved.
  */
object MongoStructures {

  /** field → raw JSON literal (`"name" -> "\"ix\""`, `"unique" -> "true"`). */
  type Doc = Seq[(String, String)]

  def renderDoc(doc: Doc): String =
    doc.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  /** One collection: options feed the `create` command verbatim;
    * indexes feed one `createIndexes`. Fetch-side normalization applies
    * at construction: the implicit `_id_` index drops (the target
    * creates it), legacy `ns`/`v` fields strip
    * (mongo_struct_fetcher.rs:114-121).
    */
  final case class MongoCollectionStatement(db: String, collection: String,
      options: Doc = Nil, indexes: Seq[Doc] = Nil) {

    def route(dstDb: String, dstCollection: String)
        : MongoCollectionStatement =
      copy(db = dstDb, collection = dstCollection)

    private def normalizedIndexes: Seq[Doc] =
      indexes
        .filterNot(_.exists { case (k, v) => k == "name" && v == "\"_id_\"" })
        .map(_.filterNot { case (k, _) => k == "ns" || k == "v" })

    /** Ordered (key, commandJson) pairs, gated by the `collection`
      * structure kind (reference StructureType::Collection).
      */
    def toCommands(filter: NameFilter): Seq[(String, String)] = {
      if (!filter.allowStructure("collection")) return Nil
      val create = renderDoc(
        ("create" -> s""""$collection"""") +: options)
      val base = Seq((s"collection.$db.$collection", create))
      val ixs = normalizedIndexes
      if (ixs.isEmpty) base
      else base :+ ((s"indexes.$db.$collection", renderDoc(Seq(
        "createIndexes" -> s""""$collection"""",
        "indexes" -> ixs.map(renderDoc).mkString("[", ",", "]")))))
    }
  }

  /** One sharded collection: ns = "db.collection", key doc, unique flag
    * (reference MongoShardCollection, mongo_shard.rs:17-21).
    */
  final case class MongoShardKeyStatement(ns: String, key: Doc,
      unique: Boolean = false) {

    /** Route only when the namespace matches the source (reference
      * mongo_shard_key_statement.rs `route`).
      */
    def route(srcDb: String, srcCollection: String, dstDb: String,
        dstCollection: String): MongoShardKeyStatement = {
      val srcNs = s"$srcDb.$srcCollection"
      if (ns == srcNs) copy(ns = s"$dstDb.$dstCollection") else this
    }

    /** Commands to apply against a target, following the sinker's
      * decision table (mongo_struct_sinker.rs:162-215):
      *   - `shard_key` kind filtered → nothing
      *   - target not a mongos → nothing (skip, logged by caller)
      *   - target already sharded identically → nothing (idempotent)
      *   - target sharded DIFFERENTLY → error, loud (silent divergence
      *     would split writes across wrong shards)
      *   - else → enableSharding on the db, then shardCollection
      */
    def toCommands(filter: NameFilter, targetIsMongos: Boolean,
        targetShardCollections: Map[String, (String, Boolean)])
        : Seq[(String, String)] = {
      if (!filter.allowStructure("shard_key")) return Nil
      if (!targetIsMongos) return Nil
      targetShardCollections.get(ns) match {
        case Some((existingKey, existingUnique)) =>
          val want = renderDoc(key)
          require(existingKey == want && existingUnique == unique,
            s"mongo target collection [$ns] shard key mismatch, " +
              s"source key: $want, source unique: $unique, " +
              s"target key: $existingKey, target unique: $existingUnique")
          Nil
        case None =>
          val db = ns.split("\\.", 2)(0)
          Seq(
            (s"enable_sharding.$db",
              s"""{"enableSharding":"$db"}"""),
            (s"shard_key.$ns", renderDoc(Seq(
              "shardCollection" -> s""""$ns"""",
              "key" -> renderDoc(key),
              "unique" -> unique.toString))))
      }
    }
  }
}
