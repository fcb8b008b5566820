package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Redis keyspace statistics scan — the reference's
  * `redis_scan_extractor.rs`: walk every keyspace with SCAN cursor
  * pages and collect per-key statistics, in two modes. HotKey reads
  * `OBJECT FREQ` (gated on `maxmemory-policy = allkeys-lfu`, the only
  * policy that maintains LFU counters); BigKey reads `MEMORY USAGE` +
  * `TYPE`. Databases come from `INFO keyspace`.
  *
  * The socket stays external (the [[PgSlotLifecycle]] /
  * [[ExplainEstimate]] boundary): [[drive]] runs the reference's exact
  * loop over any `Seq[String] => Seq[String]` command transport —
  * captured replies in tests, a real client in production — and the
  * rollups turn collected stats into the top-k reports a user reads,
  * through the bounded [[graft.functions.TopKByAgg]] map-side
  * aggregate (never a global sort).
  */
object RedisScanStats {

  sealed trait Mode
  case object HotKey extends Mode
  case object BigKey extends Mode

  final case class KeyStat(db: Long, key: String, freq: Long,
      dataSize: Long, valueType: String)

  // ---------------------------------------------------------- commands
  val infoKeyspaceCmd: Seq[String] = Seq("INFO", "keyspace")
  val maxmemoryPolicyCmd: Seq[String] =
    Seq("CONFIG", "GET", "maxmemory-policy")
  def selectCmd(db: Long): Seq[String] = Seq("SELECT", db.toString)
  def scanCmd(cursor: Long, count: Int): Seq[String] =
    Seq("SCAN", cursor.toString, "COUNT", count.toString)
  def objectFreqCmd(key: String): Seq[String] =
    Seq("OBJECT", "FREQ", key)
  def memoryUsageCmd(key: String): Seq[String] =
    Seq("MEMORY", "USAGE", key)
  def typeCmd(key: String): Seq[String] = Seq("TYPE", key)

  /** `INFO keyspace` → db ids: one `dbN:keys=…` line per keyspace
    * (first line is the section header).
    */
  def parseKeyspaceDbs(info: String): Seq[Long] =
    info.linesIterator.flatMap { line =>
      val t = line.split(":")
      if (t.length < 2 || !t(0).startsWith("db")) None
      else t(0).stripPrefix("db").toLongOption
    }.toSeq

  /** SCAN reply: next cursor head, keys tail. */
  def parseScanReply(reply: Seq[String]): (Long, Seq[String]) =
    (reply.head.toLong, reply.tail)

  /** Run the extractor loop over a command transport. HotKey mode
    * refuses to scan under any policy but allkeys-lfu — exactly the
    * reference's gate: FREQ counters don't exist otherwise and the
    * numbers would be lies.
    */
  def drive(conn: Seq[String] => Seq[String], mode: Mode,
      scanCount: Int = 100,
      schemaFilter: Long => Boolean = _ => true): Seq[KeyStat] = {
    if (mode == HotKey) {
      val policy = conn(maxmemoryPolicyCmd).lastOption.getOrElse("")
      require(policy == "allkeys-lfu",
        s"maxmemory_policy is $policy, should be allkeys-lfu")
    }
    val out = Seq.newBuilder[KeyStat]
    parseKeyspaceDbs(conn(infoKeyspaceCmd).mkString("\n"))
      .filter(schemaFilter).foreach { db =>
        require(conn(selectCmd(db)) == Seq("OK"),
          s"SELECT $db failed")
        var cursor = 0L
        var first = true
        while (first || cursor != 0L) {
          first = false
          val (next, keys) = parseScanReply(conn(scanCmd(cursor,
            scanCount)))
          cursor = next
          keys.foreach { key =>
            mode match {
              case HotKey =>
                // non-numeric FREQ replies (key evicted mid-scan) are
                // skipped, as in the reference's if-let
                conn(objectFreqCmd(key)).headOption
                  .flatMap(_.toLongOption).foreach { freq =>
                    out += KeyStat(db, key, freq, 0L, "")
                  }
              case BigKey =>
                // a key evicted between SCAN and MEMORY USAGE answers
                // nil — skip it, same as the HotKey branch's handling
                conn(memoryUsageCmd(key)).headOption
                  .flatMap(_.toLongOption).foreach { size =>
                    val tpe = conn(typeCmd(key)).head
                    out += KeyStat(db, key, 0L, size, tpe)
                  }
            }
          }
        }
      }
    out.result()
  }

  // TopKByAgg carries (score, id) pairs; each stat row gets a stable
  // synthetic id (hash of db+key) so the winners join back to names
  private val rowId = xxhash64(col("db"), col("key"))

  /** Top-k hottest keys per db — bounded map-side top-k
    * ([[graft.functions.TopKByAgg]]), no per-db sort.
    */
  def hotKeyReport(spark: SparkSession, stats: Seq[KeyStat],
      k: Int): DataFrame = {
    import spark.implicits._
    val df = stats.toDF()
    val names = df.select(rowId.as("rowid"), col("key"))
    df.groupBy(col("db"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("freq").cast("double"), rowId, k).as("top"))
      .select(col("db"), posexplode(col("top")))
      .select(col("db"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("rowid"),
        col("col.score").cast("long").as("freq"))
      .join(names, "rowid")
      .select(col("db"), col("rank"), col("key"), col("freq"))
  }

  /** Top-k biggest keys per (db, value type). */
  def bigKeyReport(spark: SparkSession, stats: Seq[KeyStat],
      k: Int): DataFrame = {
    import spark.implicits._
    val df = stats.toDF()
    val names = df.select(rowId.as("rowid"), col("key"))
    df.groupBy(col("db"), col("valueType"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("dataSize").cast("double"), rowId, k).as("top"))
      .select(col("db"), col("valueType"), posexplode(col("top")))
      .select(col("db"), col("valueType"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("rowid"),
        col("col.score").cast("long").as("data_size"))
      .join(names, "rowid")
      .select(col("db"), col("valueType"), col("rank"), col("key"),
        col("data_size"))
  }

  /** Command transport over a CAPTURED keyspace — the scan-task
    * equivalent of the CDC lane's `wal_capture`: a JSON-lines file
    * describing the keyspace (`{"db":0,"key":"k","type":"string",
    * "freq":5,"bytes":64}` per key, optional `{"policy":"..."}` line)
    * answers the exact command loop [[drive]] issues, with real SCAN
    * cursor pagination. Lets `extract_type=scan` run end-to-end from
    * an INI with no live socket.
    */
  def fixtureConn(text: String): Seq[String] => Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var policy = "allkeys-lfu"
    val keys = scala.collection.mutable.LinkedHashMap
      .empty[Long, Vector[(String, String, Long, Long)]]
    text.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val n = mapper.readTree(line)
      if (n.has("policy")) policy = n.get("policy").asText()
      else {
        val db = n.get("db").asLong()
        keys(db) = keys.getOrElse(db, Vector.empty) :+
          ((n.get("key").asText(),
            if (n.has("type")) n.get("type").asText() else "string",
            if (n.has("freq")) n.get("freq").asLong() else 0L,
            if (n.has("bytes")) n.get("bytes").asLong() else 0L))
      }
    }
    def find(key: String): Option[(String, String, Long, Long)] =
      keys.valuesIterator.flatten.find(_._1 == key)
    var db = -1L
    cmd => cmd match {
      case Seq("CONFIG", "GET", "maxmemory-policy") =>
        Seq("maxmemory-policy", policy)
      case Seq("INFO", "keyspace") =>
        Seq(("# Keyspace" +: keys.toSeq.map { case (d, ks) =>
          s"\ndb$d:keys=${ks.size},expires=0" }).mkString)
      case Seq("SELECT", d) => db = d.toLong; Seq("OK")
      case Seq("SCAN", cursor, "COUNT", count) =>
        val ks = keys.getOrElse(db, Vector.empty)
        val from = cursor.toInt
        val page = ks.slice(from, from + count.toInt)
        val next = if (from + page.size >= ks.size) 0
                   else from + page.size
        next.toString +: page.map(_._1)
      case Seq("OBJECT", "FREQ", k) =>
        find(k).map(e => Seq(e._3.toString))
          .getOrElse(Seq("ERR no such key"))
      case Seq("MEMORY", "USAGE", k) =>
        find(k).map(e => Seq(e._4.toString)).getOrElse(Seq.empty)
      case Seq("TYPE", k) =>
        Seq(find(k).map(_._2).getOrElse("none"))
      case other =>
        throw new IllegalArgumentException(
          s"fixture keyspace: unexpected command $other")
    }
  }
}
