package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.model.RowKind
import graft.sources.{MysqlBinlog, MysqlBinlogWriter}
import graft.sources.MysqlBinlog.ColType

/** Binlog wire-format replay — the oracle-checked end-to-end proof that
  * [[graft.sources.MysqlBinlog]] decodes what a MySQL server writes and
  * that the decoded stream compacts to the right final state (the
  * reference's extract→pipeline→sink spine, mysql_cdc_extractor.rs →
  * rdb_merger). Each Spark partition encodes its rows into ONE binlog
  * file image (insert transactions, updates for 'F' orders, deletes for
  * every 7th key, every third transaction ZSTD TransactionPayload-
  * wrapped), decodes it back, and the union compacts by key — the
  * per-file parallelism a binlog backlog has on a cluster: N files →
  * N map tasks, the only shuffle is the final key compaction.
  */
object BinlogReplay {

  /** One decoded change: partition-local seq keeps per-key event order
    * (all events for a key are generated in its partition).
    */
  final case class Decoded(seq: Long, row_type: String, o_orderkey: Long,
      o_custkey: Long, o_orderstatus: String, o_totalprice: Double,
      odate: String, o_orderpriority: String)

  private val Cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "odate", "o_orderpriority")
  private val Types = Seq(ColType.LongLong, ColType.LongLong,
    ColType.Varchar, ColType.Double, ColType.DateTime2, ColType.Varchar)
  private val Meta = Seq(0, 0, 40, 8, 0, 60)

  def binlogRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the sf fixture is one unsplittable parquet file; spread the
    // encode→decode work across the executors — in production one
    // binlog file IS one task, the repartition recreates that layout
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"),
      col("o_orderpriority"))
      .repartition(spark.sparkContext.defaultParallelism)

    val decoded = orders.mapPartitions { it =>
      // Stream the partition through the encoder 200 rows at a time —
      // NEVER materialize the partition (or the full binlog bytes)
      // per task: each 200-row chunk becomes one bounded binlog
      // segment (FDE + one txn, the rotate layout a size-capped
      // max_binlog_size produces) that is encoded, decoded, and
      // released before the next chunk is pulled. Per-task memory is
      // O(chunk), independent of partition size.
      var txn = 0L
      var seq = 0L
      it.map { r =>
        Array(r.getLong(0).toString, r.getLong(1).toString,
          r.getString(2), r.getDouble(3).toString, r.getString(4),
          r.getString(5))
      }.grouped(200).flatMap { chunk =>
        txn += 1
        val w = new MysqlBinlogWriter(serverId = 1L)
        w.fde()
        def writeTxn(enc: MysqlBinlogWriter): Unit = {
          enc.begin("tpch")
          enc.tableMap(11L, "tpch", "orders", Types, Meta,
            nullable = Seq.fill(6)(true), colNames = Cols)
          enc.writeRows(11L, chunk)
          val updated = chunk.filter(_(2) == "F").map { r =>
            (r, r.updated(5, "X-UPDATED"))
          }
          if (updated.nonEmpty) enc.updateRows(11L, updated)
          val doomed = chunk.map { r =>
            if (r(2) == "F") r.updated(5, "X-UPDATED") else r
          }.filter(_(0).toLong % 7 == 0)
          if (doomed.nonEmpty) enc.deleteRows(11L, doomed)
          enc.xid(txn)
        }
        if (txn % 3 == 0) w.transactionPayload(zstd = true)(writeTxn)
        else writeTxn(w)
        val events = MysqlBinlog.decodeFile(w.bytes(),
          f"binlog.$txn%06d")
        events.map { e =>
          val img = if (e.rowType == RowKind.Delete) e.before else e.after
          val d = Decoded(seq, e.rowType,
            img("o_orderkey").toLong, img("o_custkey").toLong,
            img("o_orderstatus"), img("o_totalprice").toDouble,
            img("odate"), img("o_orderpriority"))
          seq += 1
          d
        }
      }
    }

    // key compaction: last event per key wins, deletes drop out —
    // shuffles only once, on the key
    decoded.toDF()
      .groupBy(col("o_orderkey"))
      .agg(max_by(struct(col("row_type"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("odate"),
        col("o_orderpriority")), col("seq")).as("last"))
      .where(col("last.row_type") =!= RowKind.Delete)
      .select(col("o_orderkey"), col("last.o_custkey").as("o_custkey"),
        col("last.o_orderstatus").as("o_orderstatus"),
        col("last.o_totalprice").as("o_totalprice"),
        col("last.odate").as("odate"),
        col("last.o_orderpriority").as("o_orderpriority"))
  }

  /** pgoutput twin of q64: one decoded change per message, text-protocol
    * values (pgoutput tuples are text-rendered), REPLICA IDENTITY
    * DEFAULT updates, 'K' deletes, keepalives interleaved. Same
    * per-partition capture-file parallelism; one key-compaction shuffle.
    */
  final case class PgDecoded(seq: Long, row_type: String, c_custkey: Long,
      c_name: String, c_nationkey: Int, c_acctbal: Double,
      c_mktsegment: String)

  def pgoutputRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))
      .repartition(spark.sparkContext.defaultParallelism)

    val decoded = customer.mapPartitions { it =>
      // Same streaming discipline as the mysql path: one bounded
      // capture segment per 200-row chunk (each self-describing — pg
      // re-sends Relation per connection, so per-segment replay must
      // carry it), encoded+decoded+released before the next chunk is
      // pulled; per-task memory O(chunk), not O(partition).
      val cols = Seq(
        graft.sources.PgOutput.RelColumn("c_custkey", keyPart = true,
          typeOid = 20, typeMod = -1),
        graft.sources.PgOutput.RelColumn("c_name", false, 25, -1),
        graft.sources.PgOutput.RelColumn("c_nationkey", false, 23, -1),
        graft.sources.PgOutput.RelColumn("c_acctbal", false, 701, -1),
        graft.sources.PgOutput.RelColumn("c_mktsegment", false, 25, -1))
      var lsn = 0x1000L
      var xid = 0L
      var seq = 0L
      it.map { r =>
        Array(r.getLong(0).toString, r.getString(1),
          r.getInt(2).toString, r.getDouble(3).toString, r.getString(4))
      }.grouped(200).flatMap { chunk =>
        xid += 1
        val w = new graft.sources.PgOutputWriter()
        w.begin(lsn + 0x100, 0L, xid)
        w.relation(16385L, "tpch", "customer", 'd', cols)
        chunk.foreach(r => w.insert(16385L, r))
        chunk.filter(_(4) == "BUILDING").foreach { r =>
          w.update(16385L, None, None, r.updated(1, "UPD:" + r(1)))
        }
        w.keepalive(replyRequested = false)
        chunk.filter(_(0).toLong % 5 == 0).foreach { r =>
          w.delete(16385L, 'K',
            Array(r(0), null, null, null, null))
        }
        w.commit(lsn + 0x100, lsn + 0x200, 0L)
        lsn += 0x1000
        val events = graft.sources.PgOutput.decodeFile(w.bytes(), "0/0")
        events.map { e =>
          val d =
            if (e.rowType == graft.model.RowKind.Delete)
              PgDecoded(seq, e.rowType, e.before("c_custkey").toLong,
                null, 0, 0.0, null)
            else
              PgDecoded(seq, e.rowType, e.after("c_custkey").toLong,
                e.after("c_name"), e.after("c_nationkey").toInt,
                e.after("c_acctbal").toDouble, e.after("c_mktsegment"))
          seq += 1
          d
        }
      }
    }

    decoded.toDF()
      .groupBy(col("c_custkey"))
      .agg(max_by(struct(col("row_type"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
        col("seq")).as("last"))
      .where(col("last.row_type") =!= RowKind.Delete)
      .select(col("c_custkey"), col("last.c_name").as("c_name"),
        col("last.c_nationkey").as("c_nationkey"),
        col("last.c_acctbal").as("c_acctbal"),
        col("last.c_mktsegment").as("c_mktsegment"))
  }

  val pgoutputRoundtripSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'UPD:' || c_name
      |       ELSE c_name END AS c_name,
      |  c_nationkey, c_acctbal, c_mktsegment
      |FROM customer
      |WHERE c_custkey % 5 <> 0""".stripMargin

  val binlogRoundtripSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
      |  CASE WHEN o_orderstatus = 'F' THEN 'X-UPDATED'
      |       ELSE o_orderpriority END AS o_orderpriority
      |FROM orders
      |WHERE o_orderkey % 7 <> 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_binlog_roundtrip" -> (binlogRoundtrip _),
    "q65_pgoutput_roundtrip" -> (pgoutputRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q64_binlog_roundtrip" -> binlogRoundtripSql,
    "q65_pgoutput_roundtrip" -> pgoutputRoundtripSql)
}
