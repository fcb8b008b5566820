package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Check/revise queries with deterministically seeded target divergence
  * (FIXTURES.md §3): dst is derived from orders (o_orderkey is unique — a
  * checker's row identity must be a real key) by dropping keys (→ MISS),
  * perturbing o_totalprice (→ DIFF), and shifting in extra keys (→ ORPHAN).
  * Both engines derive the same dst, so the classification is exactly
  * comparable.
  */
object CheckQueries {

  private val keys = Seq("o_orderkey")
  private val cmpCols = Seq("o_totalprice", "o_orderstatus",
    "o_orderpriority")

  /** The seeded divergent target table. */
  def dst(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select((keys ++ cmpCols).map(col): _*)
    val modified = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 13)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(97)) === 5,
          col("o_totalprice") + 1).otherwise(col("o_totalprice")))
    val orphans = o.filter(pmod(col("o_orderkey"), lit(97)) === 29)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
    modified.unionByName(orphans)
  }

  private val dstSql =
    """SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 97 = 5 THEN o_totalprice + 1
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 13
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus,
      |    o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 = 29""".stripMargin

  private val diffColsSql =
    """concat_ws(',',
      |  CASE WHEN s.o_orderpriority IS DISTINCT FROM d.o_orderpriority
      |    THEN 'o_orderpriority' END,
      |  CASE WHEN s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
      |    THEN 'o_orderstatus' END,
      |  CASE WHEN s.o_totalprice IS DISTINCT FROM d.o_totalprice
      |    THEN 'o_totalprice' END)""".stripMargin

  private val checkJoinSql =
    s"""WITH dst AS ($dstSql),
       |src AS (SELECT o_orderkey, o_totalprice, o_orderstatus,
       |  o_orderpriority FROM orders),
       |j AS (
       |  SELECT
       |    COALESCE(s.o_orderkey, d.o_orderkey) AS o_orderkey,
       |    s.o_totalprice AS src_price, d.o_totalprice AS dst_price,
       |    CASE WHEN s.o_orderkey IS NULL THEN 'ORPHAN'
       |         WHEN d.o_orderkey IS NULL THEN 'MISS'
       |         WHEN s.o_totalprice IS DISTINCT FROM d.o_totalprice
       |           OR s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
       |           OR s.o_orderpriority IS DISTINCT FROM d.o_orderpriority
       |           THEN 'DIFF'
       |         ELSE 'OK' END AS status,
       |    CASE WHEN s.o_orderkey IS NOT NULL AND d.o_orderkey IS NOT NULL
       |      THEN $diffColsSql ELSE '' END AS diff_cols
       |  FROM src s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey)""".stripMargin

  /** The shared Spark-side check result (all rows, incl. OK). */
  private def checked(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir).select((keys ++ cmpCols).map(col): _*)
    Checker.diff(src, dst(spark, dir), keys, cmpCols)
  }

  /** q20 — check classification: every non-OK row with its differing
    * columns.
    */
  def checkDiff(spark: SparkSession, dir: String): DataFrame =
    checked(spark, dir)
      .filter(col(Checker.StatusCol) =!= "OK")
      .select(col("o_orderkey"),
        col("src_o_totalprice").as("src_price"),
        col("dst_o_totalprice").as("dst_price"),
        col(Checker.StatusCol).as("status"),
        concat_ws(",", col(Checker.DiffColsCol)).as("diff_cols"))

  val checkDiffSql: String =
    s"""$checkJoinSql
       |SELECT o_orderkey, src_price, dst_price, status, diff_cols
       |FROM j WHERE status <> 'OK'""".stripMargin

  /** q21 — revise synthesis: placeholder-mode SQL per non-OK row
    * (MISS→INSERT, DIFF→UPDATE with only the differing columns SET,
    * ORPHAN→DELETE by key).
    */
  def reviseSql(spark: SparkSession, dir: String): DataFrame = {
    val c = checked(spark, dir).filter(col(Checker.StatusCol) =!= "OK")
    c.select(col("o_orderkey"),
      Checker.reviseOp(col(Checker.StatusCol)).as("op"),
      Checker.reviseSqlPlaceholder("orders", keys,
        col(Checker.DiffColsCol), col(Checker.StatusCol)).as("sql"))
  }

  val reviseSqlSql: String =
    s"""$checkJoinSql
       |SELECT o_orderkey,
       |  CASE status WHEN 'MISS' THEN 'insert' WHEN 'DIFF' THEN 'update'
       |    WHEN 'ORPHAN' THEN 'delete' END AS op,
       |  CASE status
       |    WHEN 'MISS' THEN 'INSERT INTO orders VALUES (?)'
       |    WHEN 'DIFF' THEN 'UPDATE orders SET ' ||
       |      replace(diff_cols, ',', '=?, ') || '=?' ||
       |      ' WHERE o_orderkey=' || CAST(o_orderkey AS VARCHAR)
       |    WHEN 'ORPHAN' THEN 'DELETE FROM orders' ||
       |      ' WHERE o_orderkey=' || CAST(o_orderkey AS VARCHAR)
       |  END AS sql
       |FROM j WHERE status <> 'OK'""".stripMargin

  /** q22 — sampling check: arithmetic row-identity hash, keep hash%100<10
    * (reference: id_hash % 100 < sample_rate).
    */
  def sampleCheck(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val h = Checker.arithKeyHash(col("l_orderkey"), col("l_linenumber"))
    li.withColumn("key_hash", h)
      .filter(Checker.sampleFilter(col("key_hash"), 10))
      .select(col("l_orderkey"), col("l_linenumber"), col("key_hash"),
        col("l_quantity"))
  }

  val sampleCheckSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  (l_orderkey * 1000003 + l_linenumber) % 1000000007 AS key_hash,
      |  l_quantity
      |FROM lineitem
      |WHERE ((l_orderkey * 1000003 + l_linenumber) % 1000000007) % 100 < 10""".stripMargin

  /** q53 — the check-log loop as one dataflow: the check result renders
    * to CheckLog JSON lines (miss/diff artifacts), the lines parse back
    * through the reader schema, and revise SQL derives from the PARSED
    * log only — proving the persisted artifact carries everything the
    * revise task needs (ids, diff columns, both images).
    */
  def checkLogLoop(spark: SparkSession, dir: String): DataFrame = {
    import graft.infra.CheckLogs
    val lines = CheckLogs.toLogs(checked(spark, dir), "app", "orders",
      keys, cmpCols)
    val parsed = lines.select(
      from_json(col("line"), CheckLogs.logSchema).as("log"))
      .select(col("log.*"))
    CheckLogs.reviseFromLogs(parsed, "orders", keys)
      .select(
        element_at(col("id_col_values"), "o_orderkey").cast("long")
          .as("o_orderkey"),
        col("op"), col("sql"),
        element_at(col("diff_col_values"), "o_totalprice")("src")
          .cast("double").as("src_price"),
        element_at(col("diff_col_values"), "o_totalprice")("dst")
          .cast("double").as("dst_price"))
  }

  val checkLogLoopSql: String =
    s"""$checkJoinSql
       |SELECT o_orderkey,
       |  CASE status WHEN 'MISS' THEN 'insert' ELSE 'update' END AS op,
       |  CASE status
       |    WHEN 'MISS' THEN 'INSERT INTO orders VALUES (?)'
       |    ELSE 'UPDATE orders SET ' ||
       |      replace(diff_cols, ',', '=?, ') || '=?' ||
       |      ' WHERE o_orderkey=' || CAST(o_orderkey AS VARCHAR)
       |  END AS sql,
       |  CASE WHEN status = 'DIFF' AND src_price IS DISTINCT FROM dst_price
       |    THEN src_price END AS src_price,
       |  CASE WHEN status = 'DIFF' AND src_price IS DISTINCT FROM dst_price
       |    THEN dst_price END AS dst_price
       |FROM j WHERE status IN ('MISS', 'DIFF')""".stripMargin

  /** q54 — per-table check summary counts (summary.log shape). */
  def checkSummary(spark: SparkSession, dir: String): DataFrame =
    graft.infra.CheckLogs.tableSummary(checked(spark, dir), "app",
      "orders")

  val checkSummarySql: String =
    s"""$checkJoinSql
       |SELECT 'app' AS schema, 'orders' AS tb,
       |  count(*) AS checked_count,
       |  count(CASE WHEN status = 'MISS' THEN 1 END) AS miss_count,
       |  count(CASE WHEN status = 'DIFF' THEN 1 END) AS diff_count,
       |  count(CASE WHEN status = 'ORPHAN' THEN 1 END) AS orphan_count,
       |  count(CASE WHEN status <> 'OK' THEN 1 END) = 0 AS is_consistent
       |FROM j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_check_diff" -> (checkDiff _),
    "q21_revise_sql" -> (reviseSql _),
    "q22_sample_check" -> (sampleCheck _),
    "q53_check_log_loop" -> (checkLogLoop _),
    "q54_check_summary" -> (checkSummary _))

  val oracles: Map[String, String] = Map(
    "q20_check_diff" -> checkDiffSql,
    "q21_revise_sql" -> reviseSqlSql,
    "q22_sample_check" -> sampleCheckSql,
    "q53_check_log_loop" -> checkLogLoopSql,
    "q54_check_summary" -> checkSummarySql)
}
