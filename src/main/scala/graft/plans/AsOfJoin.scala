package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.PlanBridge

/** Native as-of join: for each probe row, the latest quote row with the
  * same key and quote.ts <= probe.ts (DuckDB `ASOF JOIN` semantics,
  * equal timestamps match).
  *
  * This is the brief's tier-(c) custom-operator path — a whole-operator
  * semantic Spark lacks as a single node — implemented as
  * LogicalPlan + SparkStrategy + SparkPlan and registered through
  * `SparkSessionExtensions` / `spark.experimental.extraStrategies`
  * (reference capability: ape-dts has no as-of join; this extends the
  * engine's analytics surface the way dt-connector composes operators).
  *
  * Why a physical operator instead of the union+window composition in
  * [[graft.operators.AdvancedOps.asofJoin]]: the composition shuffles
  * the UNION of both streams and runs a `last(ignoreNulls)` running
  * window that materializes every carried column for every row of both
  * sides. This node instead declares
  * `requiredChildDistribution = ClusteredDistribution(key)` per child —
  * EnsureRequirements co-partitions the two sides exactly like a
  * sort-merge join — and streams each co-partition pair in one forward
  * merge with O(1) state (the last matching quote per key). At 100 TB:
  * same two shuffles as a sort-merge join, zero extra materialization,
  * and AQE still plans both exchanges.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    leftVals: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    right.output ++ leftVals.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: sort-merge over co-partitioned children.
  *
  * Children are required to be hash-clustered on the key and sorted by
  * (key, ts) — Spark's EnsureRequirements inserts the exchanges/sorts
  * and aligns partition counts, so `zipPartitions` pairs co-partitions.
  * The merge keeps only the latest `leftVals` projection per key
  * (copied UnsafeRow of just the carried columns), never buffering
  * either side.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    leftVals: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    right.output ++ leftVals.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // one output row per probe row, in probe order, probe partitioning
  override def outputPartitioning: Partitioning =
    right.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrdering = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val lKeyExpr = BindReferences.bindReference(
      leftKey: Expression, left.output)
    val lTsExpr = BindReferences.bindReference(
      leftTs: Expression, left.output)
    val rKeyExpr = BindReferences.bindReference(
      rightKey: Expression, right.output)
    val rTsExpr = BindReferences.bindReference(
      rightTs: Expression, right.output)
    val lValExprs = leftVals.map(v =>
      BindReferences.bindReference(v: Expression, left.output))
    val nVals = leftVals.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val valsProj = UnsafeProjection.create(lValExprs)
      val joiner = new JoinedRow
      val nullVals = new GenericInternalRow(nVals)
      // downstream operators require UnsafeRow (SparkPlan's implicit
      // row-format contract) — project the joined view like SMJ does.
      // Bind against `output` (nullability-adjusted carries), not the
      // original child attrs: a non-nullable binding would read the
      // null slots of an unmatched probe as zeros.
      val resultProj = UnsafeProjection.create(
        output.map(BindReferences.bindReference(_: Expression, output)))

      new Iterator[InternalRow] {
        // lookahead on the quote side; key/ts extracted eagerly so the
        // underlying row buffer may be reused by the sorter
        private var headKey: Any = null
        private var headTs: Any = null
        private var headVals: InternalRow = null
        private var headValid = false
        // latest consumed quote whose (key, ts) qualified
        private var lastKey: Any = null
        private var lastVals: InternalRow = null

        private def advance(): Unit = {
          if (lIter.hasNext) {
            val row = lIter.next()
            headKey = lKeyExpr.eval(row)
            headTs = lTsExpr.eval(row)
            headVals = valsProj(row).copy()
            headValid = true
          } else {
            headValid = false
            headVals = null
          }
        }
        advance()

        override def hasNext: Boolean = rIter.hasNext

        override def next(): InternalRow = {
          val probe = rIter.next()
          val k = rKeyExpr.eval(probe)
          val t = rTsExpr.eval(probe)
          if (k != null && t != null) {
            // consume quotes up to (k, t]; null quote keys/ts sort
            // first and can never match — skip them
            var continue = headValid
            while (continue) {
              val c =
                if (headKey == null) -1
                else keyOrdering.compare(headKey, k)
              if (c < 0) advance()
              else if (c == 0 &&
                  (headTs == null || tsOrdering.compare(headTs, t) <= 0)) {
                if (headTs != null) {
                  lastKey = headKey
                  lastVals = headVals
                }
                advance()
              } else continue = false
              if (!headValid) continue = false
            }
          }
          val matched = k != null && lastVals != null &&
            lastKey != null && keyOrdering.compare(lastKey, k) == 0
          numOutputRows += 1
          resultProj(joiner(probe, if (matched) lastVals else nullVals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to its exec (injected via
  * `GraftExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, lv) =>
      AsOfJoinExec(lk, rk, lt, rt, lv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing constructors for the custom plan nodes. */
object GraftPlans {

  /** Idempotently add [[GraftStrategy]] to the session's planner. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GraftStrategy)) {
      exp.extraStrategies = GraftStrategy +: exp.extraStrategies
    }
  }

  /** As-of join `probe` (each row kept) against `quotes` (latest row
    * with equal `key` and `quotes.ts <= probe.ts`); `carry` columns from
    * the matched quote row are appended (null when no quote qualifies).
    *
    * Both sides are re-projected through fresh aliases so the node's
    * attribute references stay unambiguous even for self-joins (the
    * analyzer's relation dedup only knows built-in join types).
    */
  def asofJoin(probe: DataFrame, quotes: DataFrame, key: String,
      ts: String, carry: Seq[String]): DataFrame = {
    val spark = probe.sparkSession
    install(spark)
    val qProj = quotes.select(
      (Seq(key, ts) ++ carry).map(c => col(c).as(c)): _*)
    val pProj = probe.select(probe.columns.toSeq.map(c =>
      col(c).as(c)): _*)
    val qPlan = PlanBridge.analyzed(qProj)
    val pPlan = PlanBridge.analyzed(pProj)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(qPlan, pPlan,
      attr(qPlan, key), attr(pPlan, key),
      attr(qPlan, ts), attr(pPlan, ts),
      carry.map(attr(qPlan, _)))
    PlanBridge.ofRows(spark, node)
  }
}
