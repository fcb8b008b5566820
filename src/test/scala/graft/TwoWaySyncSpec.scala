package graft

import org.apache.spark.sql.functions._

import graft.model.{ChangeEvent, RowKind}
import graft.operators.{DataMarker, Router}

/** Two-way sync end to end: node A and node B each extract the peer's
  * changes, tag everything they APPLY with their own origin marker, and
  * filter out events whose origin is themselves — one full A→B→A round
  * trip must converge with zero echoes (the reference's data-marker
  * topology, data_marker.rs + base_extractor.rs:100-127).
  */
class TwoWaySyncSpec extends SparkSuite {
  import spark.implicits._

  private val router = Router(
    tbMap = Map(("app", "users") -> (("app", "users"))))

  /** One sync hop: extract at `self`, drop self-origin echoes, apply at
    * the peer tagging rows with `self` as origin.
    */
  private def hop(changes: org.apache.spark.sql.DataFrame, self: String)
      : org.apache.spark.sql.DataFrame =
    DataMarker.cycleFilter(changes, col("origin_node"), self)
      .withColumn("origin_node", lit(self))

  test("A→B→A round trip applies once and never echoes") {
    // locally-produced changes at A: no origin yet
    val atA = Seq((1L, "insert", null: String), (2L, "update", null))
      .toDF("k", "row_type", "origin_node")

    // hop 1: B's extractor pulls from A, B applies tagging origin=B?
    // No — the APPLIER at B writes A's marker: rows applied at B carry
    // the origin of the node they came FROM (the marker the A→B task
    // writes names A), so B's own extractor sees origin=A on them.
    val appliedAtB = hop(atA, self = "node_b")
      .withColumn("origin_node", lit("node_a"))
    assert(appliedAtB.count() == 2) // both rows replicate A→B

    // hop 2: A's extractor pulls B's changelog — which now contains the
    // replicated rows (origin=A) plus B's own local change
    val atB = appliedAtB.unionByName(
      Seq((3L, "insert", null: String))
        .toDF("k", "row_type", "origin_node"))
    val backAtA = hop(atB, self = "node_a")
      .withColumn("origin_node", lit("node_b"))
    // only B's local change flows back; A's rows are dropped as echoes
    assert(backAtA.select("k").as[Long].collect().toSeq == Seq(3L))

    // hop 3: B pulls again — the echo of its own change is dropped too
    val echo = hop(backAtA, self = "node_b")
    assert(echo.count() == 0)
  }

  test("marker insert names the origin for the peer's extractor") {
    val m = DataMarker.Marker("topo1", "node_a", "node_b")
    assert(m.markerInsertSql("ape_marker") ==
      "INSERT INTO ape_marker (topo, src_node, dst_node, " +
        "data_origin_node) VALUES ('topo1', 'node_a', 'node_b', " +
        "'node_a')")
  }

  test("nodeFilter applies the full do/ignore admission rule") {
    val df = Seq(
      (1L, "node_a"), (2L, "node_b"), (3L, "node_c"),
      (4L, null.asInstanceOf[String]))
      .toDF("k", "origin_node")
    def kept(doN: Seq[String], ignoreN: Seq[String]): Seq[Long] =
      DataMarker.nodeFilter(df, col("origin_node"), doN, ignoreN)
        .select("k").as[Long].collect().toSeq.sorted
    // origin-less rows always pass (locally produced)
    assert(kept(Nil, Nil) == Seq(1L, 2L, 3L, 4L))
    // ignore beats everything
    assert(kept(Nil, Seq("node_b")) == Seq(1L, 3L, 4L))
    // configured do_nodes is a whitelist
    assert(kept(Seq("node_a"), Nil) == Seq(1L, 4L))
    // both: in do AND not ignored
    assert(kept(Seq("node_a", "node_b"), Seq("node_b")) == Seq(1L, 4L))
  }

  test("reverse routing undoes the forward map for the return path") {
    val fwd = Router(tbMap = Map(("app", "users") ->
      (("replica", "users_v2"))))
    val back = fwd.reverse
    assert(fwd.routeTable("app", "users") == (("replica", "users_v2")))
    assert(back.routeTable("replica", "users_v2") == (("app", "users")))
  }

  test("typed events round-trip reverse: apply then un-apply") {
    val e = ChangeEvent("app", "users", 0L, RowKind.Update,
      before = Map("k" -> "1", "v" -> "old"),
      after = Map("k" -> "1", "v" -> "new"), "pk", "pv", "node_a")
    assert(e.reverse.reverse == e)
    val ins = e.copy(rowType = RowKind.Insert, before = Map.empty)
    assert(ins.reverse.rowType == RowKind.Delete)
    assert(ins.reverse.reverse.after == ins.after)
  }
}
