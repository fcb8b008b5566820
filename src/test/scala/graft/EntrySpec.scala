package graft

class EntrySpec extends SparkSuite {

  test("driver contract: entry returns rows; every query has its oracle") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5) // one per region × compaction summary
    assert(rows.forall(_.getAs[Long]("live_keys") > 0))
    // every oracle key corresponds to a registered query
    assert(SparkEntry.oracleSql.keySet.subsetOf(
      SparkEntry.queries.keySet))
    // all queries are oracle-checked (no weaker rows-only entries today)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
