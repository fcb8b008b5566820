package graft.meta

/** MySQL GTID set — the resume token CDC carries alongside
  * (binlog_file, position): `uuid:1-5:7,uuid2:1-3` with per-source-id
  * interval lists. The reference accumulates one across the stream
  * (mysql_cdc_extractor.rs:171,225 via its binlog client's GtidSet) and
  * persists the rendering in Position::MysqlCdc; this is the same
  * contract over the public GTID text format: parse, add one gtid (the
  * Gtid event), merge/extend intervals, canonical render.
  */
final class GtidSet {

  private val intervals =
    scala.collection.mutable.Map.empty[String, List[(Long, Long)]]

  /** Add one transaction id (`uuid:gno`), merging adjacent/overlapping
    * intervals. The streaming common case — extending the newest
    * interval by one — stays O(intervals).
    */
  def add(gtid: String): this.type = {
    val idx = gtid.lastIndexOf(':')
    require(idx > 0, s"bad gtid '$gtid' (want uuid:gno)")
    val gno = gtid.substring(idx + 1).toLong
    require(gno > 0, s"bad gtid sequence $gno")
    addInterval(gtid.substring(0, idx), gno, gno)
    this
  }

  private[meta] def addInterval(uuid0: String, lo: Long,
      hi: Long): Unit = {
    val uuid = uuid0.toLowerCase
    intervals(uuid) =
      GtidSet.insert(intervals.getOrElse(uuid, Nil), lo, hi)
  }

  def contains(gtid: String): Boolean = {
    val idx = gtid.lastIndexOf(':')
    if (idx <= 0) return false
    val uuid = gtid.substring(0, idx).toLowerCase
    val gno = gtid.substring(idx + 1).toLong
    intervals.getOrElse(uuid, Nil)
      .exists { case (lo, hi) => lo <= gno && gno <= hi }
  }

  /** Canonical text: uuids sorted, intervals ascending, single ids
    * without the dash.
    */
  def render: String =
    intervals.toSeq.sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map {
        case (lo, hi) if lo == hi => lo.toString
        case (lo, hi) => s"$lo-$hi"
      }.mkString(":")
    }.mkString(",")

  def isEmpty: Boolean = intervals.isEmpty

  /** Immutable view (uuid → ascending disjoint closed intervals) —
    * the wire encoder (COM_BINLOG_DUMP_GTID) walks this.
    */
  def intervalView: Map[String, List[(Long, Long)]] = intervals.toMap
}

object GtidSet {

  /** Sorted disjoint insert with adjacency merging. */
  private def insert(list: List[(Long, Long)], lo: Long,
      hi: Long): List[(Long, Long)] = {
    val (before, rest) = list.span(_._2 < lo - 1)
    val (overlapping, after) = rest.span(_._1 <= hi + 1)
    val newLo = (lo +: overlapping.map(_._1)).min
    val newHi = (hi +: overlapping.map(_._2)).max
    before ++ ((newLo, newHi) :: after)
  }

  /** Parse `uuid:1-5:7,uuid2:3`; empty/blank → empty set. */
  def parse(s: String): GtidSet = {
    val set = new GtidSet()
    s.split(",").map(_.trim).filter(_.nonEmpty).foreach { part =>
      val fields = part.split(":")
      require(fields.length >= 2, s"bad gtid set part '$part'")
      fields.drop(1).foreach { iv =>
        val (lo, hi) = iv.split("-") match {
          case Array(x) => (x.toLong, x.toLong)
          case Array(x, y) => (x.toLong, y.toLong)
          case _ => throw new IllegalArgumentException(
            s"bad gtid interval '$iv'")
        }
        require(lo <= hi && lo > 0, s"bad gtid interval '$iv'")
        set.addInterval(fields(0), lo, hi)
      }
    }
    set
  }
}
