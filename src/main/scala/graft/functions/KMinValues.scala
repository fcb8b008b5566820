package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch as a custom
  * TypedImperativeAggregate — the SURVEY §4 "optional Catalyst extension"
  * tier, and the sketch family that (unlike HLL) is DETERMINISTIC: the
  * k smallest distinct hash values of a set are a pure function of the
  * set, independent of partitioning, merge order, and engine. That makes
  * it the only distinct-estimation sketch whose result can hash-match a
  * DuckDB oracle exactly (`list_sort(list_distinct(...))[1:k]`).
  *
  * Estimator: with the hash domain [0, D) and kth-smallest value v_k,
  * distinct ≈ (k-1)·D / v_k. At 100 TB the aggregate ships k longs per
  * group per partition (map-side partial, exact merge), vs shipping the
  * full distinct set for an exact count.
  *
  * Buffer: a sorted distinct set capped at k; serialize = k longs.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def prettyName: String = "graft_kmin_values"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(b: java.util.TreeSet[java.lang.Long]): Unit =
    while (b.size() > k) b.pollLast()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v.asInstanceOf[Long])
      trim(buffer)
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    buffer.addAll(other)
    trim(buffer)
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    new GenericArrayData(buffer.iterator().asScala
      .map(_.longValue()).toArray)

  override def serialize(buffer: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size())
    buffer.iterator().asScala.foreach(v => out.writeLong(v.longValue()))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => b.add(in.readLong()))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
