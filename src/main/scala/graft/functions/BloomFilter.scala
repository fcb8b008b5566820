package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate
  .TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Deterministic Bloom filter over 64-bit hashes — the scale-path
  * prefilter for membership joins (decontamination, incremental dedup)
  * when the member set outgrows a broadcast hash join but a few MB of
  * bits still fit everywhere. Construction is an OR-merge aggregate:
  * partition order never changes the result, so the filter bytes are a
  * pure function of the set (same property KMV relies on).
  *
  * Layout: 4-byte numBits, 4-byte numHashes, then ceil(numBits/64)
  * big-endian words. Bit indexes come from Kirsch–Mitzenmacher double
  * hashing h1 + i·h2 of a 64-bit finalizer — no false negatives ever;
  * the false-positive rate follows (1 − e^(−kn/m))^k.
  */
object BloomFilter {

  /** splitmix64 finalizer — the bit mixer. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def wordsFor(numBits: Int): Int = (numBits + 63) / 64

  def setBits(words: Array[Long], numBits: Int, numHashes: Int,
      v: Long): Unit = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
        .toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Membership probe straight over the serialized bytes (static — the
    * codegen call target).
    */
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt(0)
    val numHashes = bb.getInt(4)
    val h1 = mix(v)
    val h2 = mix(v ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
        .toInt
      val word = bb.getLong(8 + (bit >>> 6) * 8)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long], numBits: Int, numHashes: Int)
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits); bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt(); val numHashes = bb.getInt()
    val words = new Array[Long](wordsFor(numBits))
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (words, numBits, numHashes)
  }
}

/** graft_bloom_agg(bigint, numBits, numHashes) → binary. */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64, "numBits must be >= 64")
  require(numHashes >= 1 && numHashes <= 16, "numHashes in [1,16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](BloomFilter.wordsFor(numBits))

  override def update(buffer: Array[Long], input: InternalRow)
      : Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      BloomFilter.setBits(buffer, numBits, numHashes,
        v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long])
      : Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomFilter.toBytes(buffer, numBits, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomFilter.toBytes(buffer, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomFilter.fromBytes(bytes)._1

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : BloomFilterAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : BloomFilterAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** graft_bloom_contains(binary, bigint) → boolean, codegen'd. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bytes: Any, v: Any): Any =
    BloomFilter.mightContain(bytes.asInstanceOf[Array[Byte]],
      v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.BloomFilter.mightContain($b, $v)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
