package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hash/vector hot paths.
  *
  * The composed higher-order-function versions (TextOps.charFold,
  * VectorOps.intDot) are semantically identical but evaluate interpreted
  * — lambda HOFs have no codegen — and the char fold pays O(n²) UTF8
  * seeks through substr. These expressions evaluate in one pass and
  * generate straight-line Java inside whole-stage codegen
  * (SURVEY §7.2's "custom Expression beats UDF" tier).
  */
object GraftExpressions {

  final val FoldP = 999999999999989L

  /** Java `\s+` — same class Spark's split uses. */
  val wsPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** The BPE pre-tokenizer: word pieces vs punctuation pieces — the
    * same split q38 and the BPE trainer use.
    */
  val preTokenPattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\w+|[^\\w\\s]")

  /** One-pass code-point rolling hash; exact same result as
    * aggregate(transform(sequence…, ascii(substr…)), fold) and DuckDB's
    * list_reduce(ord(substring…)) oracle.
    */
  def foldUtf8(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % FoldP
      i += Character.charCount(cp)
    }
    acc
  }

  /** Distinct shingle hashes in first-seen order, as Catalyst array
    * data — the codegen entry point of [[ShingleHashes]] (a static
    * call keeps the expression inside whole-stage codegen instead of
    * the CodegenFallback interpreted-eval detour).
    */
  def shingleDistinctData(s: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val all = shingleHashArray(s.toString, n)
    val seen = new java.util.HashSet[Long](Math.max(16, all.length * 2))
    val out = new Array[Long](all.length)
    var k = 0
    var i = 0
    while (i < all.length) {
      if (seen.add(all(i))) { out(k) = all(i); k += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (k == all.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** Positional gram hashes (no dedup) as Catalyst array data — the
    * codegen entry point of [[PositionalShingleHashes]].
    */
  def shinglePositionalData(s: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      shingleHashArray(s.toString, n))

  /** Unicode NFC (UAX #15 canonical composition) — the normalization
    * pass run before fingerprinting mixed-provenance corpora, so that
    * 'e'+U+0301 and U+00E9 dedup as the same document. Delegates to
    * `java.text.Normalizer`, which implements the same conformant
    * algorithm as DuckDB's utf8proc `nfc_normalize`, so the oracle is
    * exact. The fast path (`Normalizer.isNormalized`, an ASCII/quick-
    * check scan) returns the input untouched — on real corpora almost
    * every document is already NFC, so the common case allocates
    * nothing.
    */
  def nfcUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  /** Every word-n-gram rolling hash of `s` in token-position order —
    * the shared core of the distinct (ShingleHashes) and positional
    * (PositionalShingleHashes) expressions. Gram hash i equals
    * charFold(concat_ws(" ", tokens[i..i+n-1])): tokens fold with a
    * single space (0x20) separator, trim strips 0x20 only and split
    * is Java `\s+` with limit -1 — Spark's trim/split semantics, so
    * the composed-builtin form and the DuckDB oracle agree digit for
    * digit.
    */
  def shingleHashArray(s: String, n: Int): Array[Long] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = wsPattern.split(s.substring(b, e), -1)
    val m = toks.length - n + 1
    if (m <= 0) return Array.emptyLongArray
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 0L
      var t = 0
      while (t < n) {
        if (t > 0) acc = (acc * 31 + 32) % FoldP
        val w = toks(i + t)
        var j = 0
        while (j < w.length) {
          val cp = w.codePointAt(j)
          acc = (acc * 31 + cp) % FoldP
          j += Character.charCount(cp)
        }
        t += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** One-pass SimHash from an array of token hashes (each < 2^bits):
    * bit j of the result is set iff more than half the hashes have bit j
    * set. Exactly the per-bit ±1 vote-sum > 0 of the composed form
    * (sum of (bit*2-1) > 0  ⟺  2·ones > n).
    */
  def simhashBits(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (2 * ones(j) > n) fp |= (1L << j)
      j += 1
    }
    fp
  }

  final val MinhashP = 1000000007L

  /** Default-permutation signature — the entry generated code calls
    * (object vals have no Java-static field form, so codegen references
    * this method instead of the constant arrays).
    */
  def minhashSigDefault(hs: ArrayData): ArrayData =
    minhashSig(hs, MinHashSig.A, MinHashSig.B)

  /** One-pass MinHash signature: min over hashes of (a_k·(h mod P) + b_k)
    * mod P per permutation k. Empty input → all-null signature (matches
    * array_min over an empty transform).
    */
  def minhashSig(hs: ArrayData, as: Array[Long], bs: Array[Long])
      : ArrayData = {
    val k = as.length
    val n = hs.numElements()
    if (n == 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.fill[Any](k)(null))
    }
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = hs.getLong(i) % MinhashP
      var p = 0
      while (p < k) {
        val v = (as(p) * hm + bs(p)) % MinhashP
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(v => v: Any))
  }

  /** Exact mirror of the composed scaler `transform(v, x =>
    * round(cast(x as double) * 1e6).cast(long))`: Spark's Round on a
    * double routes through BigDecimal.valueOf (the shortest-decimal
    * rendering) with HALF_UP, and the long cast truncates the integral
    * double — reproduced term for term so swapping the expression in
    * cannot move a single quantized value. One native pass replaces
    * three interpreted per-element steps (HOF lambda + Round + Cast).
    */
  def scaleLongs(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // null elements propagate, exactly as the composed
      // transform(round(cast)) form does — not silently quantized to 0
      if (!a.isNullAt(i)) {
        val d = (if (isFloat) a.getFloat(i).toDouble
          else a.getDouble(i)) * 1e6
        out(i) = java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue().toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact integer dot product of two long-array columns. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** shingleHashes(text, n) → array<bigint>: distinct word-n-gram rolling
  * hashes in one pass. Exactly reproduces the composed pipeline
  * `transform(array_distinct(5-gram strings), charFold)`:
  * trim spaces (Spark's trim = 0x20 only), split `\s+` with limit -1
  * (Spark's split), join each n-token window with a single space, fold.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.shingleDistinctData(
      input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftExpressions.shingleDistinctData($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** shingleHashesPos(text, n) → array<bigint>: EVERY word-n-gram rolling
  * hash in position order (no dedup) — element i hashes the gram
  * starting at token i. The positional twin of [[ShingleHashes]] for
  * span-level operators (q105): posexplode gives (token offset, hash)
  * without ever materializing gram strings.
  */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.shinglePositionalData(
      input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftExpressions.shinglePositionalData($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** winnowFingerprints(text) → array<struct<pos:bigint, h:bigint>>: the
  * distinct robust-winnowing selection over the positional n-gram
  * rolling hashes — every window of `w` consecutive gram hashes
  * contributes its minimum with the RIGHTMOST tied position — in one
  * monotonic-deque pass (O(grams), each index pushed and popped once).
  * The native form of `HygieneOps.winnowOfComposed`'s HOF pipeline
  * (cross-checked in GraftExpressionsSpec); a document shorter than
  * one full window yields its single partial-window minimum, and a
  * document with no grams yields an empty array.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  import scala.collection.mutable

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = GraftExpressions.shingleHashArray(
      input.asInstanceOf[UTF8String].toString, n)
    val ng = hs.length
    val out = new mutable.LinkedHashSet[(Long, Long)]()
    if (ng > 0) {
      val dq = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < ng) {
        // >= pops equal tails, so among tied minima the newest
        // (rightmost) index survives nearest the head
        while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
        dq.addLast(i)
        while (dq.peekFirst <= i - w) dq.pollFirst()
        if (i >= w - 1 || i == ng - 1)
          out += ((dq.peekFirst.toLong, hs(dq.peekFirst)))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.map { case (p, h) =>
        org.apache.spark.sql.catalyst.InternalRow(p, h)
      })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** bpeEncode(text, merges) → array<string>: apply a learned BPE merge
  * table (graft.operators.BpeLearn) to a document — pre-tokenize with
  * the same lowercased `\w+|[^\w\s]` splitter the trainer uses, then
  * encode each pre-token by RANK-GREEDY merge application: repeatedly
  * merge the adjacent pair with the lowest merge rank present (all
  * its occurrences, left to right) until no adjacent pair has a rank.
  * This is the standard BPE inference order — merge priority comes
  * from training order, not from per-word pair frequency.
  *
  * Scale shape: map-only; the merge table rides inside the expression
  * (serialized with the task, the broadcast-small analog of a
  * codebook), and a per-task word→encoding cache collapses the
  * Zipf-heavy repetition of natural text — each distinct word encodes
  * once per task, not once per occurrence.
  */
case class BpeEncode(child: Expression,
    merges: Seq[(String, String)])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap
  // tasks normally deserialize their own expression instance, but a
  // concurrent map costs nothing and removes the sharing assumption
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  private def encodeWord(w: String): Array[String] = {
    val hit = cache.get(w)
    if (hit != null) return hit
    var syms = w.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      // lowest-rank adjacent pair present in the word
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            out += l + r
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out.result()
      }
    }
    // bound the cache against adversarial vocabularies; natural text
    // plateaus far below this
    if (cache.size < 100000) cache.put(w, syms)
    syms
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val m = GraftExpressions.preTokenPattern.matcher(text)
    val out = Array.newBuilder[Any]
    while (m.find()) {
      val toks = encodeWord(m.group())
      var i = 0
      while (i < toks.length) {
        out += UTF8String.fromString(toks(i))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.result())
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BpeEncode {
  /** Decode the foldable array<array<string>> merges argument of the
    * registered SQL form.
    */
  def parseMerges(v: Any): Seq[(String, String)] =
    v.asInstanceOf[ArrayData].toArray[ArrayData](
        ArrayType(StringType, containsNull = false))
      .map { pair =>
        (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      }.toSeq
}

/** charFold(string) → bigint, codegen-capable. */
case class CharFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_fold"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.foldUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftExpressions.foldUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** nfc(string) → string, codegen-capable: Unicode NFC normalization
  * (see [[GraftExpressions.nfcUtf8]]).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftExpressions.nfcUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** longDot(array<bigint>, array<bigint>) → bigint, codegen-capable. */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftExpressions.dotLong(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraftExpressions.dotLong($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** scaledLongs(array<float|double>) → array<bigint>: the ×1e6 integer
  * quantizer in front of every vector operator, codegen-capable.
  * Rounding is bit-identical to the composed round/cast form (see
  * [[GraftExpressions.scaleLongs]]).
  */
case class ScaledLongs(child: Expression) extends UnaryExpression {
  // null elements pass through (matching the composed round/cast form),
  // so the output is nullable exactly when the input elements are
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })
  override def prettyName: String = "graft_scaled_longs"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.scaleLongs(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftExpressions.scaleLongs($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** simhash(array<bigint>, bits) → bigint: one-pass per-bit majority
  * fingerprint, codegen-capable. Replaces `bits` interpreted aggregate()
  * passes per row in the composed form.
  */
case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.simhashBits(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftExpressions.simhashBits($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** minhashSig(array<bigint>) → array<bigint>: one-pass 8-permutation
  * MinHash signature, codegen-capable. The permutation constants live in
  * static arrays so generated code shares them.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType,
    containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.minhashSig(input.asInstanceOf[ArrayData],
      MinHashSig.A, MinHashSig.B)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftExpressions.minhashSigDefault($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MinHashSig {
  // referenced from generated code — must mirror FuzzyDedup.MinhashA/B
  val A: Array[Long] = Array(370248451L, 668265263L, 735632797L,
    868864229L, 903678863L, 965726881L, 982451653L, 998244353L)
  val B: Array[Long] = Array(12345L, 67891L, 23457L, 78913L,
    34569L, 89123L, 45678L, 91234L)
}

/** Cluster-wide registration via SparkSessionExtensions: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and every session — including
  * ones the library never touches — gets the native functions in SQL.
  */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.SparkSessionExtensions
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage,
      "", "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    // custom plan nodes (as-of join) plan through the injected strategy
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    e.injectFunction((FunctionIdentifier("graft_char_fold"),
      info("graft_char_fold", "rolling code-point hash"),
      exprs => CharFold(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot", "integer dot product"),
      exprs => LongDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "distinct word-5-gram hashes"),
      exprs => ShingleHashes(exprs.head, 5)))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes_pos"),
      info("graft_shingle_hashes_pos",
        "positional word-5-gram hashes (no dedup)"),
      exprs => PositionalShingleHashes(exprs.head, 5)))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "30-bit majority simhash of token hashes"),
      exprs => SimHashBits(exprs.head, 30)))
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "8-permutation minhash signature"),
      exprs => MinHashSig(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg", "deterministic bloom filter of hashes"),
      exprs => BloomFilterAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains", "bloom membership probe"),
      exprs => BloomMightContain(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_top_k_by"),
      info("graft_top_k_by", "bounded top-k (score, id) per group"),
      exprs => TopKByAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("graft_scaled_longs"),
      info("graft_scaled_longs", "×1e6 integer quantizer for vectors"),
      exprs => ScaledLongs(exprs.head)))
  }
}

/** Session registration + Column-level accessors.
  *
  * Every accessor self-registers on the active session before resolving
  * by name — otherwise each operator would silently depend on
  * `Tables.load` (which registers) having run first, an ordering hazard
  * that only held by accident of test-suite order. Registration is
  * idempotent (identity-keyed set), so the fast path is one set lookup.
  */
object GraftFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.functions.call_function

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register the expressions in the session's function registry
    * (idempotent). Makes them usable from Column DSL (via call_function)
    * and plain SQL, including inside higher-order lambdas.
    */
  def register(spark: SparkSession): Unit = {
    val classic =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (registered.add(System.identityHashCode(classic).toString)) {
      val reg = classic.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_char_fold",
        exprs => CharFold(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("graft_nfc",
        exprs => NfcNormalize(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("graft_long_dot",
        exprs => LongDot(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("graft_shingle_hashes",
        exprs => ShingleHashes(exprs.head, 5), "scala_udf")
      reg.createOrReplaceTempFunction("graft_shingle_hashes_pos",
        exprs => PositionalShingleHashes(exprs.head, 5), "scala_udf")
      reg.createOrReplaceTempFunction("graft_simhash",
        exprs => SimHashBits(exprs.head, 30), "scala_udf")
      reg.createOrReplaceTempFunction("graft_minhash_sig",
        exprs => MinHashSig(exprs.head), "scala_udf")
      // aggregate: analyzer wraps a bare AggregateFunction returned by a
      // registry builder in its AggregateExpression
      reg.createOrReplaceTempFunction("graft_kmin_values",
        exprs => KMinValues(exprs.head,
          exprs(1).eval().asInstanceOf[Int]), "scala_udf")
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => BloomFilterAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Int],
          exprs(2).eval().asInstanceOf[Int]), "scala_udf")
      reg.createOrReplaceTempFunction("graft_bloom_contains",
        exprs => BloomMightContain(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("graft_top_k_by",
        exprs => TopKByAgg(exprs(0), exprs(1),
          exprs(2).eval().asInstanceOf[Int]), "scala_udf")
      reg.createOrReplaceTempFunction("graft_scaled_longs",
        exprs => ScaledLongs(exprs.head), "scala_udf")
      reg.createOrReplaceTempFunction("graft_winnow",
        exprs => WinnowFingerprints(exprs.head, 5, 4), "scala_udf")
      reg.createOrReplaceTempFunction("graft_bpe_encode",
        exprs => BpeEncode(exprs.head,
          BpeEncode.parseMerges(exprs(1).eval())), "scala_udf")
    }
  }

  private def fn(name: String, cols: Column*): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(name, cols: _*)
  }

  def charFold(c: Column): Column = fn("graft_char_fold", c)
  def nfc(c: Column): Column = fn("graft_nfc", c)
  def longDot(a: Column, b: Column): Column =
    fn("graft_long_dot", a, b)
  def shingleHashes(c: Column): Column = fn("graft_shingle_hashes", c)
  def shingleHashesPos(c: Column): Column =
    fn("graft_shingle_hashes_pos", c)
  def simhash(c: Column): Column = fn("graft_simhash", c)
  def minhashSig(c: Column): Column = fn("graft_minhash_sig", c)
  def kminValues(c: Column, k: Int): Column =
    fn("graft_kmin_values", c, org.apache.spark.sql.functions.lit(k))
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    fn("graft_bloom_agg", c,
      org.apache.spark.sql.functions.lit(numBits),
      org.apache.spark.sql.functions.lit(numHashes))
  def bloomContains(bloom: Column, v: Column): Column =
    fn("graft_bloom_contains", bloom, v)
  def topKBy(score: Column, id: Column, k: Int): Column =
    fn("graft_top_k_by", score, id,
      org.apache.spark.sql.functions.lit(k))
  def scaledLongs(c: Column): Column = fn("graft_scaled_longs", c)
  def winnowFingerprints(c: Column): Column = fn("graft_winnow", c)
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    fn("graft_bpe_encode", c,
      org.apache.spark.sql.functions.typedLit(
        merges.map(m => Seq(m._1, m._2))))
}
