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
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  import scala.collection.mutable

  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Spark trim(): strip 0x20 only
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = GraftExpressions.wsPattern.split(s.substring(b, e), -1)
    val out = new mutable.LinkedHashSet[Long]()
    var i = 0
    while (i + n <= toks.length) {
      var acc = 0L
      var t = 0
      while (t < n) {
        if (t > 0) acc = (acc * 31 + 32) % GraftExpressions.FoldP
        val w = toks(i + t)
        var j = 0
        while (j < w.length) {
          val cp = w.codePointAt(j)
          acc = (acc * 31 + cp) % GraftExpressions.FoldP
          j += Character.charCount(cp)
        }
        t += 1
      }
      out += acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
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
    e.injectFunction((FunctionIdentifier("graft_char_fold"),
      info("graft_char_fold", "rolling code-point hash"),
      exprs => CharFold(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot", "integer dot product"),
      exprs => LongDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "distinct word-5-gram hashes"),
      exprs => ShingleHashes(exprs.head, 5)))
  }
}

/** Session registration + Column-level accessors. */
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
      reg.createOrReplaceTempFunction("graft_long_dot",
        exprs => LongDot(exprs(0), exprs(1)), "scala_udf")
      reg.createOrReplaceTempFunction("graft_shingle_hashes",
        exprs => ShingleHashes(exprs.head, 5), "scala_udf")
    }
  }

  def charFold(c: Column): Column = call_function("graft_char_fold", c)
  def longDot(a: Column, b: Column): Column =
    call_function("graft_long_dot", a, b)
  def shingleHashes(c: Column): Column =
    call_function("graft_shingle_hashes", c)
}
