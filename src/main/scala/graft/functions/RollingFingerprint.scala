package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Karp-Rabin winnowing fingerprint
  * (graft.ops.TextOps.rollingFingerprint semantics: base-257 polynomial mod
  * 2^31-1, minimum over all k-char windows).
  *
  * This is tier (b) of the custom-operator ladder (SURVEY §7.3): a scalar
  * whose inner loop is inherently procedural, expressed as an Expression
  * with doGenCode rather than a Scala UDF — it participates in whole-stage
  * codegen (one static call per row, no UDF closure serialization, no
  * encoder/boxing round-trip).
  *
  * Hash domain note: the computation runs over the UTF-16 code units of the
  * text (identical to the String-based twin for all inputs, including
  * non-ASCII).
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fingerprint expects a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  private val M = (1L << 31) - 1
  private val B = 257L

  /** Static kernel called from both interpreted eval and generated code.
    * Operates on the UTF8String's decoded chars (UTF-16 code units), the
    * same domain as String.charAt in the pure-Scala twin. */
  def compute(text: UTF8String, k: Int): Long = {
    val s = text.toString
    val n = s.length
    @inline def mulmod(a: Long, b: Long): Long = a * b % M
    if (n < k) {
      var h = 0L
      var i = 0
      while (i < n) { h = (mulmod(h, B) + s.charAt(i)) % M; i += 1 }
      h
    } else {
      var pow = 1L
      var j = 1
      while (j < k) { pow = mulmod(pow, B); j += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = (mulmod(h, B) + s.charAt(i)) % M; i += 1 }
      var min = h
      i = k
      while (i < n) {
        h = (h - mulmod(s.charAt(i - k), pow) % M + M) % M
        h = (mulmod(h, B) + s.charAt(i)) % M
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  /** FunctionRegistry builder: graft_rolling_fingerprint(text, k) with k a
    * foldable integer literal. */
  def builder(children: Seq[Expression]): Expression = children match {
    case Seq(text, kExpr) if kExpr.foldable =>
      kExpr.eval() match {
        case k: Int => RollingFingerprint(text, k)
        case k: Long => RollingFingerprint(text, k.toInt)
        case other => throw new IllegalArgumentException(
          s"graft_rolling_fingerprint: k must be an integer literal, got $other")
      }
    case _ => throw new IllegalArgumentException(
      "graft_rolling_fingerprint(text, k) expects 2 arguments with literal k")
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingFingerprint].getName, "graft_rolling_fingerprint")
}
