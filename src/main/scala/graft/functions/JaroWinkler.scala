package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd expression — the
  * record-linkage comparator for SHORT identity strings (names,
  * streets) where Levenshtein over-penalizes transpositions; the
  * natural companion to [[EditDistance]] in the Fellegi–Sunter
  * agreement vector (ops/EntityResolution).
  *
  * Semantics contract (pinned by differential test, not assumed):
  * DuckDB's `jaro_winkler_similarity` — the Winkler prefix boost
  * (p=0.1, prefix ≤ 4) applies ONLY when the raw Jaro similarity
  * exceeds the 0.7 boost threshold, and the empty string is 0-similar
  * to EVERYTHING including itself. 5,000 random cross-engine cases
  * match BIT-EXACTLY (the final double arithmetic is mirrored in
  * DuckDB's op order: ((m/l1 + m/l2) + (m-t)/m) / 3, then
  * j + (l·0.1)·(1−j)), so the q-oracle can hash-compare raw doubles.
  * Like [[EditDistance]], operates on UTF-8 BYTES (== DuckDB);
  * normalize first for non-ASCII.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"inputs must be string, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.sim(
         |  $a.getBytes(), $b.getBytes());""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Jaro–Winkler similarity over bytes, DuckDB-bit-compatible (see
    * class scaladoc for the pinned op order). Shared by `eval` and the
    * generated code. */
  def sim(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // incl. "" vs "" (DuckDB)
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val md = (if (l1 > l2) l1 else l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - md > 0) i - md else 0
      val hi = if (i + md + 1 < l2) i + md + 1 else l2
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j0 <= 0.7) return j0
    var l = 0
    val maxL = math.min(4, math.min(l1, l2))
    while (l < maxL && s1(l) == s2(l)) l += 1
    j0 + (l * 0.1) * (1.0 - j0)
  }

  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new JaroWinklerExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
