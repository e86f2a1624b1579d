package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Levenshtein edit distance as a native codegen'd expression, with an
  * optional cap for threshold-bounded verification — the exact-verify
  * kernel of short-text near-dedup (instruction/title dedup, where a
  * one-character paraphrase is the duplicate signature MinHash shingles
  * are too coarse to see).
  *
  * Why a custom Expression: Spark's builtin `levenshtein` exists but
  * offers no early-abandon cap — in the dedup verify stage every
  * candidate pair only needs "is the distance ≤ d", and the banded
  * early-exit turns O(n·m) per pair into O(d·n), the difference
  * between a verify stage bounded by candidate volume and one bounded
  * by string length squared at 100 TB. The capped and uncapped paths
  * share one loop (`EditDistance.dist`), called identically from
  * `eval` (interpreted contexts, e.g. join conditions) and `doGenCode`
  * (whole-stage codegen).
  *
  * Semantics contract: distance over UTF-8 BYTES — deliberately the
  * same contract as DuckDB's `levenshtein` (verified: 'é' vs 'e' = 2),
  * which is the independent cross-engine oracle (q168). On ASCII text
  * byte distance equals character distance; for mixed-script corpora
  * run [[NormalizeUnicode]] first so visually-identical strings don't
  * differ byte-wise. Null if either side is null. With `cap >= 0` the
  * result saturates at `cap + 1` ("more than cap" — callers filter
  * `<= cap`, so the saturated value is never observed downstream).
  */
case class EditDistanceExpr(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"inputs must be string, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistance.dist(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.EditDistance$$.MODULE$$.dist(
         |  $a.getBytes(), $b.getBytes(), $cap);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditDistanceExpr =
    copy(left = newLeft, right = newRight)
}

object EditDistance {

  /** Two-row DP with optional early abandon. `cap < 0` = exact; with a
    * cap, returns `cap + 1` as soon as the distance provably exceeds it
    * (length gap, or a full DP row whose minimum is already past the
    * cap — the Ukkonen band argument: row minima are non-decreasing).
    * Shared by the interpreted and the generated path so both are one
    * allocation-light loop. */
  def dist(a: Array[Byte], b: Array[Byte], cap: Int): Int = {
    // ensure the DP row is the shorter side (memory + row-min exit)
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (cap >= 0 && m - n > cap) return cap + 1
    if (n == 0) return if (cap >= 0 && m > cap) cap + 1 else m
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var j = 0
    while (j <= n) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= m) {
      cur(0) = i
      var rowMin = i
      val tc = t(i - 1)
      j = 1
      while (j <= n) {
        val subst = prev(j - 1) + (if (s(j - 1) == tc) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (subst < del) subst else del
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (cap >= 0 && rowMin > cap) return cap + 1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    val d = prev(n)
    if (cap >= 0 && d > cap) cap + 1 else d
  }

  /** Column wrapper: exact distance. */
  def apply(a: Column, b: Column): Column = apply(a, b, -1)

  /** Column wrapper: distance saturated at `cap + 1` (cap >= 0), or
    * exact (cap < 0). */
  def apply(a: Column, b: Column, cap: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      new EditDistanceExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b), cap))
}
