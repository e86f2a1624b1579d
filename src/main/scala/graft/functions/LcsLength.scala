package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Token-level LONGEST COMMON SUBSEQUENCE length as a native codegen'd
  * expression — the kernel of ROUGE-L, which is Self-Instruct's dedup
  * gate (Wang et al. 2022: drop a generated instruction when its
  * ROUGE-L F vs any pool instruction exceeds 0.7). Subsequence, not
  * substring: `x a x b x c` / `y a y b y c` score 3 with no shared
  * bigram, which is why shingle-based candidates can't drive this
  * metric and [[graft.ops.Dedup.rougeLPairs]] uses the bag-prefix
  * filter instead.
  *
  * Why a custom Expression: no builtin computes LCS, and the verify
  * stage evaluates it per candidate pair — a Scala UDF would both fall
  * out of whole-stage codegen and pay per-row boxing of two string
  * arrays. The two-row DP runs as one tight loop shared verbatim by
  * `eval` and the generated code (`LcsLength.lcs`).
  *
  * Null if either array is null; null ELEMENTS never match anything
  * (they contribute 0, like a token present on one side only).
  */
case class LcsLengthExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  private def ok(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"inputs must be array<string>, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsLength$$.MODULE$$.lcs($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLengthExpr =
    copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** Two-row LCS DP; the shorter side is the DP row. O(n·m) time,
    * O(min) space, zero allocation beyond the two rows. */
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val (s, t) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = s.numElements()
    val m = t.numElements()
    if (n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val tNull = t.isNullAt(i - 1)
      val tv = if (tNull) null else t.getUTF8String(i - 1)
      var j = 1
      while (j <= n) {
        val eq = !tNull && !s.isNullAt(j - 1) &&
          s.getUTF8String(j - 1).equals(tv)
        val d = prev(j - 1) + (if (eq) 1 else 0)
        val keep = if (prev(j) > cur(j - 1)) prev(j) else cur(j - 1)
        cur(j) = if (d > keep) d else keep
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      // cur becomes the next row; must not carry stale values
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n)
  }

  /** Column wrapper over two array&lt;string&gt; columns. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new LcsLengthExpr(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
