package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two array<double> columns.
  *
  * Why a custom Expression (the one place builtins genuinely can't):
  * the composed form — HOF folds or a 190-node unrolled sum — is
  * correct but collapses in two hot paths: (a) any predicate built on
  * it that references both sides of a nested-loop join is evaluated on
  * the INTERPRETED path per pair (measured 60–90 s for 2M pairs), and
  * (b) lambda interpretation allocates per row. This node evaluates as
  * one tight loop in BOTH paths: `eval` for interpreted contexts (join
  * conditions) and `doGenCode` for whole-stage codegen.
  *
  * FP contract: dot and both norms are independent sequential
  * left-to-right sums — bit-identical to the HOF/unrolled forms and to
  * DuckDB's `list_sum`, so oracle hash-compares stay exact. Degenerate
  * inputs follow the HOF form too: length-mismatched arrays yield null
  * (zip_with null-pads, poisoning its sums) and zero-norm vectors yield
  * NaN (0.0/0.0 — doubles never throw under ANSI).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, false) ||
      left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType == ArrayType(DoubleType, false) ||
        right.dataType == ArrayType(DoubleType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be array<double>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left must be array<double>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.getDouble($i);
         |    double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column wrapper: `CosineSimilarity(a, b)` (Spark 4 bridges Column
    * and catalyst Expression through classic.ExpressionUtils). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new CosineSimilarity(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
