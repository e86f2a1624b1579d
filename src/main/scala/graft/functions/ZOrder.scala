package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) interleave of two 32-bit dimension keys into one
  * 64-bit clustering value — the multi-dimensional WRITE-LAYOUT key
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`: range-partitioning and
  * sorting by the interleaved value keeps parquet row-group min/max
  * ranges tight on BOTH dimensions at once, so a 100 TB scan filtered
  * on either column (or both) prunes row groups instead of reading
  * them. A single-column sort gives pruning on one dimension and
  * destroys it on the other; the Morton curve trades a little of each
  * for locality on all.
  *
  * Bit layout: result bit 2i is bit i of `left`, bit 2i+1 is bit i of
  * `right` (i in 0..31). Inputs must already be DIMENSION KEYS in
  * [0, 2^32): out-of-range values fail loudly (clamp/bucket/offset
  * upstream — silently masking would fold distant values onto the
  * same curve position and quietly ruin pruning). Pure integer bit
  * math — any engine restates the exact value (q130's oracle).
  *
  * The interleave is the classic 5-step mask spread (public-domain
  * "Interleave bits by Binary Magic Numbers", Stanford bit-twiddling
  * collection), codegen'd inline so the expression stays inside
  * whole-stage codegen on the write path.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"inputs must be bigint, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.ZOrder64.interleave($a, $b);""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Static interleave shared by eval and generated code (Java-callable
    * from Janino — the companion forwarder below keeps the generated
    * call site free of Scala `MODULE$` plumbing). */
  @inline def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = {
    if (a < 0L || a > 0xffffffffL || b < 0L || b > 0xffffffffL)
      throw new IllegalArgumentException(
        s"ZOrder64 dimension keys must be in [0, 2^32), got ($a, $b) — " +
          "bucket or offset the dimensions upstream")
    spread(a) | (spread(b) << 1)
  }

  /** Column wrapper: `ZOrder64(a, b)`; inputs cast to long. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      new ZOrder64(
        org.apache.spark.sql.GraftBridge.expression(a.cast("long")),
        org.apache.spark.sql.GraftBridge.expression(b.cast("long"))))

  /** Write-layout clustering: range-partition and sort the frame by the
    * Morton value of two dimension keys, so a downstream parquet write
    * gets tight per-file min/max on BOTH dimensions. `partitions`
    * defaults to the session shuffle parallelism; the z column is
    * internal and dropped. One range shuffle — the same price as any
    * single-column sort-before-write. */
  def clusterByZOrder(df: DataFrame, a: Column, b: Column,
      partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("__z"),
      "input must not already carry a __z column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__z", apply(a, b))
      .repartitionByRange(p, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
