package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining (market-basket analysis)
  * — the Apriori 2-itemset pass expressed as relational algebra.
  *
  * Spark-first shape: baskets are NOT collected into driver-side
  * structures (the classic Apriori implementation materializes a
  * candidate lattice in memory); instead the 2-itemset counts come
  * from a self-join of the deduplicated (basket, item) relation on
  * the basket key with `item1 < item2`. The join is an equi-join on
  * the basket id, so at 100 TB it is one hash shuffle of each side;
  * the pair fan-out per basket is C(k,2) where k is the basket size —
  * bounded by the data model (a TPC-H-ish order has at most 7 lines),
  * so the blowup is a small constant, never quadratic in the table.
  * A pathological basket (one key with 10^5 items) would need the
  * same cap-and-sample guard as [[SkewOps]]; `maxBasketSize` applies
  * it: baskets above the cap are SILENTLY excluded from pair mining
  * (their items still count toward item supports). The output carries
  * no dropped-basket counter — a caller that needs the audit trail
  * counts `groupBy(basket).count > cap` itself before mining (one
  * cheap aggregation over the same deduped relation).
  *
  * Metrics are emitted over exact BIGINT counts with one final IEEE
  * division each (support, confidence, lift) so the ranking is
  * bit-identical across engines — the same discipline as the PMI
  * ranking in [[TextAnalysis.collocations]].
  */
object Association {

  /** Association rules over 2-itemsets.
    *
    * @param df            one row per (basket, item) occurrence;
    *                      duplicates within a basket are deduped first
    *                      (set semantics, the standard formulation).
    * @param basketCol     basket key column (e.g. order key)
    * @param itemCol       item column (e.g. part key)
    * @param minPairCount  minimum co-occurrence count (support floor)
    * @param maxBasketSize baskets with more distinct items than this
    *                      are excluded from pair mining (skew guard);
    *                      item supports still count them.
    * @return one row per unordered pair (item1 < item2):
    *         item1, item2, n_baskets, c_pair, c_item1, c_item2,
    *         support, conf_1_to_2, conf_2_to_1, lift — doubles are
    *         single divisions over exact counts.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Long, maxBasketSize: Int = 1000): DataFrame = {
    val b = col(basketCol)
    val i = col(itemCol)
    // set semantics per basket; one distinct shuffle, reused by both
    // the item-support scan and the pair self-join.
    val items = df.select(b.as("basket"), i.as("item")).distinct()

    // scalar basket count as a broadcast 1-row side, not a driver
    // action: the whole rule mine stays one lazy job.
    val nBaskets = items.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("item"))
      .agg(count(lit(1)).as("c_item"))

    val sized = items
      .withColumn("k", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("basket"))))
      .filter(col("k") <= maxBasketSize)
      .drop("k")

    val l = sized.select(col("basket"), col("item").as("item1"))
    val r = sized.select(col("basket"), col("item").as("item2"))
    val pairs = l.join(r, Seq("basket"))
      .filter(col("item1") < col("item2"))
      .groupBy(col("item1"), col("item2"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairCount)

    pairs
      .join(itemCounts.withColumnRenamed("item", "item1")
        .withColumnRenamed("c_item", "c_item1"), Seq("item1"))
      .join(itemCounts.withColumnRenamed("item", "item2")
        .withColumnRenamed("c_item", "c_item2"), Seq("item2"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item1"), col("item2"),
        col("n_baskets"),
        col("c_pair"), col("c_item1"), col("c_item2"),
        (col("c_pair").cast("double") / col("n_baskets")).as("support"),
        (col("c_pair").cast("double") / col("c_item1"))
          .as("conf_1_to_2"),
        (col("c_pair").cast("double") / col("c_item2"))
          .as("conf_2_to_1"),
        (col("c_pair").cast("double") * col("n_baskets")
          / (col("c_item1") * col("c_item2"))).as("lift"),
      )
  }
}
