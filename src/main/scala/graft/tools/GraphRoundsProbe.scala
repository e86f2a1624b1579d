package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Tables
import graft.ops.GraphOps

/** Dev tool: rounds actually executed by the early-exiting graph
  * iterations on the REAL query graphs — the measurement behind the
  * SCALING.md round-9 early-exit paragraph. Reconstructs each query's
  * edge set exactly as the registered query does (q241's orders graph,
  * q264's doc-link graph shape at whatever sf is given, q306's BFS
  * edges) and reports executed/ bounded rounds.
  * Usage: runMain graft.tools.GraphRoundsProbe [sfDir]
  */
object GraphRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // q241's edge set: orders co-purchase pairs (see Relational q241)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.join(li.withColumnRenamed("pk", "pk2"), "ok")
      .filter(col("pk") < col("pk2"))
      .select(col("pk").as("src"), col("pk2").as("dst"))
    val c1 = new AtomicInteger(-1)
    GraphOps.kCorePeel(edges, k = 100, rounds = 4, Some(c1)).count()
    println(s"kCorePeel(k=100, bound=4): rounds=${c1.get()}")
    // q251's graph: the HTML-fixture link edges (hardcodes sf0.01
    // fixtures like the query itself)
    val dir = graft.sources.HtmlFixtures.write(spark, sfDir)
    val pages = spark.read.format("graft-html").load(dir)
      .select(regexp_extract(col("name"), "doc_(\\d+)\\.html", 1)
        .cast("long").as("doc_id"), col("html"))
    val linkEdges = GraphOps.extractLinkEdges(pages, "doc_id", "html")
    val c2 = new AtomicInteger(-1)
    GraphOps.labelPropagation(linkEdges, rounds = 3, Some(c2)).count()
    println(s"labelPropagation(bound=3): rounds=${c2.get()}")
    // q268's graph: supplier-key-derived weighted edges + 1-in-10 seeds
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").cast("long").as("a"))
    val spEdges = sup.select(col("a").as("src"),
        expr("(a * 2) % 100 + 1").as("dst"))
      .union(sup.select(col("a").as("src"),
        expr("(a + 37) % 100 + 1").as("dst")))
      .union(sup.filter(expr("a % 3 = 0")).select(col("a").as("src"),
        expr("(a * 5 + 11) % 100 + 1").as("dst")))
      .withColumn("w", expr("(src * 7 + dst * 11) % 20 + 1"))
    val seeds = sup.filter(expr("a % 10 = 0")).select(col("a").as("node"))
    val c3 = new AtomicInteger(-1)
    GraphOps.shortestPathsBounded(spEdges, seeds, maxHops = 4, Some(c3))
      .count()
    println(s"shortestPathsBounded(bound=4): rounds=${c3.get()}")
    spark.stop()
  }
}
