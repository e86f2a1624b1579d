package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path

class AtomicParquetSpec extends SparkSpec {
  import spark.implicits._

  private def fs(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("publish swaps atomically: readers see old table, then new, never neither") {
    val dir = Files.createTempDirectory("graft_pub").toString + "/master"
    AtomicParquet.publish(Seq((1L, "a")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
    AtomicParquet.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    assert(spark.read.parquet(dir).count() == 2)
    // no leftover tmp/old directories after a clean publish
    assert(!fs(dir).exists(new Path(dir + "__tmp")))
    assert(!fs(dir).exists(new Path(dir + "__old")))
  }

  test("recover restores the saved master after a mid-swap crash") {
    val dir = Files.createTempDirectory("graft_rec").toString + "/master"
    AtomicParquet.publish(Seq((1L, "a")).toDF("id", "v"), dir)
    // simulate a crash between the two renames: main moved to __old,
    // replacement never arrived
    assert(fs(dir).rename(new Path(dir), new Path(dir + "__old")))
    // read() heals on restart — the production entry path must never see
    // an empty master where __old still holds the data
    assert(AtomicParquet.read(spark, dir,
      Seq((0L, "z")).toDF("id", "v")).count() == 1)
    AtomicParquet.recover(spark, dir)
    assert(spark.read.parquet(dir).count() == 1)
    // healthy state: recover is a no-op
    AtomicParquet.recover(spark, dir)
    assert(spark.read.parquet(dir).count() == 1)
  }
}
