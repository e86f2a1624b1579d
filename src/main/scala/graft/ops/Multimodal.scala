package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs per-partition in BATCHES (the Scala analog of
  * Python's mapInPandas batch shape) behind a pluggable codec.
  *
  * The container ships no image/audio libraries, so [[StubCodec]] is a
  * clearly-marked DETERMINISTIC FAKE — it "decodes" dimensions from the
  * byte buffer's length/content. The Spark-side plumbing (schema, batch
  * iteration, partition-local codec reuse, expression twin for
  * pushdown-friendly metadata) is real and tested; swapping in a native
  * codec changes one `val`.
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, channels: Int)

  trait ImageCodec extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decode — STUB for the absent native codec. Must
    * stay in lockstep with [[metaExpr]] (tested). */
  object StubCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): MediaMeta = {
      // 64-bit multiply: n*7919 overflows Int32 for blobs >= ~272 KB,
      // and the expression twin runs under ANSI (would throw, not wrap)
      val n = bytes.length.toLong
      MediaMeta("image/fake", (64 + n % 1024).toInt,
        (64 + (n * 7919) % 1024).toInt, 3)
    }
  }

  /** Expression twin of the stub decode: same metadata computed as pure
    * Columns (codegen'd, prunable) — the fast path when only metadata is
    * needed and no real pixel work happens. */
  def metaExpr(blob: Column): Column = {
    val n = octet_length(blob).cast("long") // match DuckDB's 64-bit octet_length
    struct(
      lit("image/fake").as("mime"),
      (lit(64) + pmod(n, lit(1024))).cast("int").as("width"),
      (lit(64) + pmod(n * 7919, lit(1024))).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** Batch-shaped decode over partitions: groups rows into fixed-size
    * batches inside each partition (mapInPandas batch shape), reusing
    * one codec instance per partition (= per connection/lib handle).
    * Input: (id, blob); output: (id, mime, width, height, channels).
    */
  def decodeImages(df: DataFrame, idCol: String, blobCol: String,
      codec: ImageCodec = StubCodec, batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        // one codec per partition; batch iteration mirrors Arrow batches
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val m = codec.decode(bytes)
            (id, m.mime, m.width, m.height, m.channels)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt))
    out.toDF(idCol, "mime", "width", "height", "channels")
  }

  /** Deterministic frame-offset sampling for "video" blobs: byte offsets
    * of up to k frames, evenly spaced — the partitioning/shape of a real
    * frame sampler without the codec. */
  def frameOffsets(blob: Column, k: Int): Column = {
    val n = octet_length(blob).cast("long")
    val step = greatest((n / k).cast("long"), lit(1L))
    slice(sequence(lit(0L), greatest(n - 1, lit(0L)), step), 1, k)
  }
}
