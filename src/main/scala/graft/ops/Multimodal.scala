package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

// Encoder row shapes live at the TOP LEVEL, not inside the object:
// Janino can't reliably resolve methods on classes nested in a Scala
// object from generated serializer code ("No applicable
// constructor/method found for ... Multimodal$StatsRow.id()"), and the
// whole projection silently falls back to interpreter mode — correct
// but off the codegen fast path for every row of the scan.
private[graft] case class AudioRow(id: Long, mime: String,
    sample_rate: Int, channels: Int, frames: Long, duration_sec: Double)
private[graft] case class StatsRow(id: Long, mime: String, width: Int,
    height: Int, channels: Int, mean_r: Double, mean_g: Double,
    mean_b: Double)

/** Multimodal-column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract runs per-partition in BATCHES (the Scala analog of
  * Python's mapInPandas batch shape) behind a pluggable codec.
  *
  * Two codecs bind the same [[ImageCodec]] seam: [[StubCodec]] is a
  * clearly-marked DETERMINISTIC FAKE ("decodes" dimensions from buffer
  * length — the plumbing-only path with an expression twin), and
  * [[JavaImageIoCodec]] is a REAL decoder (`javax.imageio`, in every
  * JDK — PNG/JPEG/GIF/BMP) used by [[decodeImageStats]] for actual
  * pixel work (dimensions + per-channel means), oracle-gated by q87 on
  * deterministic PNG fixtures. Video/audio codecs remain env-bound
  * (no native libs in the container); their partitioning shape is
  * [[frameOffsets]].
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, channels: Int)

  /** Real decode output: metadata + per-channel pixel means (sRGB). */
  case class ImageStats(mime: String, width: Int, height: Int,
      channels: Int, mean_r: Double, mean_g: Double, mean_b: Double)

  trait ImageCodec extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** Real pixel decode — the seam a feature extractor binds to. */
  trait PixelCodec extends Serializable {
    def decodeStats(bytes: Array[Byte]): ImageStats
  }

  /** Perceptual-fingerprint seam: a 64-bit average hash (aHash) over
    * the decoded image — the image twin of the text SimHash. */
  trait FingerprintCodec extends Serializable {
    def aHash64(bytes: Array[Byte]): Long
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

  /** Container-format sniff from magic bytes — decode-independent, so
    * the mime survives even for formats ImageIO can't rasterize. */
  def sniffMime(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') "image/png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8) "image/jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8') "image/gif"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      "image/bmp"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "audio/wav"
    else "application/octet-stream"

  /** REAL image decode on the JDK's built-in `javax.imageio` (PNG, JPEG,
    * GIF, BMP — no external native libs). Binds both seams: metadata
    * ([[ImageCodec]]) and pixel statistics ([[PixelCodec]]). Pixel means
    * are taken over `getRGB`'s sRGB view so they are format-independent;
    * undecodable bytes fail loudly (a corrupt blob in a curation
    * pipeline is a data bug, not a row to invent dimensions for —
    * pre-filter with [[sniffMime]] if tolerance is wanted). */
  object JavaImageIoCodec extends ImageCodec with PixelCodec
      with FingerprintCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null,
        s"undecodable image bytes (${bytes.length} B, ${sniffMime(bytes)})")
      img
    }

    def decode(bytes: Array[Byte]): MediaMeta = {
      val img = read(bytes)
      MediaMeta(sniffMime(bytes), img.getWidth, img.getHeight,
        img.getRaster.getNumBands)
    }

    def decodeStats(bytes: Array[Byte]): ImageStats = {
      val img = read(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ImageStats(sniffMime(bytes), w, h, img.getRaster.getNumBands,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

    /** 64-bit AVERAGE HASH (aHash), the classic perceptual fingerprint:
      * pool the image to an 8×8 brightness grid, set bit (bx + 8·by)
      * iff that cell is brighter than the grid mean. ALL-INTEGER by
      * contract — cell brightness is the integer-truncated mean of
      * per-pixel r+g+b over the cell's floor-boundary block, and the
      * threshold compare is the cross-multiplication `64·cell >
      * Σcells` — so the hash is bit-reproducible across engines and
      * restatable by an oracle with no resampling or float model
      * (q129). Near-identical images differ in few bits; pair them
      * with [[graft.ops.Dedup.fingerprintPairs]]. Images smaller than
      * the grid fail loudly (an icon has no 8×8 pooling). */
    def aHash64(bytes: Array[Byte]): Long = {
      val img = read(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= 8 && h >= 8, s"aHash64 needs >= 8x8 pixels, got ${w}x$h")
      val cells = new Array[Long](64)
      var by = 0
      while (by < 8) {
        val y0 = by * h / 8; val y1 = (by + 1) * h / 8
        var bx = 0
        while (bx < 8) {
          val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          cells(bx + 8 * by) = s / ((x1 - x0).toLong * (y1 - y0))
          bx += 1
        }
        by += 1
      }
      val total = cells.sum
      var fp = 0L
      var i = 0
      while (i < 64) {
        if (64L * cells(i) > total) fp |= 1L << i
        i += 1
      }
      fp
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
            require(bytes != null, s"null $blobCol for $idCol=$id")
            val m = codec.decode(bytes)
            (id, m.mime, m.width, m.height, m.channels)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaInt, Encoders.scalaInt, Encoders.scalaInt))
    out.toDF(idCol, "mime", "width", "height", "channels")
  }

  /** Perceptual image fingerprints, batch-shaped like [[decodeImages]]
    * (one codec per partition, pure map — at 100 TB the hash rides the
    * blob scan, and only the 8-byte fingerprint ever shuffles). Input:
    * (id, blob); output: (id, ahash). Feed
    * [[graft.ops.Dedup.fingerprintPairs]] for image near-dup pairs —
    * the image analog of the text SimHash chain (q23). */
  def imageAHash(df: DataFrame, idCol: String, blobCol: String,
      codec: FingerprintCodec = JavaImageIoCodec,
      batchSize: Int = 256): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            require(bytes != null, s"null $blobCol for $idCol=$id")
            (id, codec.aHash64(bytes))
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF(idCol, "ahash")
  }

  /** Real audio metadata: sample rate (Hz), channel count, frame count,
    * and the derived duration (frames / rate — one IEEE division, so
    * any engine restates the exact bits). */
  case class AudioMeta(mime: String, sample_rate: Int, channels: Int,
      frames: Long, duration_sec: Double)

  /** Real audio decode seam — WAV/AIFF/AU bind via the JDK; compressed
    * formats (mp3/ogg) bind the same trait with an external lib. */
  trait AudioCodec extends Serializable {
    def decodeAudio(bytes: Array[Byte]): AudioMeta
  }

  /** REAL audio metadata decode on the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU PCM — no external libs), the audio sibling of
    * [[JavaImageIoCodec]]: header-driven, so cost per blob is O(header),
    * not O(samples). Undecodable bytes fail loudly, same policy. */
  object JavaSoundCodec extends AudioCodec {
    def decodeAudio(bytes: Array[Byte]): AudioMeta = {
      val in = try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable audio bytes (${bytes.length} B, " +
              s"${sniffMime(bytes)})", e)
      }
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate.toInt
        AudioMeta(sniffMime(bytes), rate, fmt.getChannels, frames,
          frames.toDouble / rate)
      } finally in.close()
    }
  }

  /** Batch-shaped audio metadata decode — same partition/batch shape as
    * [[decodeImageStats]] (map-side only, one codec per partition).
    * Input: (id, blob); output: (id, mime, sample_rate, channels,
    * frames, duration_sec). */
  def decodeAudioMeta(df: DataFrame, idCol: String, blobCol: String,
      codec: AudioCodec = JavaSoundCodec, batchSize: Int = 256): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            require(bytes != null, s"null $blobCol for $idCol=$id")
            val m = codec.decodeAudio(bytes)
            AudioRow(id, m.mime, m.sample_rate, m.channels, m.frames,
              m.duration_sec)
          }
        }
      }(Encoders.product[AudioRow])
    out.toDF(idCol, "mime", "sample_rate", "channels", "frames",
      "duration_sec")
  }

  /** Batch-shaped REAL decode: dimensions + per-channel pixel means via
    * the pluggable [[PixelCodec]] — same partition/batch shape as
    * [[decodeImages]] (one codec per partition, fixed-size batches
    * mirroring Arrow). At 100 TB the cost model is the map side of the
    * corpus scan: no shuffle, bounded memory (one decoded image at a
    * time), prunable output columns.
    * Input: (id, blob); output: (id, mime, width, height, channels,
    * mean_r, mean_g, mean_b).
    */
  def decodeImageStats(df: DataFrame, idCol: String, blobCol: String,
      codec: PixelCodec = JavaImageIoCodec, batchSize: Int = 256): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            require(bytes != null, s"null $blobCol for $idCol=$id")
            val s = codec.decodeStats(bytes)
            StatsRow(id, s.mime, s.width, s.height, s.channels,
              s.mean_r, s.mean_g, s.mean_b)
          }
        }
      }(Encoders.product[StatsRow])
    out.toDF(idCol, "mime", "width", "height", "channels",
      "mean_r", "mean_g", "mean_b")
  }

  /** Deterministic frame-offset sampling for "video" blobs: byte offsets
    * of up to k frames, evenly spaced — the partitioning/shape of a real
    * frame sampler without the codec. */
  def frameOffsets(blob: Column, k: Int): Column = {
    val n = octet_length(blob).cast("long")
    val step = greatest((n / k).cast("long"), lit(1L))
    slice(sequence(lit(0L), greatest(n - 1, lit(0L)), step), 1, k)
  }

  /** Demuxer seam for video containers: frame count + per-frame
    * grayscale extraction. Real codecs (ffmpeg bindings) are env-bound
    * in this container — [[GvidCodec]] binds the seam to the GVID
    * fixture container ([[graft.sources.GvidFixtures]]), which is REAL
    * byte-level parsing (magic, header, offsets, bounds) minus only
    * the entropy coding. */
  trait VideoCodec extends Serializable {
    def frameCount(bytes: Array[Byte]): Int
    /** Grayscale frame `idx` as (width, height, w·h bytes). */
    def frame(bytes: Array[Byte], idx: Int): (Int, Int, Array[Byte])
  }

  /** GVID container parser: `GVID` magic, big-endian int32
    * width/height/frames, then raw 8-bit grayscale frames. Loud on
    * bad magic / truncated payload / out-of-range frame index. */
  object GvidCodec extends VideoCodec {
    private def header(bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 16 &&
        bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'I' &&
        bytes(3) == 'D', "not a GVID container (bad magic/short header)")
      val buf = java.nio.ByteBuffer.wrap(bytes, 4, 12)
      val w = buf.getInt; val h = buf.getInt; val n = buf.getInt
      require(bytes.length == 16 + n.toLong * w * h,
        s"truncated GVID: header says $n frames of ${w}x$h, " +
          s"payload is ${bytes.length - 16} bytes")
      (w, h, n)
    }
    def frameCount(bytes: Array[Byte]): Int = header(bytes)._3
    def frame(bytes: Array[Byte], idx: Int): (Int, Int, Array[Byte]) = {
      val (w, h, n) = header(bytes)
      require(idx >= 0 && idx < n, s"frame $idx out of range [0,$n)")
      val sz = w * h
      val out = new Array[Byte](sz)
      System.arraycopy(bytes, 16 + idx * sz, out, 0, sz)
      (w, h, out)
    }
  }

  /** Integer-pooled aHash of a grayscale frame — the [[JavaImageIoCodec
    * .aHash64]] arithmetic (floor-boundary 8×8 blocks, truncated cell
    * means, `64·cell > total` bits) over raw gray bytes, so frame
    * hashes share the image fingerprint's cross-engine contract. */
  private[graft] def grayAHash64(w: Int, h: Int, gray: Array[Byte]): Long = {
    require(w >= 8 && h >= 8, s"aHash64 needs >= 8x8 pixels, got ${w}x$h")
    val cells = new Array[Long](64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(y * w + x) & 0xff; x += 1 }
          y += 1
        }
        cells(bx + 8 * by) = s / ((x1 - x0).toLong * (y1 - y0))
        bx += 1
      }
      by += 1
    }
    val total = cells.sum
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (64L * cells(i) > total) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** FRAME SAMPLING + per-frame perceptual hash — the video half of
    * the multimodal brief (decode → frame-sample → fingerprint):
    * sample up to `k` frames per video at the evenly-spaced indices
    * `(j·n) div k` (j = 0..k−1, deduped — short videos yield fewer
    * distinct indices), hash each with the integer-pooled aHash.
    *
    * Scale shape: pure `mapPartitions` over the blob scan (the
    * mapInPandas batch shape) — no shuffle, no explode; each task
    * holds ONE video's bytes at a time, and emitted rows are 24 bytes
    * each regardless of video size. The downstream dedup join never
    * sees pixels.
    *
    * @return (idCol, frame_idx, ahash) */
  def sampleFrameHashes(df: DataFrame, idCol: String, blobCol: String,
      k: Int, codec: VideoCodec = GvidCodec): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          require(bytes != null, s"null $blobCol for $idCol=$id")
          val n = codec.frameCount(bytes)
          val idxs = (0 until k).map(j => (j.toLong * n / k).toInt)
            .distinct.filter(_ < n)
          idxs.map { f =>
            val (w, h, gray) = codec.frame(bytes, f)
            (id, f, grayAHash64(w, h, gray))
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaLong))
    out.toDF(idCol, "frame_idx", "ahash")
  }

  /** Cross-video near-dup from sampled frame hashes: videos sharing
    * `>= minMatches` DISTINCT frame hashes pair up — the
    * scene-overlap dedup a video corpus runs after [[
    * sampleFrameHashes]]. Join is bucketed BY HASH VALUE (the
    * [[graft.ops.Dedup]] convention — quadratic only inside
    * identical-hash buckets, never all-pairs), then one
    * map-side-combined pair count.
    *
    * @param frames (idCol, frame_idx, ahash) from [[sampleFrameHashes]]
    * @return (id_a, id_b, n_matches) with id_a < id_b */
  def videoOverlapPairs(frames: DataFrame, idCol: String,
      minMatches: Int): DataFrame = {
    require(minMatches >= 1, s"minMatches must be >= 1, got $minMatches")
    val h = frames.select(col(idCol).cast("long").as("id"),
      col("ahash")).distinct()
    h.join(h.select(col("id").as("id2"), col("ahash")), "ahash")
      .filter(col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).cast("long").as("n_matches"))
      .filter(col("n_matches") >= minMatches)
      .select(col("id_a"), col("id_b"), col("n_matches"))
  }

  /** NEAREST-NEIGHBOR image resize — the resize verb of the
    * multimodal brief, as a REAL pixel operation (`javax.imageio`
    * decode → integer source-pixel mapping → lossless PNG re-encode).
    * Nearest-neighbor by deliberate contract: output pixel (x, y)
    * copies source pixel `(x·sw div w, y·sh div h)` — pure integer
    * arithmetic, so the result is bit-reproducible across platforms
    * where interpolating resamplers (Graphics2D bilinear/bicubic) are
    * not, and a solid-fill source stays EXACTLY solid (q171's oracle
    * leans on this: resized fixture means need no tolerance).
    *
    * Scale shape: batched `mapPartitions` like [[decodeImageStats]] —
    * pure map on the scan, one image in memory per row, no shuffle.
    *
    * @return (idCol, blob: resized PNG, width, height) */
  def resizeImages(df: DataFrame, idCol: String, blobCol: String,
      w: Int, h: Int, batchSize: Int = 256): DataFrame = {
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    val out = df.select(col(idCol).cast("long"), col(blobCol))
      .as[(Long, Array[Byte])](enc)
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            require(bytes != null, s"null $blobCol for $idCol=$id")
            val src = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            require(src != null, s"undecodable image for $idCol=$id")
            val (sw, sh) = (src.getWidth, src.getHeight)
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                dst.setRGB(x, y, src.getRGB(x * sw / w, y * sh / h))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            require(javax.imageio.ImageIO.write(dst, "png", bos),
              "no PNG writer available")
            (id, bos.toByteArray, w, h)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY,
        Encoders.scalaInt, Encoders.scalaInt))
    out.toDF(idCol, blobCol, "width", "height")
  }
}
