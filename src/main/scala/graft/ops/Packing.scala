package graft.ops

import org.apache.spark.sql.{DataFrame, Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.ops.Materialize.MaterializeOps

/** Sequence packing for LLM pretraining: documents are concatenated in
  * a stable order into one token stream that is cut into fixed-length
  * chunks ("concatenate then chunk" — documents may straddle chunk
  * boundaries, the GPT-style packing that wastes zero pad tokens).
  * Each document maps to its token interval [start, end) → first/last
  * chunk and in-chunk offset.
  *
  * The global prefix sum is the REAL two-pass distributed scan — an
  * unpartitioned window would funnel every row through one task:
  * range-partition by the ordering key, sum tokens per partition, fold
  * the per-partition totals into exclusive offsets on the driver (P
  * scalars — metadata, not data), then one mapPartitions pass adds the
  * running sum to its partition's offset. Per-row math is exact
  * integers, so chunk assignments are reproducible at any parallelism
  * and restatable by any engine (q52's DuckDB twin).
  */
object Packing {

  /** @param tokenCol per-document token count (e.g.
    *                 [[TextAnalysis.tokenCount]]); zero-token documents
    *                 get the degenerate span first_chunk == last_chunk
    *  @param seqLen  chunk length in tokens
    *  @param numPartitions range partitions for the scan (default: the
    *                 session's shuffle parallelism) */
  def chunkAssignments(df: DataFrame, idCol: String, tokenCol: Column,
      seqLen: Int, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // null token counts (e.g. null text) pack as zero-width spans
    // rather than NPE-ing the scan; localCheckpoint (not persist) so
    // both passes observe the SAME materialized partitioning and the
    // blocks are freed by the context cleaner once the result is
    // unreachable — a CacheManager persist would pin them for the
    // session lifetime.
    // The narrow projection materializes BEFORE repartitionByRange:
    // the RangePartitioner's sampling job and the shuffle would
    // otherwise EACH execute the upstream plan — tokenCol is often
    // split(text) over the whole corpus, so that's 2 extra full scans
    // of the text column at 100 TB.
    val narrow = df.select(col(idCol),
        coalesce(tokenCol.cast("long"), lit(0L)).as("n_tokens"))
      .materialized
    val base = narrow
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .materialized
    // pass 1: per-partition totals → exclusive global offsets
    val totals = base
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col("n_tokens")).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Array[Long] = {
      val out = new Array[Long](p)
      var acc = 0L
      for (i <- 0 until p) { out(i) = acc; acc += totals.getOrElse(i, 0L) }
      out
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: within-partition running sum + this partition's offset
    val outSchema = StructType(Seq(
      base.schema.head,
      StructField("n_tokens", LongType, nullable = false),
      StructField("token_end", LongType, nullable = false)))
    val withEnd = spark.createDataFrame(
      base.rdd.mapPartitionsWithIndex { (pid, it) =>
        var acc = bcOffsets.value(pid)
        it.map { r =>
          val n = r.getLong(1)
          acc += n
          Row(r.get(0), n, acc)
        }
      }, outSchema)
    val start = col("token_end") - col("n_tokens")
    val firstChunk = floor(start / seqLen).cast("long")
    withEnd
      .withColumn("token_start", start)
      .withColumn("first_chunk", firstChunk)
      .withColumn("last_chunk",
        when(col("n_tokens") === 0, firstChunk)
          .otherwise(floor((col("token_end") - 1) / seqLen).cast("long")))
      .withColumn("chunk_offset", pmod(start, lit(seqLen.toLong)))
  }

  /** PACKED-SEQUENCE SEGMENT MAP — the attention-mask spec for packed
    * pretraining batches: document-aware packing (block-diagonal /
    * "attention masking" in the T5 and Llama data pipelines, public)
    * needs, for every packed sequence, the list of document spans it
    * contains with their in-sequence offsets, so the trainer can build
    * the mask that stops cross-document attention. This is
    * [[chunkAssignments]] exploded to the (chunk, document) grain:
    * each document lands in every chunk it straddles with its clipped
    * `[seg_start, seg_end)` window, and `segment_index` numbers the
    * documents within a chunk in token order (0-based — the id the
    * mask/positional-reset logic keys on).
    *
    * All integer arithmetic over the same two-pass prefix sum —
    * nothing new shuffles except the final per-chunk hash agg for the
    * segment index, whose groups are chunk-sized (≤ seqLen documents
    * each) by construction. Zero-width docs (null/empty text) emit
    * nothing — a zero-token doc occupies no span in any sequence.
    *
    * @return (chunk, idCol, seg_start, seg_end, segment_index) */
  def packedSegments(df: DataFrame, idCol: String, tokenCol: Column,
      seqLen: Int, numPartitions: Int = 0): DataFrame = {
    val asg = chunkAssignments(df, idCol, tokenCol, seqLen, numPartitions)
      .filter(col("n_tokens") > 0)
    val spans = asg.select(col(idCol), col("token_start"), col("token_end"),
        explode(sequence(col("first_chunk"), col("last_chunk")))
          .as("chunk"))
      .select(col("chunk"), col(idCol),
        greatest(col("token_start") - col("chunk") * seqLen, lit(0L))
          .as("seg_start"),
        least(col("token_end") - col("chunk") * seqLen,
          lit(seqLen.toLong)).as("seg_end"))
    // within-chunk document order == seg_start order (spans are
    // disjoint); chunk-sized groups, so a per-chunk sorted collect is
    // bounded state — no global window
    val ordered = spans.groupBy(col("chunk"))
      .agg(sort_array(collect_list(struct(col("seg_start"),
        col("seg_end"), col(idCol)))).as("__segs"))
      .select(col("chunk"),
        posexplode(col("__segs")).as(Seq("segment_index", "__s")))
      .select(col("chunk"), col(s"__s.$idCol").as(idCol),
        col("__s.seg_start"), col("__s.seg_end"),
        col("segment_index").cast("int").as("segment_index"))
    ordered
  }

  /** Distributed global row number — the rank twin of
    * [[chunkAssignments]]'s prefix sum, for any ranking an unpartitioned
    * `row_number().over(Window.orderBy(...))` would funnel through a
    * single task (vocabulary ids, leaderboards, global sample order).
    * Since r10 this is a [[PrefixScan]] counter monoid: range-partition
    * by the ordering, count rows per partition, fold counts into
    * exclusive offsets on the driver (P scalars — metadata, not data),
    * then one mapPartitions pass emits offset + local position. Ranks
    * are deterministic whenever `order`
    * is a total order over the rows (ties ACROSS range boundaries would
    * otherwise land nondeterministically — callers must break ties,
    * e.g. with a unique trailing column).
    *
    * @param order ordering columns WITH direction (e.g.
    *              `Seq(col("tf").desc, col("token").asc)`)
    * @param limit stop emitting once this many rows are ranked: sorted
    *              partitions whose offset is past the limit are skipped
    *              WHOLESALE — a top-K truncation never deserializes the
    *              tail (pass `maxVocab` here, not a post-filter)
    * @return input columns + `outCol` (long, dense from 0 in rank order)
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], outCol: String,
      limit: Long = Long.MaxValue, numPartitions: Int = 0): DataFrame = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists on the input")
    // the simplest [[PrefixScan]] monoid: state = rows seen, zero
    // stepCols (pass 1 folds zero-column rows — a pure count), rank =
    // post-step count − 1, done once `limit` rows are ranked (the
    // monotone early-exit that skips tail partitions wholesale)
    PrefixScan.scan[Long](df, order,
      Seq(StructField(outCol, LongType, nullable = false)),
      new PrefixScan.ScanMonoid[Long] {
        def stepCols: Seq[String] = Nil
        def zero: Long = 0L
        def step(s: Long, v: Array[Any]): Long = s + 1L
        def combine(a: Long, b: Long): Long = a + b
        def emit(post: Long, v: Array[Any]): Seq[Any] = Seq(post - 1L)
        override def done(s: Long): Boolean = s >= limit
      }, numPartitions)
  }

  /** Per-document sliding-window chunking with overlap — the OTHER
    * standard corpus shaping next to [[chunkAssignments]]: documents
    * are cut independently into windows of `maxTokens` words advancing
    * by `maxTokens - overlap` (RAG indexing, long-doc SFT, embedding
    * pipelines — anywhere a document must stay self-contained instead
    * of straddling pack boundaries).
    *
    * Chunk count is `1 + ceil((n - maxTokens) / stride)` (one chunk
    * when `n <= maxTokens`), so the final window always reaches the
    * document's end and every token is covered. Pure map — a per-row
    * HOF expression, no shuffle, no state; at 100 TB it rides the
    * corpus scan like the other text operators. All math is integer,
    * so any engine restates the exact chunk boundaries (q67's twin).
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    // words bound ONCE as a column: a slice over the raw split(...)
    // expression inside the transform lambda would re-split the text
    // per chunk — O(words²/stride) per doc (the bigramFamiliarity rule)
    val w = col("__w")
    val n = size(w)
    // integer ceil((n - maxTokens) / stride) via (x + stride - 1) div stride
    // (Column./ is DOUBLE division — floor() restores the integer quotient,
    // exact for any n below 2^53)
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(lit(1) +
        floor((n - maxTokens + (stride - 1)) / lit(stride)).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => struct(i.as("chunk_idx"),
        concat_ws(" ", slice(w, i * stride + 1, lit(maxTokens)))
          .as("chunk_text"),
        size(slice(w, i * stride + 1, lit(maxTokens))).as("chunk_tokens")))
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__w"))
      .select(col(idCol), explode(chunks).as("__c"))
      .select(col(idCol), col("__c.chunk_idx"), col("__c.chunk_text"),
        col("__c.chunk_tokens"))
  }

  /** FIM (fill-in-the-middle) transformation — the pretraining-
    * objective data prep of Bavarian et al. 2022 ("Efficient Training
    * of Language Models to Fill in the Middle"): for a seeded `ratePermille`
    * fraction of documents, split the token stream at two seeded
    * points i ≤ j and emit PSM order
    * `<PRE> prefix <SUF> suffix <MID> middle`, teaching the model to
    * infill; the rest pass through untouched. Everything is seeded
    * integer math on the shared md5-60 construction — document
    * selection AND both split points are reproducible at any
    * parallelism and restatable by any engine, and the transform is a
    * pure map riding the corpus scan (no shuffle, no state).
    *
    * @param ratePermille documents transformed per 1000 (0..1000)
    * @return (idCol, fim_text, fim_applied, split_i, split_j);
    *         untransformed docs carry the original text and null splits */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      ratePermille: Int, seed: String): DataFrame = {
    require(ratePermille >= 0 && ratePermille <= 1000,
      s"ratePermille must be in [0, 1000], got $ratePermille")
    val words = split(trim(col(textCol)), "\\s+")
    val n = size(col("__w"))
    val selected = pmod(graft.ops.Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(seed))), lit(1000L)) <
      lit(ratePermille.toLong)
    // i in [0, n], j in [i, n] — both ends inclusive so empty
    // prefix/middle/suffix are all reachable (the paper's convention)
    val i = pmod(graft.ops.Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(seed), lit("#i"))),
      (n + 1).cast("long"))
    val j = col("__i") + pmod(graft.ops.Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(seed), lit("#j"))),
      (n - col("__i") + 1).cast("long"))
    val pre = slice(col("__w"), lit(1), col("__i").cast("int"))
    val mid = slice(col("__w"), col("__i").cast("int") + 1,
      (col("__j") - col("__i")).cast("int"))
    val suf = slice(col("__w"), col("__j").cast("int") + 1,
      (n - col("__j")).cast("int"))
    val fim = concat_ws(" ", concat(
      array(lit("<PRE>")), pre, array(lit("<SUF>")), suf,
      array(lit("<MID>")), mid))
    df.select(col(idCol), col(textCol), words.as("__w"))
      .withColumn("__sel", selected)
      .withColumn("__i", when(col("__sel"), i))
      .withColumn("__j", when(col("__sel"), j))
      .select(col(idCol),
        when(col("__sel"), fim).otherwise(col(textCol)).as("fim_text"),
        col("__sel").as("fim_applied"),
        col("__i").as("split_i"), col("__j").as("split_j"))
  }

  /** SPAN CORRUPTION prep (the T5/UL2 denoising objective's data
    * shape, Raffel et al. 2020): mask spans of `spanLen` tokens every
    * `stride` tokens (span starts offset per document by a seeded
    * hash), emitting the sentinel-compressed input and the
    * sentinel-prefixed target:
    * {{{ input:  the cat <X0> on the <X1> mat
    *     target: <X0> sat <X1> red }}}
    * The stride form trades T5's sampled span placement for exact
    * determinism: offsets and span indices are seeded integer math on
    * the shared md5-60 construction, so the pair is reproducible at
    * any parallelism and restatable by any engine (q142). ~spanLen/
    * stride of tokens mask (15% ≈ 2/13). Pure map riding the corpus
    * scan — no shuffle, no state; compose with [[fimTransform]]-style
    * seeded selection upstream to corrupt only a fraction of docs.
    *
    * @return (idCol, input_text, target_text, n_masked, n_spans) */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      stride: Int, spanLen: Int, seed: String): DataFrame = {
    require(stride >= 2 && spanLen >= 1 && spanLen < stride,
      s"need 1 <= spanLen < stride, got spanLen=$spanLen stride=$stride")
    val words = split(trim(col(textCol)), "\\s+")
    val off = pmod(graft.ops.Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit(seed))), lit(stride.toLong))
    // per-position struct; rel < 0 (before the first span start) is
    // never masked. floor(double) is exact here: rel is a small
    // integer-valued double and the correctly-rounded quotient cannot
    // cross an integer boundary (the lengthBucketedBatches rule).
    val marked = transform(sequence(lit(1), size(col("__w"))), p => {
      val rel = p.cast("long") - 1 - col("__off")
      val masked = (rel >= 0) && (pmod(rel, lit(stride.toLong)) <
        spanLen)
      val first = (rel >= 0) && (pmod(rel, lit(stride.toLong)) === 0)
      struct(element_at(col("__w"), p).as("tok"), masked.as("m"),
        first.as("f"),
        floor(rel / stride).cast("long").cast("string").as("k"))
    })
    val sentinel = (x: Column) =>
      concat(lit("<X"), x.getField("k"), lit(">"))
    val inputArr = transform(
      filter(col("__m"), x => !x.getField("m") || x.getField("f")),
      x => when(x.getField("f"), sentinel(x)).otherwise(x.getField("tok")))
    val targetArr = transform(filter(col("__m"), _.getField("m")),
      x => when(x.getField("f"),
        concat(sentinel(x), lit(" "), x.getField("tok")))
        .otherwise(x.getField("tok")))
    df.select(col(idCol), words.as("__w"), off.as("__off"))
      .withColumn("__m", marked)
      .select(col(idCol),
        concat_ws(" ", inputArr).as("input_text"),
        concat_ws(" ", targetArr).as("target_text"),
        size(filter(col("__m"), _.getField("m"))).cast("long")
          .as("n_masked"),
        size(filter(col("__m"), _.getField("f"))).cast("long")
          .as("n_spans"))
  }

  /** LENGTH-BUCKETED batching — the padded-batch counterpart of
    * [[packSequences]]: when documents must NOT straddle examples
    * (fine-tuning, reward modeling, eval), each batch pads to its
    * longest member, so batching similar lengths together is the
    * padding-waste lever. Documents land in the bucket of the first
    * `boundary >= length` (longer than every boundary → overflow bucket
    * `boundaries.size`); within a bucket, documents sort (length desc,
    * id asc) and cut into consecutive `batchSize` groups, putting
    * near-equal lengths side by side — the standard dynamic-padding
    * batcher.
    *
    * Scale shape: ONE [[globalRowNumber]] two-pass scan over (bucket,
    * length desc, id) — bucket rides in FRONT of the ordering, so one
    * global rank serves every bucket and no per-bucket window exists
    * (the unpartitioned-window hazard buildVocab's rank fixed); the
    * per-bucket rank is recovered by subtracting the bucket's min rank
    * (a boundaries-sized aggregate, broadcast back). Batch ids are
    * exact integer math — reproducible at any parallelism.
    *
    * @return (idCol, lenCol, bucket, batch) — join back to the payload
    *         by id; batch is per-bucket, dense from 0
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, lenCol: String,
      batchSize: Int, boundaries: Seq[Int]): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries,
      s"boundaries must be non-empty, ascending, distinct: $boundaries")
    val bucket = boundaries
      .map(b => when(col(lenCol) > b, 1).otherwise(0))
      .reduce(_ + _)
    val base = df.select(col(idCol),
      col(lenCol).cast("long").as(lenCol), bucket.as("bucket"))
    val ranked = globalRowNumber(base,
      Seq(col("bucket").asc, col(lenCol).desc, col(idCol).asc), "__rank")
    val mins = ranked.groupBy(col("bucket"))
      .agg(min(col("__rank")).as("__min"))
    // floor(double) is exact here: rank deltas are < 2^53 and the
    // correctly-rounded quotient cannot cross an integer boundary
    // (matching the oracle's restatement of the same formula)
    ranked.join(broadcast(mins), "bucket")
      .withColumn("batch",
        floor((col("__rank") - col("__min")) / lit(batchSize.toDouble))
          .cast("long"))
      .select(col(idCol), col(lenCol), col("bucket"), col("batch"))
  }

  /** NON-STRADDLING bin packing — the third packing discipline next to
    * [[chunkAssignments]] (concat-then-chunk, documents straddle) and
    * [[lengthBucketedBatches]] (fixed batch size, pad to longest):
    * documents are placed WHOLE into bins of `capacity` tokens (SFT /
    * eval packing where an example must never be cut and padding is
    * wasted budget — the "packing without cross-contamination"
    * objective, Krell et al. 2021).
    *
    * True first-fit-decreasing is inherently sequential, so the
    * distributed form is BLOCKED next-fit-decreasing: ONE
    * [[globalRowNumber]] scan ranks documents (length desc, id asc),
    * consecutive ranks form blocks of `blockSize`, and within a block
    * (already length-descending by construction) items fold
    * sequentially through a next-fit state — open bin takes the item
    * if it fits, otherwise a new bin opens. Within a block NFD wastes
    * ≤ 1.691·OPT bins (classical bound); across blocks the cost is at
    * most one partially-filled bin per block, so `blockSize` is the
    * waste/parallelism dial. A document longer than `capacity` lands
    * alone in its own bin with `over_capacity = true` (loud in the
    * output, not an exception — the caller decides whether oversize
    * docs were upstream-filtered).
    *
    * Scale shape: per-block state is blockSize-bounded (one
    * `collect_list` + `aggregate` HOF fold — the conversation-fold
    * pattern), the global bin id is a second two-pass rank over the
    * DISTINCT (block, bin) frame, and every step is exact integer
    * math: assignments are reproducible at any parallelism and
    * restatable by any engine (q160's recursive-CTE twin). Null
    * lengths fail loudly with the offending id (the q83 null-hygiene
    * convention).
    *
    * @return (idCol, item_len, block, bin_in_block, pack_bin dense
    *         from 0 in (block, bin) order, over_capacity)
    */
  def binPackBlocked(df: DataFrame, idCol: String, lenCol: Column,
      capacity: Long, blockSize: Int): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val base = df.select(col(idCol),
      coalesce(lenCol.cast("long"),
        raise_error(concat(lit("binPackBlocked: null length for id "),
          col(idCol).cast("string")))).as("item_len"))
    val ranked = globalRowNumber(base,
      Seq(col("item_len").desc, col(idCol).asc), "__rank")
    val blocks = ranked.withColumn("__block",
      floor(col("__rank") / lit(blockSize.toDouble)).cast("long"))
    // fold carries only (rank, len) — ranks are bigint regardless of
    // the caller's id type, and the payload re-attaches by rank below
    val zeroAsn = array()
      .cast("array<struct<rank:bigint,bin:bigint,over:boolean>>")
    val folded = blocks
      .groupBy(col("__block"))
      .agg(array_sort(collect_list(struct(col("__rank"), col("item_len"))))
        .as("__items"))
      .select(col("__block"),
        aggregate(col("__items"),
          struct(zeroAsn.as("asn"), lit(-1L).as("bin"), lit(0L).as("used")),
          (acc, it) => {
            val len = it.getField("item_len")
            val fits = (acc.getField("bin") >= 0) &&
              (acc.getField("used") + len <= capacity)
            val bin = when(fits, acc.getField("bin"))
              .otherwise(acc.getField("bin") + 1)
            val used = when(fits, acc.getField("used") + len)
              .otherwise(len)
            struct(
              concat(acc.getField("asn"), array(struct(
                it.getField("__rank").as("rank"), bin.as("bin"),
                (len > capacity).as("over")))).as("asn"),
              bin.as("bin"), used.as("used"))
          }).getField("asn").as("__asn"))
      .select(explode(col("__asn")).as("__a"))
      .select(col("__a.rank").as("__rank"),
        col("__a.bin").as("bin_in_block"),
        col("__a.over").as("over_capacity"))
    val assigned = blocks.join(folded, "__rank")
    val binIds = globalRowNumber(
      assigned.select(col("__block"), col("bin_in_block")).distinct(),
      Seq(col("__block").asc, col("bin_in_block").asc), "pack_bin")
    assigned.join(binIds, Seq("__block", "bin_in_block"))
      .select(col(idCol), col("item_len"), col("__block").as("block"),
        col("bin_in_block"), col("pack_bin"), col("over_capacity"))
  }
}
