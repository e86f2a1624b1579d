package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the corpus operators: packing interval algebra
  * over random token counts, and hash-split assignment law. Batched —
  * one Spark job per property. */
class CorpusPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("packing: contiguity + chunk arithmetic hold for random inputs") {
    // zero-token docs included: they get the degenerate point span
    val counts = samples(Gen.chooseNum(0, 2000), 300)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val L = 128
    val rows = Packing.chunkAssignments(df, "doc_id", $"n", L)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"token_start", $"token_end",
        $"first_chunk", $"last_chunk", $"chunk_offset")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // intervals tile the stream with no gaps or overlap
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._4); case _ => ()
    }
    rows.foreach { case (_, n, s, e, fc, lc, off) =>
      assert(e - s == n)
      assert(fc == s / L)
      assert(lc == (if (n == 0) s / L else (e - 1) / L))
      assert(off == s % L && off >= 0 && off < L)
      assert(fc <= lc)
    }
  }

  test("packing: two-pass distributed scan == single-window reference") {
    import org.apache.spark.sql.expressions.Window
    val counts = samples(Gen.chooseNum(0, 500), 200)
    val df = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "n")
    val dist = Packing
      .chunkAssignments(df, "doc_id", $"n", 64, numPartitions = 7)
      .select($"doc_id", $"token_end").as[(Long, Long)].collect().toMap
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = df.select($"doc_id",
        sum($"n".cast("long")).over(w).as("token_end"))
      .as[(Long, Long)].collect().toMap
    assert(dist == ref)
  }

  test("hash split: every bucket obeys its threshold band, any seed") {
    val seeds = Seq("a", "b", "xyz")
    for (seed <- seeds) {
      val out = Sampling.hashSplit(spark.range(2000).toDF("id"), "id", seed)
        .select($"bucket", $"split").as[(Long, String)].collect()
      out.foreach { case (b, s) =>
        assert(b >= 0 && b < 10000)
        val expect = if (b < 8000) "train" else if (b < 9000) "val" else "test"
        assert(s == expect, s"bucket $b -> $s")
      }
    }
  }

  test("winnowing: native sketch == HOF twin on random strings and params") {
    // the monotonic-deque sliding min is the riskiest loop in the native
    // sketch; drive it with random texts (repeats included so window
    // minima tie) across (k, w) shapes, incl. w > gram count
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      s <- Gen.stringOfN(n, Gen.oneOf(('a' to 'e') :+ ' '))
    } yield s
    val texts = samples(gen, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    for ((k, w) <- Seq((3, 5), (8, 4), (12, 16), (5, 200))) {
      val native = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      val hof = TextAnalysis.winnowingFingerprintsHof(df, "doc_id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      assert(native == hof, s"k=$k w=$w")
    }
  }

  test("cross-corpus pairs == self-dedup pairs restricted to the cut " +
      "(consistency between the two LSH paths)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newSide = docs.filter($"doc_id" % 3 === 0)
    val oldSide = docs.filter($"doc_id" % 3 =!= 0)
    val cross = Dedup.crossCorpusJaccardPairs(newSide, oldSide,
        "doc_id", "text", n = 3, tau = 0.5)
      .select($"id_new", $"id_old").as[(Long, Long)].collect().toSet
    // the self-dedup over the union, restricted to pairs with exactly
    // one endpoint on each side (self emits idA < idB; reorient to
    // (new, old))
    val self = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, tau = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 3 == 0) != (b % 3 == 0) }
      .map { case (a, b) => if (a % 3 == 0) (a, b) else (b, a) }
      .toSet
    assert(cross == self)
  }

  test("tfidf plan broadcasts the vocabulary side") {
    val d = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.tfIdfTop(d, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("dedupDocLines is idempotent on random line soups") {
    val line = Gen.oneOf("nav bar", "body text here", "", "promo",
      "unique words appear", "x")
    val doc = Gen.listOfN(8, line).map(_.mkString("\n"))
    val docs = samples(doc, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = TextAnalysis.dedupDocLines(docs, "doc_id", "text")
      .select($"doc_id", $"clean_text")
    val twice = TextAnalysis.dedupDocLines(
        once.withColumnRenamed("clean_text", "text"), "doc_id", "text")
      .select($"doc_id", $"clean_text")
    assert(once.as[(Long, String)].collect().toMap ==
      twice.as[(Long, String)].collect().toMap)
    // second pass removes nothing
    assert(TextAnalysis.dedupDocLines(
        once.withColumnRenamed("clean_text", "text"), "doc_id", "text")
      .agg(sum($"n_removed")).as[Long].collect().head == 0L)
  }

  test("exciseContaminatedLines is idempotent: the survivors carry no " +
      "bench gram") {
    val bench = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val word = Gen.oneOf("the", "quick", "brown", "fox", "alpha", "beta")
    val line = Gen.listOfN(9, word).map(_.mkString(" "))
    val doc = Gen.listOfN(4, line).map(_.mkString("\n"))
    val docs = samples(doc, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = Decontamination.exciseContaminatedLines(docs, bench, "id",
      "text", "text", n = 8)
    val again = Decontamination.exciseContaminatedLines(
      once.select($"id", $"clean_text".as("text")), bench, "id",
      "text", "text", n = 8)
    assert(again.agg(sum($"n_lines_excised")).as[Long].collect().head == 0L)
  }

  test("scoreLinearHashed and importanceWeights are partitioning-" +
      "invariant (broadcast model, per-row math)") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val weights = spark.range(64).select($"id".cast("int").as("bucket"),
      (($"id" * 37L) % 201 - 100).as("weight_milli"))
    def scores(d: org.apache.spark.sql.DataFrame) =
      Scoring.scoreLinearHashed(d, "doc_id", "text", weights, 64, 10L)
        .select($"doc_id", $"logit_milli").as[(Long, Long)].collect().toMap
    assert(scores(docs) == scores(docs.repartition(7)))
    def imp(d: org.apache.spark.sql.DataFrame) =
      Scoring.importanceWeights(d, d.filter($"source" === "src0"),
          "doc_id", "text", "text", 32)
        .select($"doc_id", $"sum_target", $"sum_raw")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(imp(docs) == imp(docs.repartition(5)))
  }

  test("encodeTokens: ids round-trip through the vocab for every " +
      "in-vocabulary token; n_oov accounts for the rest") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = TextAnalysis.buildVocab(docs, "doc_id", "text", minDf = 2L)
    val idToTok = vocab.select($"vocab_id", $"token")
      .as[(Long, String)].collect().toMap
    val enc = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
      .select($"doc_id", $"token_ids", $"n_tokens", $"n_oov")
      .as[(Long, Seq[Long], Long, Long)].collect()
    val orig = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    enc.foreach { case (id, ids, n, oov) =>
      assert(ids.length == n)
      assert(ids.count(_ == -1L) == oov)
      val toks = orig(id).trim.split("\\s+", -1)
      // every non-OOV id decodes back to the exact original token
      ids.zip(toks).foreach { case (tid, tok) =>
        if (tid != -1L) assert(idToTok(tid) == tok)
      }
    }
  }

  test("exactQuantilesLong == sorted-offset selection on random " +
      "multisets (heavy ties, negatives, wide magnitudes)") {
    val gen = Gen.oneOf(Gen.chooseNum(-5L, 5L),          // tie-heavy
      Gen.chooseNum(-1000000000000L, 1000000000000L))    // wide
    val vals = samples(gen, 400)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val ps = Seq(0.01, 0.5, 0.9, 1.0)
    val out = SketchStats.exactQuantilesLong(df, "v", ps)
      .as[(Double, Long)].collect().toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val k = math.max(1L, math.ceil(p * vals.size).toLong).toInt
      assert(out(p) == sorted(k - 1), s"p=$p")
    }
  }

  test("exciseRepeatedSpans: kept words are a subsequence of the " +
      "original; kept+excised == total; no shared n-gram survives") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val docs = samples(doc, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val n = 3
    val out = Dedup.exciseRepeatedSpans(df, "doc_id", "text", n = n,
        minDf = 2L)
      .as[(Long, String, Long, Long)].collect()
    val orig = docs.toMap
    // recompute the dup-gram set the slow way
    val grams = docs.flatMap { case (id, t) =>
      t.split(" ").sliding(n).filter(_.length == n)
        .map(g => (g.mkString(" "), id)).toSeq
    }
    val dup = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .keySet
    out.foreach { case (id, clean, kept, excised) =>
      val ow = orig(id).split(" ").toSeq
      val cw = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
      assert(kept + excised == ow.size)
      assert(cw.size == kept)
      // subsequence check
      var i = 0
      cw.foreach { w =>
        i = ow.indexOf(w, i); assert(i >= 0); i += 1
      }
      // no surviving window of n consecutive KEPT-ADJACENT original
      // positions forms a dup gram — verify against the slow cover set
      val covered = ow.indices.filter { j =>
        (math.max(0, j - n + 1) to math.min(j, ow.size - n)).exists { s =>
          dup.contains(ow.slice(s, s + n).mkString(" "))
        }
      }.toSet
      assert(cw == ow.indices.filterNot(covered).map(ow))
    }
  }

  test("balancedShards: every shard total within one max weight of " +
      "any other, shard sizes within one row") {
    val w = Gen.chooseNum(0L, 10000L)
    val rows = samples(w, 500).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val k = 7
    val out = Sampling.balancedShards(rows.toDF("id", "w"), "id", "w", k)
      .as[(Long, Long, Int)].collect()
    val byShard = out.groupBy(_._3)
    assert(byShard.keySet == (0 until k).toSet)
    val sizes = byShard.values.map(_.size)
    assert(sizes.max - sizes.min <= 1)
    val totals = byShard.values.map(_.map(_._2).sum)
    val maxW = out.map(_._2).max
    assert(totals.max - totals.min <= maxW,
      s"spread ${totals.max - totals.min} > max row $maxW")
  }

  test("mixture schedule: dense, order-preserving, proportional at key boundaries") {
    val srcGen = Gen.oneOf("a", "b", "c", "d")
    val rows = samples(srcGen, 400).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val weights = Map("a" -> 300L, "b" -> 100L, "c" -> 100L, "d" -> 0L)
    val sched = Sampling.mixtureSchedule(rows.toDF("id", "source"),
        "id", "source", weights, defaultPermille = 100L, seed = "p7")
      .as[(Long, String, Long)].collect().sortBy(_._3)
    val kept = rows.count(_._2 != "d")
    assert(sched.length == kept && !sched.exists(_._2 == "d"))
    assert(sched.map(_._3).toSeq == (0L until kept.toLong))
    // per-source relative order equals the seeded-hash shuffle order
    for ((src, group) <- sched.groupBy(_._2)) {
      val inSchedule = group.sortBy(_._3).map(_._1).toSeq
      val byHash = rows.filter(_._2 == src).map(_._1)
        .map(id => id -> BigInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest((id.toString + "p7").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15), 16).toLong)
        .sortBy { case (id, h) => (h, id) }.map(_._1).toSeq
      assert(inSchedule == byHash, s"source $src order drifted")
    }
    // at every integer key boundary k the prefix holds exactly
    // min(3k, n_a) of a and min(k, n_s) of each weight-100 source
    val nBySrc = rows.groupBy(_._2).view.mapValues(_.size).toMap
    for (k <- 1 to 5) {
      val expect = Seq("a" -> math.min(3 * k, nBySrc("a")),
        "b" -> math.min(k, nBySrc("b")),
        "c" -> math.min(k, nBySrc("c"))).toMap
      val prefix = sched.take(expect.values.sum)
        .groupBy(_._2).view.mapValues(_.length).toMap
      assert(prefix == expect, s"prefix at key $k: $prefix vs $expect")
    }
  }

  test("bigram LM: ppb bounds, OOV accounting, zero OOV on self-train") {
    val textGen = Gen.listOfN(8,
      Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" "))
    val docs = samples(textGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(docs, "text")
    val scored = TextAnalysis.scoreBigramLm(docs, "doc_id", "text", lm)
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(scored.length == 120)
    scored.foreach { case (_, nBg, nOov, ppb, ppl) =>
      assert(nBg == 7L)
      assert(nOov == 0L, "self-trained corpus cannot have OOV bigrams")
      assert(ppb.exists(p => p > 0L && p <= 1000000000L),
        s"mean prob ppb out of (0, 1e9]: $ppb")
      assert(ppl.exists(p => p >= 1.0), s"perplexity below 1: $ppl")
    }
  }

  test("sft render: mask spans recover assistant contents on random " +
    "conversations; text length is the sum of rendered turns") {
    val roleGen = Gen.oneOf("system", "user", "assistant")
    val contentGen = Gen.listOfN(5, Gen.oneOf("aa", "b", "ccc", ""))
      .map(_.mkString(" "))
    val turnGen = Gen.zip(Gen.chooseNum(0L, 29L), roleGen, contentGen)
    val turns = samples(turnGen, 240).zipWithIndex
      .map { case ((cid, r, c), i) => (cid, i, r, c) }
      .toDF("conv_id", "turn_idx", "role", "content")
    val byConv = turns.as[(Long, Int, String, String)].collect()
      .groupBy(_._1)
    val out = SftPrep.renderConversations(turns, "conv_id", "turn_idx",
        "role", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == byConv.keySet)
    out.foreach { case (cid, row) =>
      val text = row.getString(1)
      val sorted = byConv(cid).sortBy(_._2)
      val expectedLen = sorted.map { case (_, _, role, c) =>
        s"<|$role|>\n".length + c.length + "\n<|end|>\n".length }.sum
      assert(text.length == expectedLen)
      val spans = row.getSeq[org.apache.spark.sql.Row](4)
      val assistants = sorted.filter(_._3 == "assistant")
      assert(spans.length == assistants.length)
      spans.zip(assistants).foreach { case (sp, (_, ti, _, c)) =>
        assert(sp.getInt(0) == ti)
        val s = sp.getLong(1).toInt; val e = sp.getLong(2).toInt
        assert(s >= 1 && e <= text.length + 1 && s <= e)
        assert(text.substring(s - 1, e - 1) == c)
      }
      assert(row.getLong(5) == assistants.map(_._4.length).sum.toLong)
    }
  }

  test("context budget: kept droppables are a suffix and fit the " +
    "budget with the pinned total, for random conversations") {
    val roleGen = Gen.frequency(1 -> Gen.const("system"),
      4 -> Gen.oneOf("user", "assistant"))
    val contentGen = Gen.chooseNum(0, 40)
      .map(n => Seq.fill(n)("w").mkString(" "))
    val turnGen = Gen.zip(Gen.chooseNum(0L, 19L), roleGen, contentGen)
    val turns = samples(turnGen, 200).zipWithIndex
      .map { case ((cid, r, c), i) => (cid, i, r, c) }
      .toDF("conv_id", "turn_idx", "role", "content")
    val budget = 90L
    val rows = SftPrep.fitContextBudget(turns, "conv_id", "turn_idx",
        "role", "content", budget)
      .select($"conv_id", $"turn_idx", $"role", $"n_tokens", $"kept")
      .as[(Long, Int, String, Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (_, convRows) =>
      val ordered = convRows.sortBy(_._2)
      // pinned always kept
      ordered.filter(_._3 == "system").foreach(t => assert(t._5))
      // droppable kept-set is a suffix of the droppables
      val droppables = ordered.filter(_._3 != "system")
      val keptFlags = droppables.map(_._5)
      assert(!keptFlags.zip(keptFlags.drop(1))
        .exists { case (a, b) => a && !b },
        s"kept droppables not a suffix: ${keptFlags.mkString(",")}")
      // if any droppable survived, the kept total fits the budget
      val pinTotal = ordered.filter(_._3 == "system").map(_._4).sum
      val keptDrop = droppables.filter(_._5).map(_._4).sum
      if (droppables.exists(_._5))
        assert(pinTotal + keptDrop <= budget,
          s"kept total ${pinTotal + keptDrop} over budget $budget")
    }
  }

  test("preference pairs: chosen is the max-score min-id, rejected the " +
    "min-score min-id, margin honored, for random groups") {
    val candGen = Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 9L))
    val cands = samples(candGen, 300).zipWithIndex
      .map { case ((g, sc), i) => (g, i.toLong, sc) }
      .toDF("g", "id", "score")
    val local = cands.as[(Long, Long, Long)].collect().groupBy(_._1)
    val minMargin = 3L
    val pairs = Scoring.preferencePairs(cands, "g", "id", "score",
        minMargin)
      .select($"g", $"chosen_id", $"rejected_id", $"score_margin")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    local.foreach { case (g, rows) =>
      val maxS = rows.map(_._3).max; val minS = rows.map(_._3).min
      val chosen = rows.filter(_._3 == maxS).map(_._2).min
      val rejected = rows.filter(_._3 == minS).map(_._2).min
      if (chosen != rejected && maxS - minS >= minMargin) {
        assert(pairs(g) == ((g, chosen, rejected, maxS - minS)))
      } else assert(!pairs.contains(g))
    }
  }

  test("unigram Viterbi == brute-force enumeration over all " +
    "segmentations on random words and vocabularies") {
    // small alphabet so vocab pieces actually match; words ≤ 8 chars
    // keep the 2^7 composition enumeration cheap
    val pieceGen = for {
      n <- Gen.chooseNum(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen = for {
      ps <- Gen.listOfN(12, pieceGen)
      counts <- Gen.listOfN(12, Gen.chooseNum(1L, 500L))
    } yield ps.distinct.zip(counts)
    val wordGen = for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    val vocab = samples(vocabGen, 1).head
    val words = samples(wordGen, 120).distinct

    val total = vocab.map(_._2).sum
    val qTot = math.floor(1000.0 * math.log(total.toDouble)).toLong
    val q = vocab.map { case (p, c) =>
      p -> (math.floor(1000.0 * math.log(c.toDouble)).toLong - qTot)
    }.toMap
    // brute force: all compositions of the word into vocab pieces;
    // best by (score desc, n_pieces asc) — the DP must agree on BOTH
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val h = w.substring(0, l)
        if (q.contains(h)) allSegs(w.substring(l)).map(h +: _)
        else Seq.empty
      }
    val out = TextAnalysis.unigramViterbiSegment(
        words.toDF("word"), "word",
        vocab.toDF("piece", "cnt"))
      .select($"word", $"pieces", $"n_pieces", $"viterbi_q", $"is_unk")
      .as[(String, Seq[String], Long, Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    words.foreach { w =>
      val segs = allSegs(w)
      val (_, _, np, vq, unk) = out(w)
      if (segs.isEmpty) {
        assert(unk && vq.isEmpty && np == 0L, s"word $w: expected unk")
      } else {
        val scored = segs.map(s => (s.map(q).sum, s.length))
        val best = scored.maxBy { case (sc, n) => (sc, -n) }
        assert(!unk, s"word $w: unexpectedly unk")
        assert(vq.contains(best._1),
          s"word $w: score ${vq} != brute-force ${best._1}")
        assert(np == best._2.toLong,
          s"word $w: n_pieces $np != brute-force ${best._2}")
        // the emitted pieces must BE a valid best segmentation
        assert(out(w)._2.mkString("") == w)
        assert(out(w)._2.forall(q.contains))
      }
    }
  }

  test("triangleCounts == brute force on random graphs; corner sum " +
      "divisible by 3") {
    val edges = samples(
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)), 400)
    val df = edges.toDF("src", "dst")
    val out = GraphOps.triangleCounts(df)
      .as[(Long, Long)].collect().toMap
    // brute force on the canonical simple graph
    val simple = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = simple.flatMap(e => Set(e._1, e._2))
    val byNode = nodes.map { v =>
      val nb = simple.collect {
        case (a, b) if a == v => b
        case (a, b) if b == v => a
      }
      v -> nb.toSeq.combinations(2).count {
        case Seq(x, y) =>
          simple((math.min(x, y), math.max(x, y)))
        case _ => false
      }.toLong
    }.toMap
    assert(out == byNode)
    assert(out.values.sum % 3 == 0)
  }

  test("mergeIntervals: islands are disjoint, ordered, and cover " +
      "exactly the interval union for random inputs") {
    val iv = samples(Gen.zip(Gen.chooseNum(1L, 4L),
      Gen.chooseNum(0L, 300L), Gen.chooseNum(1L, 40L)), 250)
      .map { case (k, s, len) => (k, s, s + len) }
    val df = iv.toDF("k", "s", "e")
    val out = TemporalJoins.mergeIntervals(df, "k", "s", "e")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq)
      .toMap
    for ((k, islands) <- out) {
      // strictly separated (touching would have merged), island_seq
      // dense from 1, n_merged sums to the key's row count
      islands.sliding(2).foreach {
        case Seq(a, b) => assert(b._1 > a._2,
          s"key $k islands $a, $b must be separated by a real gap")
        case _ => ()
      }
      val expectedCovered = iv.filter(_._1 == k)
        .flatMap { case (_, s, e) => s until e }.toSet
      val gotCovered = islands
        .flatMap { case (s, e, _) => s until e }.toSet
      assert(gotCovered == expectedCovered, s"key $k coverage")
      assert(islands.map(_._3).sum == iv.count(_._1 == k).toLong)
    }
  }

  test("quantileNormalize: normalized values come from the global " +
      "multiset and group ranks are a dense 1..n") {
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(0L, 100L)), 120)
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
    val df = rows.toDF("id", "g", "v")
    val out = Scoring.quantileNormalize(df, "g", "v", "id")
      .select($"id", $"g", $"group_rank", $"group_n", $"normalized")
      .as[(Long, String, Long, Long, Long)].collect()
    val globalVals = rows.map(_._3).toSet
    out.foreach { case (_, _, _, _, nv) =>
      assert(globalVals.contains(nv))
    }
    out.groupBy(_._2).foreach { case (g, rs) =>
      val n = rows.count(_._2 == g).toLong
      assert(rs.forall(_._4 == n))
      assert(rs.map(_._3).sorted.toSeq == (1L to n))
      // monotone: higher group rank never maps to a smaller value
      val byRank = rs.sortBy(_._3).map(_._5)
      assert(byRank.sliding(2).forall {
        case Array(x, y) => x <= y; case _ => true
      })
    }
  }

  test("rendezvousAssign: deterministic, total, and stable under " +
      "shard-list order for random keys") {
    val keys = samples(Gen.chooseNum(0L, 100000L), 200).distinct
    val df = keys.toDF("k")
    val shards = Seq("sA", "sB", "sC", "sD", "sE")
    val a1 = Placement.rendezvousAssign(df, "k", shards, "p")
      .as[(Long, String)].collect().toMap
    assert(a1.size == keys.size)
    // shard-list ORDER is irrelevant (argmax over a set)
    val a2 = Placement
      .rendezvousAssign(df.repartition(5), "k", shards.reverse, "p")
      .as[(Long, String)].collect().toMap
    assert(a2 == a1)
  }
}
