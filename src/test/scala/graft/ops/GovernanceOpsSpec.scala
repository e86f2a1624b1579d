package graft.ops

import graft.SparkSpec
import graft.functions.Sketch
import org.apache.spark.unsafe.types.UTF8String

/** Release-governance + corpus-monitoring operators: seeded-noise
  * count release, histogram drift report, memorization/novelty scan,
  * tokenizer fertility card. */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  private def hv60(s: String): Long =
    Sketch.md5_60(UTF8String.fromString(s))

  test("seededNoiseRelease: deterministic md5 noise, k gate, clamp") {
    // groups: a=3 rows, b=1 row (suppressed at k=2)
    val df = Seq("a", "a", "a", "b").toDF("g")
    val out = Scoring.seededNoiseRelease(df, Seq("g"), seed = "t1",
        bound = 5, k = 2L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Boolean]("released"))
    assert(!out("b").getAs[Boolean]("released"))
    // noise is the md5-60 of key||seed mod (2b+1) shifted — replayable
    def expected(g: String): Long = hv60(g + "t1") % 11 - 5
    assert(out("a").getAs[Long]("noise") == expected("a"))
    assert(out("b").getAs[Long]("noise") == expected("b"))
    assert(out.values.forall { r =>
      val n = r.getAs[Long]("noise"); n >= -5 && n <= 5 })
    // released_n clamps at zero (count of 1 + worst-case -5 noise)
    assert(out.values.forall(_.getAs[Long]("released_n") >= 0L))
    assert(out("a").getAs[Long]("released_n") ==
      math.max(3L + expected("a"), 0L))
    // rerun is byte-identical (the audit-trail property)
    val again = Scoring.seededNoiseRelease(df, Seq("g"), seed = "t1",
      bound = 5, k = 2L).collect().toSet
    assert(again == out.values.toSet)
    // a different seed moves the noise (no accidental seed ignore)
    val other = Scoring.seededNoiseRelease(df, Seq("g"), seed = "t2",
        bound = 5, k = 2L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("noise")).toMap
    assert(other("a") == hv60("a" + "t2") % 11 - 5)
  }

  test("histogramDrift: counts, integer pm shares, one-sided buckets") {
    // a: values 0,1,199 → buckets 0(×2),1 ; b: 250,260 → bucket 2 only
    val a = Seq(0L, 1L, 199L).toDF("v")
    val b = Seq(250L, 260L).toDF("v")
    val out = Scoring.histogramDrift(a, b, "v", bucketWidth = 100L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getAs[Long]("n_a") == 2 && out(0L).getAs[Long]("n_b") == 0)
    assert(out(1L).getAs[Long]("n_a") == 1 && out(1L).getAs[Long]("n_b") == 0)
    assert(out(2L).getAs[Long]("n_a") == 0 && out(2L).getAs[Long]("n_b") == 2)
    // shares: a → 2/3 = 666pm, 1/3 = 333pm; b → 2/2 = 1000pm
    assert(out(0L).getAs[Long]("share_a_pm") == 666L)
    assert(out(1L).getAs[Long]("share_a_pm") == 333L)
    assert(out(2L).getAs[Long]("share_b_pm") == 1000L)
    assert(out(2L).getAs[Long]("abs_gap_pm") == 1000L)
    // TV distance in pm = sum(gap)/2 = (666+333+1000)/2
    assert(out.values.map(_.getAs[Long]("abs_gap_pm")).sum == 1999L)
  }

  test("noveltyScan: copied text scores 0 novel, fresh text 1e6, " +
      "short text null") {
    val corpus = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, "a b c d e f"),      // every 3-gram seen
      (2L, "x y z w v u"),      // every 3-gram novel
      (3L, "a b"),              // < n words → no grams
    ).toDF("doc_id", "text")
    val out = Decontamination.noveltyScan(cands, corpus, "doc_id",
        "text", "text", n = 3, noveltyFloorPpm = 500000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_grams") == 4 &&
      out(1L).getAs[Long]("n_seen") == 4)
    assert(out(1L).getAs[Long]("novel_ppm") == 0L)
    assert(out(1L).getAs[Boolean]("memorized"))
    assert(out(2L).getAs[Long]("n_seen") == 0)
    assert(out(2L).getAs[Long]("novel_ppm") == 1000000L)
    assert(!out(2L).getAs[Boolean]("memorized"))
    assert(out(3L).getAs[Int]("n_grams") == 0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("novel_ppm")))
    assert(out(3L).isNullAt(out(3L).fieldIndex("memorized")))
  }

  test("fertilityReport: hand-computed counts and milli ratios") {
    // "ab cd." → words=2, pieces=3 (ab, cd, .), chars=6
    val df = Seq(("en", "ab cd."), ("en", "e f"))
      .toDF("lang", "text")
    val Array(r) = TextAnalysis.fertilityReport(df, "lang", "text")
      .collect()
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("n_docs") == 2)
    assert(r.getAs[Long]("n_words") == 4)   // 2 + 2
    assert(r.getAs[Long]("n_pieces") == 5)  // 3 + 2
    assert(r.getAs[Long]("n_chars") == 9)   // 6 + 3
    assert(r.getAs[Long]("pieces_per_word_milli") == 5000 / 4)
    assert(r.getAs[Long]("chars_per_piece_milli") == 9000 / 5)
    assert(r.getAs[Long]("chars_per_word_milli") == 9000 / 4)
  }

  test("deletionPropagation: per-table purge counts, duplicate " +
      "tombstones collapse, unmatched tombstones are inert") {
    val t1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "d"))
      .toDF("uid", "x")
    val t2 = Seq((2L, 7L), (4L, 8L)).toDF("uid", "y")
    // tombstone 1 twice (dedup), 2 once, 99 matches nothing
    val tomb = Seq(1L, 1L, 2L, 99L).toDF("subject")
    val out = Scoring.deletionPropagation(
        Seq(("t1", t1, "uid"), ("t2", t2, "uid")), tomb, "subject")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("t1") == ((4L, 3L, 1L))) // uid 1 (twice) + uid 2
    assert(out("t2") == ((2L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Scoring.deletionPropagation(
        Seq(("t1", t1, "uid"), ("t1", t2, "uid")), tomb, "subject")
    }
  }

  test("Expectations.validate counts every violation class on a " +
      "planted dirty frame; clean frame passes all") {
    import graft.ops.Expectations._
    val dim = Seq(1L, 2L).toDF("k")
    val dirty = Seq(
      // (id, key, price, status, fk)
      (1L, 10L, Some(50L), Some("F"), Some(1L)),   // clean
      (2L, 11L, Some(-5L), Some("O"), Some(2L)),   // range low
      (3L, 11L, Some(999L), Some("X"), Some(9L)),  // dup key + bad
                                                   // status + orphan fk
      (4L, 12L, Option.empty[Long], Option.empty[String],
        Option.empty[Long]),                        // nulls everywhere
    ).toDF("id", "key", "price", "status", "fk")
    val out = validate(dirty, Seq(
        NotNull("status"),
        InRange("price", 0L, 100L),
        Matches("status", "[FOP]"),
        Unique(Seq("key")),
        ForeignKey("fk", dim, "k")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("not_null:status") == ((4L, 1L, false)))
    // range: -5 out, 999 out, null violates → 3
    assert(out("in_range:price") == ((4L, 3L, false)))
    // matches: 'X' and null violate → 2
    assert(out("matches:status") == ((4L, 2L, false)))
    // unique: key 11 twice → both rows count → 2
    assert(out("unique:key") == ((4L, 2L, false)))
    // fk: 9 orphaned; NULL fk is not an orphan (NotNull's job) → 1
    assert(out("foreign_key:fk") == ((4L, 1L, false)))
    val clean = validate(dirty.filter($"id" === 1L), Seq(
        NotNull("status"), Unique(Seq("key")),
        ForeignKey("fk", dim, "k")))
      .as[(String, Long, Long, Boolean)].collect()
    assert(clean.forall(r => r._3 == 0L && r._4))
    intercept[IllegalArgumentException] { validate(dirty, Seq.empty) }
  }

  test("deletionPropagation plan: one union job, broadcast tombstones, " +
      "map-side partials") {
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = Scoring.deletionPropagation(
        Seq(("e1", ev, "user_id"), ("e2", ev, "user_id")),
        ev.select($"user_id").filter($"user_id" % 5 === 0), "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("partial"), plan)
  }
}
