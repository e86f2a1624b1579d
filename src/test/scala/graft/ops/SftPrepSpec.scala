package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SFT data prep: chat-template rendering with loss-mask offsets, and
  * context-budget truncation. */
class SftPrepSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0, "system", "be helpful"),
    (1L, 1, "user", "hi there"),
    (1L, 2, "assistant", "hello friend"),
    (1L, 3, "user", "bye"),
    (1L, 4, "assistant", "goodbye"),
    (2L, 0, "user", "only a question"),
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("renderConversations: text is the turn-ordered template and " +
    "mask spans point exactly at assistant content") {
    val out = SftPrep.renderConversations(turns, "conv_id", "turn_idx",
        "role", "content")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    val text = r1.getString(1)
    val expected =
      "<|system|>\nbe helpful\n<|end|>\n" +
        "<|user|>\nhi there\n<|end|>\n" +
        "<|assistant|>\nhello friend\n<|end|>\n" +
        "<|user|>\nbye\n<|end|>\n" +
        "<|assistant|>\ngoodbye\n<|end|>\n"
    assert(text == expected)
    assert(r1.getLong(2) == 5L)  // n_turns
    assert(r1.getLong(3) == 2L)  // n_masked_turns
    val spans = r1.getSeq[org.apache.spark.sql.Row](4)
    assert(spans.map(_.getInt(0)) == Seq(2, 4))
    // 1-based [start, end): substring(start, len) must recover the content
    spans.foreach { sp =>
      val s = sp.getLong(1).toInt; val e = sp.getLong(2).toInt
      val content = text.substring(s - 1, e - 1)
      assert(content == (if (sp.getInt(0) == 2) "hello friend"
        else "goodbye"))
    }
    assert(r1.getLong(5) == ("hello friend".length + "goodbye".length).toLong)

    // conversation with no assistant turn keeps its row, empty spans
    val r2 = out(2L)
    assert(r2.getString(1) == "<|user|>\nonly a question\n<|end|>\n")
    assert(r2.getSeq[org.apache.spark.sql.Row](4).isEmpty)
    assert(r2.getLong(5) == 0L)
  }

  test("renderConversations: null content renders as empty, span is " +
    "zero-width") {
    val t = Seq((9L, 0, "assistant", null: String))
      .toDF("conv_id", "turn_idx", "role", "content")
    val r = SftPrep.renderConversations(t, "conv_id", "turn_idx",
      "role", "content").collect().head
    assert(r.getString(1) == "<|assistant|>\n\n<|end|>\n")
    val sp = r.getSeq[org.apache.spark.sql.Row](4).head
    assert(sp.getLong(1) == sp.getLong(2)) // empty content interval
  }

  test("fitContextBudget: system pinned, oldest droppable turns drop " +
    "first, suffix property holds") {
    // tokens: system 2+3=5, each other turn listed below
    val t = Seq(
      (1L, 0, "system", "a b"),          // 5, pinned
      (1L, 1, "user", "w x y z"),        // 7
      (1L, 2, "assistant", "a b c"),     // 6
      (1L, 3, "user", "q"),              // 4
      (1L, 4, "assistant", "r s"),       // 5
    ).toDF("conv_id", "turn_idx", "role", "content")
    // budget 21: suffix sums (droppables, from the end): t4=5, t3=9,
    // t2=15, t1=22; +pin 5 → t1 busts (27 > 21), t2..t4 fit (20 ≤ 21)
    val kept = SftPrep.fitContextBudget(t, "conv_id", "turn_idx",
        "role", "content", budgetTokens = 21L)
      .select($"turn_idx", $"kept").as[(Int, Boolean)].collect().toMap
    assert(kept == Map(0 -> true, 1 -> false, 2 -> true, 3 -> true,
      4 -> true))
  }

  test("fitContextBudget: an oversized late turn drops itself and " +
    "everything older, but not newer turns") {
    val big = ("w " * 200).trim
    val t = Seq(
      (1L, 0, "user", "a"),      // 4
      (1L, 1, "user", big),      // 203
      (1L, 2, "user", "b c"),    // 5
    ).toDF("conv_id", "turn_idx", "role", "content")
    val kept = SftPrep.fitContextBudget(t, "conv_id", "turn_idx",
        "role", "content", budgetTokens = 50L)
      .select($"turn_idx", $"kept").as[(Int, Boolean)].collect().toMap
    assert(kept == Map(0 -> false, 1 -> false, 2 -> true))
  }

  test("gopherRules: per-rule flags fire on the engineered violations") {
    val good = (Seq.fill(10)("the quick brown fox and that dog have " +
      "been with us") :+ "of it").mkString(" ") // 91 words, clean prose
    val docs = Seq(
      (1L, good),
      (2L, "short text only"),                    // word count busts
      (3L, ("# " * 60).trim),                     // symbol ratio + alpha bust
      (4L, (1 to 60).map(i => s"- item $i").mkString("\n")), // bullets
    ).toDF("id", "text")
    val out = docs.select($"id",
        TextAnalysis.gopherRules($"text").as("g"))
      .select($"id", $"g.r_word_count", $"g.r_symbol_ratio",
        $"g.r_bullet_lines", $"g.r_alpha_words", $"g.passes_gopher")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    assert(out(1L) == ((true, true, true, true, true)))
    assert(out(2L)._1 == false)          // < 50 words
    assert(out(2L)._5 == false)
    assert(out(3L)._2 == false)          // '#' per word ratio 1 > 0.1
    assert(out(3L)._4 == false)          // no alphabetic words
    assert(out(4L)._3 == false)          // every line is a bullet
  }

  test("gopherRules: ellipsis line ratio and required stopwords") {
    val ellip = (1 to 10).map(i =>
      if (i <= 4) s"line $i trailing..." else s"line $i is fine")
      .mkString("\n")
    val r = Seq((1L, ellip)).toDF("id", "text")
      .select(TextAnalysis.gopherRules($"text").as("g"))
      .select($"g.ellipsis_line_ratio", $"g.r_ellipsis_lines",
        $"g.n_required_stopwords")
      .collect().head
    assert(math.abs(r.getDouble(0) - 0.4) < 1e-12)
    assert(!r.getBoolean(1)) // 0.4 > 0.3
    assert(r.getInt(2) == 0) // none of the 8 required stopwords appear
  }

  test("wordPiece: weighted-substring vocab and greedy longest-match " +
    "segmentation, including the unsegmentable walk") {
    val docs = Seq((1L, "ab ab abc xy")).toDF("doc_id", "text")
    val vocab = TextAnalysis.learnWordPieceVocab(docs, "text",
      maxPieceLen = 3, maxVocab = 8)
    val v = vocab.select($"piece", $"cnt", $"piece_id")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    // counts: a/ab/##b weigh 3 (ab twice + abc), the rest 1; rank by
    // (cnt desc, piece asc); top-8 excludes 'xy'
    assert(v.map(_._1).toSeq == Seq("##b", "a", "ab", "##bc", "##c",
      "##y", "abc", "x"))
    assert(v.take(3).forall(_._2 == 3L))
    val words = Seq("ab", "abc", "xy", "zq").toDF("word")
    val seg = TextAnalysis.wordPieceSegment(words, "word", vocab)
      .select($"word", concat_ws(" ", $"pieces").as("ps"), $"n_pieces",
        $"is_unk", $"fail_pos")
      .as[(String, String, Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(seg("ab") == (("ab", "ab", 1L, false, None)))
    assert(seg("abc") == (("abc", "abc", 1L, false, None)))
    // 'xy' fell out of the vocab → greedy takes 'x' then '##y'
    assert(seg("xy") == (("xy", "x ##y", 2L, false, None)))
    // no piece matches at position 1 → unsegmentable, empty pieces
    assert(seg("zq") == (("zq", "", 0L, true, Some(1L))))
  }

  test("unigram: seed vocab ranks plain substrings; Viterbi picks the " +
    "max-likelihood split with deterministic tie-breaks; usage counts " +
    "weight by word frequency") {
    val docs = Seq((1L, "ab ab ab cd zz")).toDF("doc_id", "text")
    val vocab = TextAnalysis.learnUnigramSeedVocab(docs, "text",
      maxPieceLen = 2, maxVocab = 6)
    val v = vocab.select($"piece", $"cnt", $"piece_id")
      .as[(String, Long, Long)].collect().sortBy(_._3)
    // substrings of ab×3: a/b/ab each 3; cd: c/d/cd each 1; zz: z 2,
    // zz 1 — rank (cnt desc, piece asc), top-6 cuts d/z/zz
    assert(v.map(_._1).toSeq == Seq("a", "ab", "b", "z", "c", "cd"))
    assert(v.map(_._2).toSeq == Seq(3L, 3L, 3L, 2L, 1L, 1L))

    val words = Seq("ab", "abab", "cd", "ax", "").toDF("word")
    val seg = TextAnalysis.unigramViterbiSegment(words, "word", vocab)
      .select($"word", concat_ws(" ", $"pieces").as("ps"), $"n_pieces",
        $"viterbi_q", $"is_unk")
      .as[(String, String, Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // total = 3+3+3+2+1+1 = 13; q(p) = floor(1000 ln cnt) - floor(1000 ln 13)
    val qTot = math.floor(1000 * math.log(13.0)).toLong
    def q(c: Long) = math.floor(1000 * math.log(c.toDouble)).toLong - qTot
    // "ab" as one piece (q(3)) beats "a b" (2·q(3)): fewer, likelier
    assert(seg("ab") == (("ab", "ab", 1L, Some(q(3)), false)))
    // "abab" → "ab ab" (2 pieces) beats any 1-char mix (3–4 pieces)
    assert(seg("abab") == (("abab", "ab ab", 2L, Some(2 * q(3)), false)))
    assert(seg("cd") == (("cd", "cd", 1L, Some(q(1)), false)))
    // 'x' has no piece → unsegmentable
    assert(seg("ax") == (("ax", "", 0L, None, true)))
    assert(seg("") == (("", "", 0L, Some(0L), false)))

    val usage = TextAnalysis.unigramPieceUsage(docs, "text", vocab)
      .as[(String, Long)].collect().toMap
    // ab×3 → piece ab used 3; cd×1 → cd 1; zz → "z z" (z survived the
    // cut at cnt 2) → z used twice in one word × freq 1 = 2; pieces
    // a/b/c never chosen — the prune set
    assert(usage == Map("ab" -> 3L, "cd" -> 1L, "z" -> 2L))
  }

  test("unigram: tie-break prefers fewer pieces, then the earlier " +
    "split point") {
    // craft equal counts so "xy" (1 piece, q(c)) vs "x y" (2 pieces)
    // differ, and two 2-piece splits of "xyz" tie on score: vocab has
    // xy, z, x, yz all cnt 1 → "xy z" and "x yz" both score 2·q(1);
    // split-asc tie-break keeps the longer FINAL piece: bp for pos 3
    // scans j ascending → j=1 ("x"+"yz") wins over j=2 ("xy"+"z")
    val vocab = Seq(("xy", 1L), ("z", 1L), ("x", 1L), ("yz", 1L))
      .toDF("piece", "cnt")
    val seg = TextAnalysis.unigramViterbiSegment(
        Seq("xyz").toDF("word"), "word", vocab)
      .select(concat_ws(" ", $"pieces")).as[String].collect().head
    assert(seg == "x yz")
  }

  test("codeQualityFlags: each Stack/StarCoder rule fires on its " +
    "engineered violation") {
    val docs = Seq(
      (1L, "def f(x):\n  return x + 1\n"),              // clean
      (2L, "short\n" + ("y" * 1500)),                    // max line
      (3L, "// AUTO-GENERATED, do not edit\ncode here"), // marker (ci)
      (4L, "data = \"" + ("Ab3+/" * 20) + "\""),         // 100-char blob
      (5L, "()[]{};;;\n!!!###\n@@@$$$"),                 // alnum < 0.25
    ).toDF("id", "text")
    val out = docs.select($"id",
        TextAnalysis.codeQualityFlags($"text").as("c"))
      .select($"id", $"c.r_max_line", $"c.r_not_autogen",
        $"c.r_no_data_blob", $"c.r_alnum_frac", $"c.passes_code_filters")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)))
    assert(!out(2L)._2)
    assert(!out(3L)._3)
    assert(!out(4L)._4)
    assert(!out(5L)._5)
    assert(Seq(2L, 3L, 4L, 5L).forall(i => !out(i)._6))
  }

  test("validateJsonRecords: every error class fires on its shape, " +
    "present-null keys count as present") {
    val rows = Seq(
      (1L, """{"name":"t","args":{"q":1},"id":7}"""),  // ok
      (2L, """{"name":"t","args":null}"""),            // id missing; null present
      (3L, """[1,2]"""),                               // not_object
      (4L, """{"name": broken"""),                     // not_json
      (5L, null: String),                              // null → not_json
    ).toDF("id", "payload")
    val out = StructuredData.validateJsonRecords(rows, "id", "payload",
        Seq("name", "args", "id"))
      .select($"id", $"error_class", $"n_keys", $"n_missing",
        $"valid_record")
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "ok", 3L, 0L, true)))
    assert(out(2L) == ((2L, "missing_fields", 2L, 1L, false)))
    assert(out(3L) == ((3L, "not_object", 0L, 3L, false)))
    assert(out(4L) == ((4L, "not_json", 0L, 3L, false)))
    assert(out(5L) == ((5L, "not_json", 0L, 3L, false)))
  }

  test("preferencePairs: best-vs-worst with lowest-id tie-breaks, " +
    "margin filter, singleton groups drop") {
    val cands = Seq(
      (1L, 10L, 7L), (1L, 11L, 3L), (1L, 12L, 7L),  // tie at best → id 10
      (2L, 20L, 5L), (2L, 21L, 5L),                 // all tied → no pair
      (3L, 30L, 9L), (3L, 31L, 7L),                 // margin 2 < 3 → drop
      (4L, 40L, 4L),                                // singleton → no pair
    ).toDF("g", "id", "score")
    val out = Scoring.preferencePairs(cands, "g", "id", "score",
        minMargin = 3L)
      .select($"g", $"chosen_id", $"rejected_id", $"score_margin")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 10L, 11L, 4L)))
  }
}
