package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cleanup, Sft, Similarity}

/** SFT/preference assembly, mojibake repair, and bitext margin mining. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ preference pairs

  private lazy val responses = Seq(
    // prompt 10: clear best (tie on 9 → min id 2) and worst
    (10L, 1L, "r1", 5L), (10L, 2L, "r2", 9L), (10L, 3L, "r3", 9L),
    (10L, 4L, "r4", 1L),
    // prompt 20: single response — no pair
    (20L, 5L, "r5", 7L),
    // prompt 30: all scores equal — margin 0, filtered at minMargin 1
    (30L, 6L, "r6", 4L), (30L, 7L, "r7", 4L)
  ).toDF("prompt_id", "rid", "resp", "score")

  test("preferencePairs picks best-vs-worst with min-id tie-break") {
    val out = Sft.preferencePairs(responses, "prompt_id", "rid", "resp",
      col("score"), minMargin = 1L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("prompt_id") == 10L)
    assert(r.getAs[Long]("chosen_id") == 2L) // 9-tie breaks to min rid
    assert(r.getAs[String]("chosen") == "r2")
    assert(r.getAs[Long]("rejected_id") == 4L)
    assert(r.getAs[String]("rejected") == "r4")
    assert(r.getAs[Long]("margin") == 8L)
    assert(r.getAs[Long]("n_responses") == 4L)
  }

  test("preferencePairs drops null-scored responses before ranking") {
    val withNull = responses.unionByName(
      Seq((10L, 9L, "rx", null.asInstanceOf[java.lang.Long]))
        .toDF("prompt_id", "rid", "resp", "score"))
    val out = Sft.preferencePairs(withNull, "prompt_id", "rid", "resp",
      col("score"), minMargin = 1L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_responses") == 4L)
  }

  test("preferencePairs at minMargin 0 never emits a chosen==rejected pair") {
    // prompt 30's two responses tie: argmax-on-(score,-rid) and
    // argmin-on-(score,rid) both resolve to rid 6, which margin>=0 alone
    // would pass through as a degenerate self-pair
    val out = Sft.preferencePairs(responses, "prompt_id", "rid", "resp",
      col("score"), minMargin = 0L).collect()
    assert(out.forall(r => r.getAs[Long]("chosen_id") != r.getAs[Long]("rejected_id")))
    assert(out.map(_.getAs[Long]("prompt_id")).toSet == Set(10L),
      "all-tie prompt 30 and singleton prompt 20 emit nothing")
  }

  test("preferencePairs margin threshold is inclusive") {
    val out = Sft.preferencePairs(responses, "prompt_id", "rid", "resp",
      col("score"), minMargin = 8L)
    assert(out.count() == 1)
    assert(Sft.preferencePairs(responses, "prompt_id", "rid", "resp",
      col("score"), minMargin = 9L).count() == 0)
  }

  // --------------------------------------------------------- chat render

  private lazy val turns = Seq(
    (1L, 0L, "user", "hi"), (1L, 1L, "assistant", "yo"),
    (1L, 2L, "user", "ok"), (1L, 3L, "assistant", "bye"),
    // conv 2: no assistant turn — contributes no rows
    (2L, 0L, "user", "ping"), (2L, 1L, "system", "pong")
  ).toDF("conv_id", "ord", "role", "content")

  test("chatRender renders turns in order and spans slice to content") {
    val out = Sft.chatRender(turns, "conv_id", "ord", "role", "content")
      .orderBy("conv_id", "span_idx").collect()
    assert(out.length == 2) // conv 1's two assistant turns; conv 2 drops
    val text = out.head.getAs[String]("text")
    assert(text ==
      "<|user|>hi<|end|><|assistant|>yo<|end|>" +
        "<|user|>ok<|end|><|assistant|>bye<|end|>")
    assert(out.head.getAs[Long]("text_len") == text.length.toLong)
    assert(out.head.getAs[Long]("n_turns") == 4L)
    // every span must slice the rendered string to the raw turn content
    val sliced = out.map { r =>
      r.getAs[String]("text").substring(
        r.getAs[Long]("span_start").toInt, r.getAs[Long]("span_end").toInt)
    }.toSeq
    assert(sliced == Seq("yo", "bye"))
    assert(out.map(_.getAs[Long]("span_idx")).toSeq == Seq(1L, 2L))
  }

  test("chatRender turn order follows ord, not input row order") {
    val shuffled = Seq(
      (1L, 1L, "assistant", "b"), (1L, 0L, "user", "a")
    ).toDF("conv_id", "ord", "role", "content")
    val out = Sft.chatRender(shuffled, "conv_id", "ord", "role", "content")
      .collect()
    assert(out.head.getAs[String]("text") ==
      "<|user|>a<|end|><|assistant|>b<|end|>")
  }

  // ------------------------------------------------------ mojibake repair

  test("mojibakeFix undoes a real UTF-8-as-CP1252 mis-decode round trip") {
    val original = "café – “l’été”… ça"
    // the actual defect: UTF-8 bytes decoded as windows-1252
    val corrupt = new String(original.getBytes("UTF-8"), "windows-1252")
    assert(corrupt != original)
    val df = Seq((corrupt, original)).toDF("bad", "want")
    val row = df.select(
      Cleanup.mojibakeFix(col("bad")).as("fixed"),
      Cleanup.mojibakeCount(col("bad")).as("n_bad"),
      Cleanup.mojibakeCount(Cleanup.mojibakeFix(col("bad"))).as("n_after"),
      col("want")).head()
    assert(row.getAs[String]("fixed") == original)
    // é ×3, – ×1, “ ×1, ’ ×1, ” ×1, … ×1, ç ×1 = 9 sequences
    assert(row.getAs[Long]("n_bad") == 9L)
    assert(row.getAs[Long]("n_after") == 0L)
  }

  test("mojibakeFix leaves clean text alone") {
    val clean = "plain ascii text, nothing to repair"
    val row = Seq(clean).toDF("t").select(
      Cleanup.mojibakeFix(col("t")).as("fixed"),
      Cleanup.mojibakeCount(col("t")).as("n")).head()
    assert(row.getAs[String]("fixed") == clean)
    assert(row.getAs[Long]("n") == 0L)
  }

  // ---------------------------------------------- training-objective prep

  private lazy val objDocs = Seq(
    (0L, "alpha bravo charlie delta echo foxtrot golf hotel"),
    (1L, "one two three"),
    (2L, "solo")
  ).toDF("doc_id", "text")

  test("fimTransform: prefix+middle+suffix reassemble the original text") {
    val out = graft.operators.Corpus
      .fimTransform(objDocs, "doc_id", "text", ratePct = 100)
      .collect()
    assert(out.forall(_.getAs[Boolean]("fim")))
    val orig = objDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val s = r.getAs[String]("out")
      val pre = s.stripPrefix("<|fim_pre|>")
      val Array(p, rest) = pre.split("\\Q<|fim_suf|>\\E", 2)
      val Array(suf, mid) = rest.split("\\Q<|fim_mid|>\\E", 2)
      assert(p + mid + suf == orig(r.getAs[Long]("id")), s"doc ${r.get(0)}")
    }
  }

  test("fimTransform: rate 0 passes every document through untouched") {
    val out = graft.operators.Corpus
      .fimTransform(objDocs, "doc_id", "text", ratePct = 0)
      .orderBy("id").collect()
    assert(out.forall(r => !r.getAs[Boolean]("fim")))
    assert(out.map(_.getAs[String]("out")).toSeq ==
      objDocs.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("spanCorrupt: mask-all collapses each doc to one sentinel group") {
    val out = graft.operators.Corpus
      .spanCorrupt(objDocs, "doc_id", "text", maskPct = 100)
      .orderBy("id").collect()
    out.zip(objDocs.orderBy("doc_id").collect()).foreach { case (r, d) =>
      assert(r.getAs[String]("input") == "<X0>")
      assert(r.getAs[String]("target") == "<X0> " + d.getString(1))
      assert(r.getAs[Long]("n_groups") == 1L)
      assert(r.getAs[Long]("n_masked") == d.getString(1).split("\\s+").length.toLong)
    }
  }

  test("spanCorrupt: mask-none is the identity with empty targets") {
    val out = graft.operators.Corpus
      .spanCorrupt(objDocs, "doc_id", "text", maskPct = 0)
      .orderBy("id").collect()
    out.zip(objDocs.orderBy("doc_id").collect()).foreach { case (r, d) =>
      assert(r.getAs[String]("input") == d.getString(1))
      assert(r.getAs[String]("target") == "")
      assert(r.getAs[Long]("n_masked") == 0L && r.getAs[Long]("n_groups") == 0L)
    }
  }

  test("spanCorrupt: substituting target groups back reconstructs the doc") {
    val out = graft.operators.Corpus
      .spanCorrupt(objDocs, "doc_id", "text", maskPct = 40)
      .orderBy("id").collect()
    val orig = objDocs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val n = r.getAs[Long]("n_groups").toInt
      // target = "<X0> toks... <X1> toks..." — split into per-sentinel fills
      val fills = (0 until n).map { k =>
        val t = r.getAs[String]("target")
        val from = t.indexOf(s"<X$k>") + s"<X$k>".length
        val to = if (k + 1 < n) t.indexOf(s"<X${k + 1}>") else t.length
        t.substring(from, to).trim
      }
      val rebuilt = (0 until n).foldLeft(r.getAs[String]("input")) {
        (acc, k) => acc.replace(s"<X$k>", fills(k))
      }
      assert(rebuilt == orig(r.getAs[Long]("id")), s"doc ${r.get(0)}")
    }
  }

  // ---------------------------------------------------------- code/prose

  test("codeProse flags code-shaped text and passes prose") {
    val code =
      "def f(n):\n    total = 0;\n    for i in range(n):\n        total += i;\n    return total;"
    val prose = "The quick brown fox jumps over the lazy dog near the bank " +
      "of the river and keeps running without any punctuation of note"
    val out = graft.operators.TextAnalysis.codeProse(
      Seq((0L, code), (1L, prose)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Boolean]("is_code"))
    assert(!out(1).getAs[Boolean]("is_code"))
    assert(out(0).getAs[Long]("n_indent") == 4L) // four indented lines
    assert(out(0).getAs[Long]("n_lines") == 5L)
  }

  // ------------------------------------------------------- snapshot diff

  test("snapshotDiff classifies all four states, null text included") {
    val old = Seq((1L, "same"), (2L, "will change"), (3L, "will drop"),
      (5L, null: String)).toDF("doc_id", "text")
    val neu = Seq((1L, "same"), (2L, "changed!"), (4L, "fresh"),
      (5L, null: String)).toDF("doc_id", "text")
    val out = graft.operators.Corpus.snapshotDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"), s"$out")
  }

  // --------------------------------------------------------- secret scan

  test("secretScan separates high-entropy keys from repeated filler") {
    val docs = Seq(
      (0L, "deploy with key Qw7Rt9Yu2IoPaSdFgHjKlZxCvBn done"), // 26 distinct
      (1L, "padding aaaaaaaaaaaaaaaaaaaaaaaa end"), // zero entropy
      (2L, "short tokens only here")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .secretScan(docs, "doc_id", "text").orderBy("id").collect()
    assert(out(0).getAs[Long]("n_candidates") == 1L)
    assert(out(0).getAs[Long]("n_secrets") == 1L)
    assert(out(1).getAs[Long]("n_candidates") == 1L)
    assert(out(1).getAs[Long]("n_secrets") == 0L)
    assert(out(1).getAs[Long]("max_ent_q4") == 0L) // single repeated char
    assert(out(2).getAs[Long]("n_candidates") == 0L)
    assert(out(2).getAs[Long]("max_ent_q4") == -1L)
  }

  test("secretScan treats null text as zero candidates, not a null row") {
    val r = graft.operators.TextAnalysis.secretScan(
      Seq((0L, null: String)).toDF("doc_id", "text"), "doc_id", "text").head()
    assert(r.getAs[Long]("n_candidates") == 0L)
    assert(r.getAs[Long]("n_secrets") == 0L)
    assert(r.getAs[Long]("max_ent_q4") == -1L)
  }

  test("secretScan entropy score is the exact integer formula") {
    // "ab"×12: q = ⌊1e4·24·ln 24⌋ − 2·⌊1e4·12·ln 12⌋, per-char ⌊q/24⌋ =
    // 6931 = ⌊1e4·ln 2⌋
    val docs = Seq((0L, "x " + ("ab" * 12) + " y")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .secretScan(docs, "doc_id", "text").head()
    val q = math.floor(1e4 * 24 * math.log(24)).toLong -
      2L * math.floor(1e4 * 12 * math.log(12)).toLong
    assert(r.getAs[Long]("max_ent_q4") == math.floor(q / 24.0).toLong)
    assert(r.getAs[Long]("max_ent_q4") == 6931L)
  }

  // ------------------------------------------------- bitext margin mining

  test("marginMine matches orthogonal pairs with margin 1.0 at k=1") {
    val src = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("id", "v")
    val tgt = Seq((1L, Seq(2.0, 0.0)), (3L, Seq(0.0, 3.0)))
      .toDF("id", "v")
    val out = Similarity.marginMine(src, tgt, "id", "v", k = 1)
      .orderBy("src_id").collect()
    assert(out.map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id")))
      .toSeq == Seq((0L, 1L), (2L, 3L)))
    // k=1: margin = 2·cos / (cos + cos) = 1.0 exactly
    assert(out.forall(_.getAs[Double]("margin") == 1.0))
    assert(out.forall(_.getAs[Long]("cos_q") == 1000000000000L))
  }

  test("knnClassify majority-votes with smaller-label tie-break") {
    // seeds: two label-0 near the x-axis, two label-1 near the y-axis, one
    // label-2 outlier; k=3 → clear majorities
    val seeds = Seq(
      (100L, Seq(1.0, 0.0), 0L), (101L, Seq(0.9, 0.1), 0L),
      (102L, Seq(0.0, 1.0), 1L), (103L, Seq(0.1, 0.9), 1L),
      (104L, Seq(-1.0, -1.0), 2L)
    ).toDF("id", "v", "lab")
    val queries = Seq(
      (0L, Seq(1.0, 0.05)), // x-ish → label 0
      (1L, Seq(0.05, 1.0))  // y-ish → label 1
    ).toDF("id", "v")
    val out = Similarity.knnClassify(queries, seeds, "id", "v", "lab", k = 3)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("pred_label")).toSeq == Seq(0L, 1L))
    assert(out.forall(_.getAs[Long]("votes") == 2L)) // 2-of-3 majorities
    // tie case: k=2 → one vote each; the SMALLER label must win
    val tied = Similarity.knnClassify(
      Seq((0L, Seq(1.0, 1.0))).toDF("id", "v"),
      Seq((10L, Seq(1.0, 0.0), 7L), (11L, Seq(0.0, 1.0), 3L)).toDF("id", "v", "lab"),
      "id", "v", "lab", k = 2).head()
    assert(tied.getAs[Long]("pred_label") == 3L)
    assert(tied.getAs[Long]("votes") == 1L)
  }

  test("marginMine prefers the non-hub target under the ratio margin") {
    // hub target t1 is moderately close to BOTH sources, so its
    // neighborhood sum is large and its margin deflates; specific target
    // t3 is the best match for s0 despite a slightly lower raw cosine
    // being impossible here — instead verify the neighborhood sums differ
    val src = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(0.8, 0.6))).toDF("id", "v")
    val tgt = Seq((1L, Seq(0.9, 0.45)), (3L, Seq(1.0, 0.0))).toDF("id", "v")
    val out = Similarity.marginMine(src, tgt, "id", "v", k = 2)
      .orderBy("src_id").collect()
    // s0's best is the exact-match t3, not the hub t1
    assert(out.head.getAs[Long]("src_id") == 0L)
    assert(out.head.getAs[Long]("tgt_id") == 3L)
    // hub t1 appears in both sources' neighborhoods: nsum_tgt(t1) sums two
    // large cosines, deflating its margin below t3's for s0
    assert(out.length == 2)
  }
}
