package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Similarity}

/** Paper-guarantee specs for the winnowing fingerprints (Schleimer,
  * Wilkerson & Aiken 2003), the hash-bottom-k per-group sampler, and the
  * JL random-projection retrieval path — the r13-tail operators.
  */
class WinnowRprojSpec extends SparkSpec {
  import spark.implicits._

  // filler words are all distinct so no accidental shared n-grams
  private def filler(tag: String, count: Int): String =
    (0 until count).map(i => s"${tag}w$i").mkString(" ")

  test("winnowing: every full window of w n-grams contains a selected position") {
    val docs = (0L until 20L).map { id =>
      (id, filler(s"d$id", 30 + (id % 7).toInt))
    }.toDF("doc_id", "text")
    val n = 3; val w = 4
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", n, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val ng = r.getString(1).split("\\s+").length - (n - 1)
      val sel = fps(id)
      // the winnowing invariant: each window [p-w+1, p] of positions holds
      // at least one selected fingerprint position (paper §2 correctness)
      ((w - 1) until ng).foreach { p =>
        assert((p - w + 1 to p).exists(q => sel.contains(q.toLong)),
          s"doc $id window ending at $p has no selected position")
      }
    }
  }

  test("winnowing: substring match of length >= w+n-1 tokens shares a fingerprint") {
    val n = 3; val w = 4
    // planted common phrase of exactly w+n-1 = 6 tokens at different offsets
    val phrase = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"${filler("a", 11)} $phrase ${filler("b", 7)}"),
      (2L, s"${filler("c", 4)} $phrase ${filler("d", 13)}"),
      (3L, s"$phrase ${filler("e", 9)}"),
      (4L, filler("f", 25)) // no phrase
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", n, w)
      .select(col("doc_id"), col("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    for (a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a < b)
      assert((fp(a) & fp(b)).nonEmpty, s"docs $a/$b share the phrase but no fingerprint")
    assert((fp(1L) & fp(4L)).isEmpty, "no shared n-grams, no shared fingerprint expected")

    // and winnowCandidates surfaces exactly the phrase-sharing pairs
    val cand = Dedup.winnowCandidates(docs, "doc_id", "text", n, w, minShared = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("winnowing: short documents — one fingerprint if >= n tokens, none below") {
    val docs = Seq(
      (1L, "one two three four"),   // 2 n-grams < one window -> global min only
      (2L, "solo pair"),            // < n tokens: zero n-grams
      (3L, "a b c")                 // exactly one n-gram
    ).toDF("doc_id", "text")
    val byDoc = Dedup.winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.getOrElse(1L, 0L) == 1L)
    assert(byDoc.getOrElse(2L, 0L) == 0L)
    assert(byDoc.getOrElse(3L, 0L) == 1L)
  }

  test("winnowing: documents over posBound n-grams fail loudly, not silently") {
    val docs = Seq((1L, filler("x", 20))).toDF("doc_id", "text")
    // 20 tokens -> 18 n-grams > posBound=16: the packed key would alias
    val e = intercept[Exception] {
      Dedup.winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4,
        posBound = 16L).collect()
    }
    assert(e.getMessage.contains("posBound"))
    // and at the bound itself it still works (18 n-grams, bound 18)
    val ok = Dedup.winnowFingerprints(docs, "doc_id", "text", n = 3, w = 4,
      posBound = 18L)
    assert(ok.count() > 0)
  }

  test("winnowMatchSpans: one span per side covering the planted run, disjoint docs absent") {
    // a 20-token shared run: 18 interior n-grams, window minima slide at
    // least every w grams, so each side collects several shared
    // fingerprints with gaps <= w < gap=w+n-1 — exactly ONE island/side
    val shared = (0 until 20).map(i => s"run$i").mkString(" ")
    val a = s"${filler("pre", 3)} $shared ${filler("suf", 3)}" // run tokens [3, 23)
    val b = s"$shared ${filler("tail", 5)}"                    // run tokens [0, 20)
    val c = filler("other", 30)                                // no overlap
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val spans = Dedup.winnowMatchSpans(df, "id", "text", n = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(spans.nonEmpty && spans.forall(s => s._1 == 1L && s._2 == 2L),
      s"only the planted pair may report spans: ${spans.mkString(";")}")
    val aS = spans.filter(_._3 == "a")
    val bS = spans.filter(_._3 == "b")
    assert(aS.length == 1 && bS.length == 1,
      s"one merged span per side: a=${aS.mkString(";")} b=${bS.mkString(";")}")
    // matched grams are run-interior only (boundary grams mix filler):
    // a-side grams in [3, 20] -> token span within [3, 23); b within [0, 20)
    assert(aS.head._4 >= 3 && aS.head._5 <= 23 && aS.head._6 >= 2, aS.head.toString)
    assert(bS.head._4 >= 0 && bS.head._5 <= 20 && bS.head._6 >= 2, bS.head.toString)
    // both sides saw the same shared fingerprints, just at shifted positions
    assert(aS.head._6 == bS.head._6)
    assert(aS.head._4 - bS.head._4 == 3 && aS.head._5 - bS.head._5 == 3)
  }

  test("hashBottomKSample: exactly min(k, |group|) rows, matching the k smallest hashes") {
    val rows = (0L until 200L).map(i => (s"g${i % 5}", i)) ++
      Seq(("tiny", 9001L), ("tiny", 9002L)) // |group| < k
    val df = rows.toDF("grp", "id")
    val k = 8
    val got = Corpus.hashBottomKSample(df, Seq("grp"), "id", k)
    val sizes = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.filter(_._1 != "tiny").values.forall(_ == k.toLong))
    assert(sizes("tiny") == 2L)
    // reference implementation: window rank over (hash, id)
    val h = graft.operators.TextAnalysis.tokenHash(col("id").cast("string")) % Dedup.P
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("__h"), col("id"))
    val want = df.withColumn("__h", h)
      .withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got.select("grp", "id").as[(String, Long)].collect().toSet == want)
  }

  test("hashBottomKSample: invariant to physical order and partitioning (mergeable)") {
    val df = (0L until 300L).map(i => (s"g${i % 3}", i)).toDF("grp", "id")
    val k = 10
    val a = Corpus.hashBottomKSample(df, Seq("grp"), "id", k)
      .select("grp", "id", "h").as[(String, Long, Long)].collect().toSet
    val b = Corpus.hashBottomKSample(
      df.orderBy(col("id").desc).repartition(7), Seq("grp"), "id", k)
      .select("grp", "id", "h").as[(String, Long, Long)].collect().toSet
    assert(a == b)
  }

  private def fixtureVecs(nv: Int, dIn: Int) =
    (0L until nv.toLong).map { i =>
      (i, Array.tabulate(dIn)(j =>
        math.sin(i * 0.7 + j * 1.3) + (if (j % 4 == (i % 4).toInt) 1.5 else 0.0)))
    }.toDF("vec_id", "emb")

  test("randomProject: JL norm concentration on the fixture") {
    val dIn = 16; val dOut = 8
    val df = fixtureVecs(200, dIn)
    val ratios = Similarity.randomProject(df, "emb", dIn, dOut, "p")
      .select(
        (Similarity.dot(col("p"), col("p")) /
          Similarity.dot(col("emb"), col("emb"))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    // E[||Px||^2] = ||x||^2 for Rademacher/sqrt(dOut); with dOut=8 the
    // per-vector spread is wide but the fixture mean concentrates tightly
    assert(mean > 0.8 && mean < 1.2, s"mean distortion $mean outside [0.8, 1.2]")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"extreme per-vector distortion: min=${ratios.min} max=${ratios.max}")
  }

  test("rprojRerankTopK: recall vs exact cosineTopK on the fixture") {
    val dIn = 16; val dOut = 8
    val df = fixtureVecs(200, dIn)
    val k = 5
    val exact = Similarity.cosineTopK(df, "vec_id", "emb", queryId = 17L, k)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.rprojRerankTopK(df, "vec_id", "emb",
      queryId = 17L, dIn, dOut, m = 25, k = k)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.size == k)
    val recall = (exact & approx).size.toDouble / k
    assert(recall >= 0.6, s"recall $recall < 0.6 at m=25 over 200 vectors")
    // and with m = corpus the rerank is exact by construction
    val full = Similarity.rprojRerankTopK(df, "vec_id", "emb",
      queryId = 17L, dIn, dOut, m = 200, k = k)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact)
  }
}
