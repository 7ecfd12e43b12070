package graft

import org.apache.spark.sql.functions._
import graft.operators.Nlp

/** Stemming / POS / RBEM sentiment (SURVEY.md §2.11; ref Snowball.scala:17,
  * POSTagging.scala:17, Sentiment.scala:20,79). Porter expectations come from
  * the published algorithm's example vocabulary. */
class NlpSpec extends SparkSpec {
  import spark.implicits._

  test("porter stemmer matches the published example vocabulary") {
    val expected = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "hopping" -> "hop",
      "falling" -> "fall", "filing" -> "file", "sized" -> "size",
      "happy" -> "happi", "sky" -> "sky", "relational" -> "relat",
      "conditional" -> "condit", "hopefulness" -> "hope", "goodness" -> "good",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "troubles" -> "troubl", "controlling" -> "control",
      "rate" -> "rate", "cease" -> "ceas", "probate" -> "probat")
    for ((in, out) <- expected)
      assert(Nlp.porterStem(in) == out, s"$in -> ${Nlp.porterStem(in)}, want $out")
  }

  test("stemTokens stems a token-array column via the Spark surface") {
    val d = Seq(Seq("motoring", "cats", "happily")).toDF("toks")
    val out = Nlp.stemTokens(d, "toks", "stems").select("stems").as[Seq[String]].head
    assert(out == Seq("motor", "cat", "happili"))
  }

  test("posTag produces sensible Penn-style tags on planted sentences") {
    assert(Nlp.posTag("the quick brown fox jumps over the lazy dog".split(" ")) ==
      Seq("DT", "JJ", "JJ", "NN", "VBZ", "IN", "DT", "JJ", "NN"))
    assert(Nlp.posTag("she quickly failed the test".split(" ")) ==
      Seq("PRP", "RB", "VBD", "DT", "NN"))
    assert(Nlp.posTag("i will run".split(" ")) == Seq("PRP", "MD", "VB"))
    assert(Nlp.posTag("the cats sleep".split(" ")) == Seq("DT", "NNS", "NN"))
  }

  test("rbem polarity: emission, negation flip, amplifier, attenuator, stop") {
    def pol(s: String): Double = Nlp.rbemPolarity(s.split(" ").toSeq, Nil)
    assert(pol("this movie is good") == 1.0)
    assert(pol("this movie is not good") == -1.0)          // right flip
    assert(pol("this movie is very good") == 2.0)          // amplifier
    assert(pol("this movie is slightly bad") == -0.5)      // attenuator
    assert(pol("the plot was bad but the acting was good") == 1.0) // stop resets left
    assert(pol("it isn't good") == -1.0)                   // n't clitic
    assert(pol("a completely neutral sentence") == 0.0)
  }

  test("rbem emotion scores the matching lexicon, negation-aware") {
    val happy = Nlp.rbemEmotion(Seq("i", "am", "happy"), Nil)
    assert(happy("happiness") > 0 && happy("anger") == 0.0)
    val notHappy = Nlp.rbemEmotion(Seq("i", "am", "not", "happy"), Nil)
    assert(notHappy("happiness") < 0)
  }

  test("summarize extracts the highest-TFIDF sentences") {
    val text = "the cat sat down. quantum entanglement drives spooky correlation. the dog slept"
    val d = Seq((1L, text)).toDF("id", "text")
      .withColumn("tfidf", map(
        lit("quantum"), lit(5.0), lit("entanglement"), lit(5.0),
        lit("spooky"), lit(4.0), lit("correlation"), lit(4.0),
        lit("cat"), lit(0.5), lit("dog"), lit(0.4)))
    val one = Nlp.summarize(d, "text", "tfidf", "sum1", numLines = 1)
      .select("sum1").as[String].head
    assert(one == "quantum entanglement drives spooky correlation")
    val two = Nlp.summarize(d, "text", "tfidf", "sum2", numLines = 2)
      .select("sum2").as[String].head
    // preserveOrder keeps document order: cat sentence precedes quantum one
    assert(two == "the cat sat down. quantum entanglement drives spooky correlation")
  }

  test("tfidfMap scores rare tokens above ubiquitous ones") {
    val d = Seq(
      (1L, Seq("common", "rare")),
      (2L, Seq("common", "other")),
      (3L, Seq("common", "third"))).toDF("id", "toks")
    val m = Nlp.tfidfMap(d, "id", "toks", "tfidf")
      .filter(col("id") === 1).select("tfidf").as[Map[String, Double]].head
    assert(m("common") == 0.0) // in every doc: idf = ln(1) = 0
    assert(m("rare") > 1.0)    // idf = ln(3)
  }

  test("polarity via the DataFrame surface, discretized") {
    val d = Seq("the food was really great", "the service was not good", "plain text")
      .toDF("text").withColumn("toks", split(col("text"), " "))
    val out = Nlp.polarity(Nlp.posTags(d, "toks", "tags"), "toks", "tags", "pol",
      discretize = true)
    assert(out.select("pol").as[Double].collect().toSeq == Seq(1.0, -1.0, 0.0))
  }

  test("fused nlpPipeline equals the chained stem/pos/polarity operators") {
    val docs = Seq(
      "the quick brown fox is not very happy today",
      "good great excellent but terribly sad and not good",
      "",
      "running runner ran quickly caresses ponies")
      .zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
    val chained = Nlp.polarity(
      Nlp.posTags(Nlp.stemTokens(docs, "toks", "stems"), "toks", "tags"),
      "toks", "tags", "pol")
      .select(col("id"), array_join(col("stems"), " ").as("st"),
        array_join(col("tags"), " ").as("tg"), col("pol"))
    val fused = Nlp.nlpPipeline(docs, "toks", "st", "tg", "pol")
      .select("id", "st", "tg", "pol")
    assert(chained.orderBy("id").collect().toSeq == fused.orderBy("id").collect().toSeq)
  }

  test("Snowball Dutch stemmer follows the published algorithm step by step") {
    import graft.operators.SnowballDutch.stem
    // each expectation hand-traced through the published steps
    // (snowballstem.org/algorithms/dutch/stemmer.html); comments name the
    // rule the word exercises
    val cases = Seq(
      "lichamelijk" -> "licham",      // 3b lijk + e_ending
      "lichamelijke" -> "licham",     // step2 e, then 3b lijk + e_ending
      "lichamen" -> "licham",         // step1 en after non-vowel
      "lichamelijkheden" -> "licham", // heden→heid, 3a heid, 3b lijk
      "werken" -> "werk",             // step1 en
      "lopen" -> "lop",               // step1 en
      "loop" -> "lop",                // step4 vowel undouble
      "maan" -> "man",                // step4 (published example)
      "brood" -> "brod",              // step4 (published example)
      "katten" -> "kat",              // step1 en + undouble tt
      "bessen" -> "bess",             // undouble is kk/dd/tt ONLY
      "gemen" -> "gemen",             // 'gem' exclusion blocks en-removal
      "gemeen" -> "gemen",            // en after vowel survives; step4 fires
      "jongens" -> "jongen",          // step1 s after valid s-ending
      "kansen" -> "kans",             // step1 en
      "tijds" -> "tijd",              // s after d (valid)
      "bajs" -> "bajs",               // s after j is NOT a valid s-ending
      "heden" -> "heden",             // among commits: heden outside R1 ≠ en
      "verbondenheid" -> "verbond",   // 3a heid THEN its en-continuation
      "mogelijkheden" -> "mogelijk",  // heden→heid, 3a; lijk outside R2 stays
      "kwaliteiten" -> "kwaliteit",   // step1 en
      "wandeling" -> "wandel",        // 3b ing in R2
      "sprekend" -> "sprekend",       // 3b end outside R2 stays
      "matige" -> "matig",            // step2 e; ig outside R2 stays
      "openbare" -> "open",           // step2 e sets e_found; 3b bar needs it
      "openbaar" -> "open",           // 3b baar
      "systeem" -> "system",          // step4 ee undouble
      "politie" -> "politie",         // final e after vowel survives step2
      "baaien" -> "baai",             // prelude i→I marker is a consonant
      "yoghurt" -> "yoghurt",         // initial y→Y marker, postlude restores
      "één" -> "een",                 // prelude accent removal; word too short
      "getekene" -> "getek",          // step1 ene
      "dorpje" -> "dorpj",            // step2 e (no diminutive rule exists)
      "teef" -> "tef")                // step4 ee
    for ((in, want) <- cases)
      assert(stem(in) == want, s"stem($in) = ${stem(in)}, want $want")
  }

  test("SnowballProcessor compat: nl selects the Dutch stemmer, default Porter") {
    val flow = """
    { "generators": [
        {"id": "g", "name": "list", "config": {"rows": [
          {"toks": ["lichamen", "katten", "openbare"]}
        ]}, "next": ["sb"]} ],
      "processors": [
        {"id": "sb", "name": "tuktu.nlp.processors.SnowballProcessor",
         "result": "stems", "config": {"field": "toks", "language": "nl"},
         "next": []} ] }"""
    val out = graft.engine.Flow.runSingle(spark, flow).head
      .getSeq[String](1)
    assert(out == Seq("licham", "kat", "open"))
    val en = """
    { "generators": [
        {"id": "g", "name": "list", "config": {"rows": [ {"toks": ["running"]} ]},
         "next": ["sb"]} ],
      "processors": [
        {"id": "sb", "name": "tuktu.nlp.processors.SnowballProcessor",
         "result": "stems", "config": {"field": "toks", "language": "en"},
         "next": []} ] }"""
    assert(graft.engine.Flow.runSingle(spark, en).head.getSeq[String](1) == Seq("run"))
  }
}
