package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * N-gram language-model scoring for corpus quality filtering (the CCNet-style
 * perplexity pass: score each document under a language model trained on a
 * trusted corpus; outlier perplexity means boilerplate, gibberish, or wrong
 * language).
 *
 * The model is an add-one-smoothed bigram LM kept as DataFrames — counts are
 * plain aggregations, so training is two map-side-combined shuffles and the
 * model stays distributed (no driver-side table). Scoring joins each
 * document's bigram stream against the count tables.
 *
 * Scale shape: at 100 TB the reference pipelines prune the LM (top-M n-grams)
 * and broadcast it; here the count tables flow through AQE, which broadcasts
 * them automatically when they fit and shuffle-joins otherwise. Everything is
 * integer counts + one ln() per scored bigram — codegen'd expressions, no
 * UDFs, no driver loops.
 */
object LangModel {

  /** Bigram LM counts over a text column: (contexts, bigrams, vocab) where
    * contexts = (a, c_a) with c_a the number of bigrams whose left token is
    * `a`, bigrams = (a, b, c_ab), and vocab is a 1-row (vocab_size) frame —
    * kept as a DataFrame so scoring can fold it in as a broadcast instead of
    * an eager driver-side count. */
  def trainBigram(df: DataFrame, idCol: String,
                  textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val pairs = bigramPairs(df, idCol, textCol)
    val bigrams = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    // c_a = Σ_b c_ab by construction: derive contexts from the already-reduced
    // bigram table instead of a second corpus-wide explode + shuffle
    val contexts = bigrams.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val vocab = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("vocab_size"))
    (contexts, bigrams, vocab)
  }

  /** Per-document add-one-smoothed bigram log-probability under a trained LM:
    * sum over bigrams of ln((c_ab + 1) / (c_a + V)). Returns
    * (id, n_bigrams, logprob_q4) with the sum quantized per term as
    * floor(1e4 · term) — 0.1-millinat resolution. The quantization is a
    * determinism MITIGATION, not a guarantee: ln is not IEEE
    * correctly-rounded, so two engines can differ by an ulp, and a floor
    * boundary coincidence flips the quantized term. The coincidence window
    * is ~ulp(term)·1e4 ≈ 1e-11 per distinct (c_ab, c_a, V) triple — chosen
    * so the expected cross-engine divergence over a full corpus is ≪ 1.
    * Documents with fewer than two tokens score (0, 0). Unseen bigrams and
    * contexts smooth to c = 0 rather than dropping the term. */
  def scoreBigram(df: DataFrame, idCol: String, textCol: String,
                  contexts: DataFrame, bigrams: DataFrame,
                  vocab: DataFrame): DataFrame = {
    val pairs = bigramPairs(df, idCol, textCol)
    val withV = pairs.crossJoin(broadcast(vocab))
    val term = floor(lit(1e4) *
      (log(coalesce(col("c_ab"), lit(0L)) + lit(1L)) -
        log(coalesce(col("c_a"), lit(0L)) + col("vocab_size"))))
    val scored = withV
      .join(bigrams, Seq("a", "b"), "left")
      .join(contexts, Seq("a"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(term).as("logprob_q4"))
    // dataframe-qualified refs: idCol may itself be named "id"
    val base = df.select(col(idCol))
    base.join(scored, base(idCol) === scored("id"), "left")
      .select(base(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("logprob_q4"), lit(0L)).as("logprob_q4"))
  }

  /** Train on the corpus itself and score every document (the self-scoring
    * variant used for intra-corpus outlier filtering). */
  def selfScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (contexts, bigrams, vocab) = trainBigram(df, idCol, textCol)
    scoreBigram(df, idCol, textCol, contexts, bigrams, vocab)
  }

  /** Adjacent token pairs per document: explode + per-doc lead window (the
    * codegen path — array HOFs are interpreted). */
  private def bigramPairs(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val ex = df.select(col(idCol).as("id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    ex.withColumn("b", lead(col("tok"), 1).over(w))
      .filter(col("b").isNotNull)
      .select(col("id"), col("tok").as("a"), col("b"))
  }
}
