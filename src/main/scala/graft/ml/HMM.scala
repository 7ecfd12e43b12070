package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Discrete hidden Markov model (SURVEY.md §2.11 — the reference's
 * modules/ml/app/tuktu/ml/models/hmm trains/decodes HMMs; no spark.ml
 * analog exists). Spark-native layout: model parameters are small local
 * matrices broadcast to executors; sequences live one-per-group in a
 * DataFrame and are decoded/scored in parallel with `groupByKey.mapGroups`
 * — each sequence is independent, so this scales to any corpus with
 * one shuffle on the sequence key.
 *
 * Parameters: pi(initial), a(transition s→s'), b(emission s→symbol),
 * all log-space for numeric stability.
 */
final case class HmmModel(pi: Array[Double], a: Array[Array[Double]], b: Array[Array[Double]]) {
  def nStates: Int = pi.length

  /** log P(observations) via the forward algorithm. */
  def logLikelihood(obs: Seq[Int]): Double = {
    val n = nStates
    var alpha = Array.tabulate(n)(s => pi(s) + b(s)(obs.head))
    for (t <- 1 until obs.length) {
      alpha = Array.tabulate(n) { s =>
        val m = (0 until n).map(p => alpha(p) + a(p)(s)).max
        m + math.log((0 until n).map(p => math.exp(alpha(p) + a(p)(s) - m)).sum) + b(s)(obs(t))
      }
    }
    val m = alpha.max
    m + math.log(alpha.map(v => math.exp(v - m)).sum)
  }

  /** Most likely state path via Viterbi. */
  def decode(obs: Seq[Int]): Seq[Int] = {
    val n = nStates
    val T = obs.length
    val delta = Array.ofDim[Double](T, n)
    val psi = Array.ofDim[Int](T, n)
    for (s <- 0 until n) delta(0)(s) = pi(s) + b(s)(obs.head)
    for (t <- 1 until T; s <- 0 until n) {
      val (best, arg) = (0 until n).map(p => (delta(t - 1)(p) + a(p)(s), p)).maxBy(_._1)
      delta(t)(s) = best + b(s)(obs(t))
      psi(t)(s) = arg
    }
    val path = new Array[Int](T)
    path(T - 1) = (0 until n).maxBy(delta(T - 1))
    for (t <- T - 2 to 0 by -1) path(t) = psi(t + 1)(path(t + 1))
    path.toSeq
  }
}

object HMM {

  /** Supervised training from (state, symbol) pair sequences: maximum-
    * likelihood counts with add-one smoothing — a pure DataFrame aggregation
    * (three grouped counts), fully distributed. */
  def fitSupervised(df: DataFrame, seqCol: String, orderCol: String,
                    stateCol: String, symbolCol: String,
                    nStates: Int, nSymbols: Int): HmmModel = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(seqCol)).orderBy(col(orderCol))
    val withPrev = df.withColumn("__prev", lag(col(stateCol), 1).over(w))
    val init = withPrev.filter(col("__prev").isNull)
      .groupBy(col(stateCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val trans = withPrev.filter(col("__prev").isNotNull)
      .groupBy(col("__prev"), col(stateCol)).count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val emit = df.groupBy(col(stateCol), col(symbolCol)).count().collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

    def norm(counts: Seq[Double]): Array[Double] = {
      val tot = counts.sum
      counts.map(c => math.log(c / tot)).toArray
    }
    HmmModel(
      pi = norm((0 until nStates).map(s => init.getOrElse(s, 0L) + 1.0)),
      a = (0 until nStates).map(p =>
        norm((0 until nStates).map(s => trans.getOrElse((p, s), 0L) + 1.0))).toArray,
      b = (0 until nStates).map(s =>
        norm((0 until nSymbols).map(o => emit.getOrElse((s, o), 0L) + 1.0))).toArray)
  }

  /** Decode every sequence in parallel: one shuffle on the sequence key,
    * per-group Viterbi on executors (model broadcast via closure). */
  def decodeAll(df: DataFrame, seqCol: String, orderCol: String, symbolCol: String,
                model: HmmModel)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(seqCol).cast("long"), col(orderCol).cast("long"),
        col(symbolCol).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(_._1)
      .mapGroups { (key, rows) =>
        val obs = rows.toSeq.sortBy(_._2).map(_._3)
        (key, model.decode(obs), model.logLikelihood(obs))
      }
      .toDF(seqCol, "states", "log_likelihood")
  }
}
