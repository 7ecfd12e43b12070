package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Time-series modeling (SURVEY.md §2.11; ref modules/ml/.../timeseries/
 * ARIMA.scala:15): AR(p) — ARIMA(p,0,0) — with intercept, fit by least
 * squares through the normal equations.
 *
 * Scale shape: ONE window pass builds the lag matrix, ONE grouped
 * aggregation reduces each group to its (p+1)×(p+1) moment sums — both
 * expression-level, partial-aggregated map-side. The linear solve then runs
 * per GROUP on that single aggregated row (a (p+1)³ Gaussian elimination in
 * a pure-function UDF over ~dozens of doubles — the same per-model-tiny-data
 * judgement as HMM's nStates² fits). No driver loop, no collect of row data.
 */
object TimeSeries {

  /** Attach lag columns `<value>_lag1..p` within each group in time order. */
  def lagMatrix(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                valueCol: String, p: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    (1 to p).foldLeft(df) { (d, i) =>
      d.withColumn(s"${valueCol}_lag$i", lag(col(valueCol), i).over(w))
    }
  }

  /** Solve A x = b for a dense symmetric (dim×dim) A given in row-major
    * order, by Gaussian elimination with partial pivoting. Pure function. */
  private[graft] def gaussSolve(aFlat: Seq[Double], b: Seq[Double], dim: Int): Seq[Double] = {
    val a = Array.tabulate(dim, dim)((i, j) => aFlat(i * dim + j))
    val y = b.toArray
    for (k <- 0 until dim) {
      val piv = (k until dim).maxBy(i => math.abs(a(i)(k)))
      if (math.abs(a(piv)(k)) < 1e-12) return Seq.fill(dim)(Double.NaN)
      if (piv != k) { val t = a(k); a(k) = a(piv); a(piv) = t
        val ty = y(k); y(k) = y(piv); y(piv) = ty }
      for (i <- k + 1 until dim) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until dim) a(i)(j) -= f * a(k)(j)
        y(i) -= f * y(k)
      }
    }
    val x = Array.ofDim[Double](dim)
    for (i <- dim - 1 to 0 by -1) {
      var s = y(i)
      for (j <- i + 1 until dim) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x.toSeq
  }

  private val solveUdf = udf((aFlat: Seq[Double], b: Seq[Double], dim: Int) =>
    gaussSolve(aFlat, b, dim))

  /** Fit AR(p) with intercept per group: returns one row per group with
    * `n` (usable points) and `coef` = [c, φ1, …, φp]. */
  def arFit(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
            valueCol: String, p: Int): DataFrame = {
    val lagged = lagMatrix(df, groupCols, order, valueCol, p)
      .filter((1 to p).map(i => col(s"${valueCol}_lag$i").isNotNull).reduce(_ && _))
    // regressors x0=1 (intercept), x1..xp = lags; y = value
    def x(i: Int): Column =
      if (i == 0) lit(1.0) else col(s"${valueCol}_lag$i").cast(DoubleType)
    val y = col(valueCol).cast(DoubleType)
    val xtx = for (i <- 0 to p; j <- 0 to p) yield sum(x(i) * x(j)).as(s"__xtx_${i}_$j")
    val xty = (0 to p).map(i => sum(x(i) * y).as(s"__xty_$i"))
    val aggs = count(lit(1)).as("n") +: (xtx ++ xty)
    lagged.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("coef", solveUdf(
        array((for (i <- 0 to p; j <- 0 to p) yield col(s"__xtx_${i}_$j")): _*),
        array((0 to p).map(i => col(s"__xty_$i")): _*),
        lit(p + 1)))
      .select((groupCols.map(col) :+ col("n") :+ col("coef")): _*)
  }

  /** One-step-ahead fitted values: broadcast-join the per-group coefficients
    * back and evaluate c + Σ φi·lag_i per row (null until p lags exist). */
  def arFitted(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
               valueCol: String, p: Int, out: String = "fitted"): DataFrame = {
    val fit = arFit(df, groupCols, order, valueCol, p)
      .select(groupCols.map(col) :+ col("coef"): _*)
    val lagged = lagMatrix(df, groupCols, order, valueCol, p)
    // left join: a group too short to fit keeps its rows with fitted = null
    lagged.join(broadcast(fit), groupCols, "left")
      .withColumn(out,
        (1 to p).foldLeft(element_at(col("coef"), 1)) { (acc, i) =>
          acc + element_at(col("coef"), i + 1) * col(s"${valueCol}_lag$i").cast(DoubleType)
        })
      .drop("coef")
  }
}
