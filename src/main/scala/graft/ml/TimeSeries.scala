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

  // --------------- per-series ARI(p, d): the reference ARIMA's q = 0 slice
  // (ref modules/ml/app/tuktu/ml/models/timeseries/ARIMA.scala — the q = 0
  // path fits AR by exact OLS on the lag-d-differenced series via
  // Autoregression.scala:45; q > 0 needs the CSS/BOBYQA optimizer).

  /** Lag-`order` difference, size-preserving (ARIMA.scala:163: elements
    * before `order` copy over unchanged; the reference differences by lag
    * d ONCE, not d-fold first differencing — mirrored). */
  def lagDifference(ts: Seq[Double], order: Int): Array[Double] =
    if (order == 0) ts.toArray
    else ts.indices.map(i => if (i < order) ts(i) else ts(i) - ts(i - order)).toArray

  /** Inverse lag difference (ARIMA.scala:188). */
  def lagInvDifference(ts: Seq[Double], order: Int): Array[Double] =
    if (order == 0) ts.toArray
    else {
      val out = new Array[Double](ts.length)
      for (i <- ts.indices) out(i) = if (i < order) ts(i) else ts(i) + out(i - order)
      out
    }

  /** OLS AR(p) + optional intercept on ONE series (AutoRegression.scala:45
    * via the same normal equations/gaussSolve as the distributed arFit).
    * `intercept = false` fits WITHOUT the constant — the reference always
    * fits one and then misindexes `coefficients(intercept + j)` when the
    * intercept is disabled (ARIMA.scala:305 reads c as φ₁), which is a bug
    * not worth reproducing. Returns (c, φ). */
  def arFitSeries(ts: Seq[Double], p: Int, intercept: Boolean = true): (Double, Array[Double]) = {
    val n = ts.length
    require(n > p, s"series of $n values cannot fit AR($p)")
    val ic = if (intercept) 1 else 0
    val dim = p + ic
    if (dim == 0) return (0.0, Array.empty)
    def x(t: Int, k: Int): Double = // k-th regressor at time t
      if (intercept && k == 0) 1.0 else ts(t - (k - ic) - 1)
    val a = Array.ofDim[Double](dim * dim)
    val b = new Array[Double](dim)
    for (t <- p until n; i <- 0 until dim) {
      b(i) += x(t, i) * ts(t)
      for (j <- 0 until dim) a(i * dim + j) += x(t, i) * x(t, j)
    }
    val sol = gaussSolve(a.toSeq, b.toSeq, dim)
    if (intercept) (sol.head, sol.tail.toArray) else (0.0, sol.toArray)
  }

  /** Reference-shaped ARI forecast (ARIMA.scala:404 with q = 0): returns
    * `ts.length + h` values — the leading d raw values, the first p
    * diffed seeds, the 1-step-ahead fitted values, then h recursive
    * forecasts (seeded from the last p FITTED values, like the
    * reference's `forward := hist` copy) — all inverse-differenced. */
  def ariForecast(ts: Seq[Double], c: Double, phi: Array[Double], d: Int,
                  h: Int): Array[Double] = {
    val p = phi.length
    val diffed = lagDifference(ts, d).drop(d)
    val nD = diffed.length
    require(nD >= p, s"series too short: ${ts.length} values for ARI($p, $d)")
    def step(hist: Int => Double, i: Int): Double =
      c + (0 until math.min(p, i)).map(j => phi(j) * hist(i - j - 1)).sum
    val hist = new Array[Double](nD)
    for (i <- p until nD) hist(i) = step(diffed(_), i)
    val forward = new Array[Double](h + p)
    for (i <- 0 until p) forward(i) = hist(nD - p + i)
    for (i <- p until h + p) forward(i) = step(forward(_), i)
    val results = new Array[Double](ts.length + h)
    for (i <- 0 until d) results(i) = ts(i)
    for (i <- 0 until p) results(d + i) = diffed(i)
    for (i <- p until nD) results(d + i) = hist(i)
    for (i <- 0 until h) results(nD + d + i) = forward(p + i)
    lagInvDifference(results.toSeq, d)
  }

  /** JSON persistence for ARI parameters. */
  def saveAri(model: AriModel, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      s"""{"c":${model.c},"phi":${model.phi.mkString("[", ",", "]")},"d":${model.d}}"""
        .getBytes("UTF-8"))

  def loadAri(path: String): AriModel = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    import scala.jdk.CollectionConverters._
    AriModel(root.get("c").asDouble,
      root.get("phi").elements().asScala.map(_.asDouble).toArray, root.get("d").asInt)
  }
}

/**
 * Change-point detection over one series — the hydra FindChangePoints
 * algorithm (public, Apache-2: github.com/addthis/hydra FindChangePoints;
 * the reference ships the same algorithm, ChangePointDetection.scala:19).
 * Faithfully mirrored quirks: `sd` is the UNNORMALIZED sqrt of the residual
 * sum, floored at 1e-4; peak detection runs first and SMOOTHS the peaks out
 * of the series before the rise/fall scan; the change ratio divides by
 * max(predicted, 1).
 */
object ChangePoints {
  /** (index → (size, type)) with type ∈ RISE/FALL/START/STOP/PEAK. */
  def find(series: Seq[Double], minChange: Double, minRatio: Double,
           minZScore: Double, inactiveThreshold: Double,
           windowSize: Int): Map[Int, (Double, String)] = {
    val data = series.toArray
    val out = collection.mutable.Map.empty[Int, (Double, String)]
    def mean(xs: Array[Double]): Double = xs.sum / xs.length
    def sd(xs: Array[Double]): Double = {
      val m = mean(xs)
      math.max(math.sqrt(xs.map(z => (m - z) * (m - z)).sum), 1e-4)
    }
    // pass 1: peaks — and smooth each one away before the trend scan
    for (i <- data.indices) {
      val lo = math.max(0, i - windowSize)
      val hi = math.min(i + windowSize, data.length)
      val neighborhood = data.slice(lo, hi)
      val without = data.slice(lo, i) ++ data.slice(i + 1, hi)
      if (without.nonEmpty && sd(neighborhood) > minZScore * sd(without)) {
        val change = data(i) - mean(without)
        if (math.abs(change) > minChange) {
          out(i) = (change, "PEAK")
          data(i) = mean(without)
        }
      }
    }
    // pass 2: sustained changes vs a linear prediction from the window
    def predictNext(w: Array[Double]): Double = {
      val n = w.length
      val meanx = 0.5 * (n - 1.0)
      val meanxy = w.indices.map(i => i * w(i)).sum / n.toDouble
      val meanxx = w.indices.map(i => i.toDouble * i).sum / n.toDouble
      val slope = (meanxy - meanx * mean(w)) / (meanxx - meanx * meanx)
      val intercept = mean(w) - slope * meanx
      slope * n + intercept
    }
    for (i <- 2 until data.length) {
      val start = math.max(i - windowSize + 1, 0)
      val w = data.slice(start, i)
      val next = data(i)
      val predicted = predictNext(w)
      val diff = next - predicted
      val z = diff / sd(w)
      val ratio = -1 + next / math.max(predicted, 1.0)
      // the reference concatenates peaks before trend points and the
      // processor takes the FIRST hit per index — a PEAK keeps priority
      if (!out.contains(i) && math.abs(z) > minZScore &&
          math.abs(diff) > minChange && math.abs(ratio) > minRatio) {
        val before = mean(w)
        val tp =
          if (before > next) { if (next > inactiveThreshold) "FALL" else "STOP" }
          else { if (before < inactiveThreshold) "START" else "RISE" }
        out(i) = (diff, tp)
      }
    }
    out.toMap
  }
}

final case class AriModel(c: Double, phi: Array[Double], d: Int)

/** Registry adapter for ARI models: `transform` appends the reference-
  * shaped forecast (`<prefix>_forecast`, ts.length + h values) for the
  * configured series column. */
class AriTransformer(val model: AriModel, val obsCol: String,
                     val nFuture: Int = 1, val prefix: String = "ari")
    extends org.apache.spark.ml.Transformer {
  import org.apache.spark.sql.functions.{col => fcol, udf}
  override val uid: String =
    org.apache.spark.ml.util.Identifiable.randomUID("ari")
  /** Forecast column for an array<double> series. */
  def forecastColumn(obs: org.apache.spark.sql.Column, h: Int): org.apache.spark.sql.Column = {
    val m = model
    udf((ts: Seq[Double]) =>
      if (ts == null) null else TimeSeries.ariForecast(ts, m.c, m.phi, m.d, h))
      .apply(obs.cast(ArrayType(DoubleType)))
  }
  override def transform(ds: org.apache.spark.sql.Dataset[_]): DataFrame =
    ds.toDF().withColumn(s"${prefix}_forecast", forecastColumn(fcol(obsCol), nFuture))
  override def transformSchema(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    schema.add(s"${prefix}_forecast", ArrayType(DoubleType))
  override def copy(extra: org.apache.spark.ml.param.ParamMap): AriTransformer = this
}
