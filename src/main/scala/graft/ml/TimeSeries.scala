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

  // --------------- per-series ARIMA(p, d, q) (ref modules/ml/app/tuktu/ml/
  // models/timeseries/ARIMA.scala): the q = 0 slice fits AR by exact OLS on
  // the lag-d-differenced series (Autoregression.scala:45); q > 0 goes
  // through Hannan-Rissanen init + CSS maximization below.

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

  /** JSON persistence for ARI/ARMA parameters. */
  def saveAri(model: AriModel, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (s"""{"c":${model.c},"phi":${model.phi.mkString("[", ",", "]")},""" +
        s""""theta":${model.theta.mkString("[", ",", "]")},"d":${model.d}}""")
        .getBytes("UTF-8"))

  def loadAri(path: String): AriModel = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    import scala.jdk.CollectionConverters._
    AriModel(root.get("c").asDouble,
      root.get("phi").elements().asScala.map(_.asDouble).toArray, root.get("d").asInt,
      // theta is optional so pre-ARMA model files keep loading
      Option(root.get("theta"))
        .map(_.elements().asScala.map(_.asDouble).toArray).getOrElse(Array.empty))
  }

  // --------------------------------------------------------------- ARMA q > 0
  // (ARIMA.scala:48 fitModel / :227 logLikelihoodCSSARMA / :131
  // HannanRisannenInit). The reference maximizes the conditional-sum-of-
  // squares log-likelihood with BOBYQA from a Hannan-Rissanen start; the
  // same objective here is maximized with Nelder-Mead (public simplex
  // algorithm, Nelder & Mead 1965 — derivative-free like BOBYQA, and the
  // parameter vectors are tiny driver-side state). One deliberate
  // divergence: the reference's updateMAErrors (ARIMA.scala:252) copies the
  // error buffer ASCENDING, which floods every slot with errs(0) instead of
  // shifting — for q ≥ 2 its MA terms all read the same lag. Like the
  // arFitSeries intercept note above, that is a bug not worth reproducing:
  // here errors shift properly (err(j) = residual at t-1-j).

  /** 1-step-ahead ARMA fitted values over an already-differenced series.
    * yHat(i) = c + Σφⱼ·y(i-j-1) + Σθⱼ·err(t-1-j) for i ≥ max(p,q); leading
    * max(p,q) entries stay 0 (reference iterateARMA shape). */
  private[graft] def armaFitted(diffed: Array[Double], c: Double,
                                phi: Array[Double], theta: Array[Double]): Array[Double] = {
    val p = phi.length; val q = theta.length
    val maxLag = math.max(p, q)
    val yHat = new Array[Double](diffed.length)
    val errs = new Array[Double](q) // errs(0) = newest
    var i = maxLag
    while (i < diffed.length) {
      var v = c
      var j = 0
      while (j < p) { v += phi(j) * diffed(i - j - 1); j += 1 }
      j = 0
      while (j < q) { v += theta(j) * errs(j); j += 1 }
      yHat(i) = v
      if (q > 0) {
        var k = q - 1
        while (k > 0) { errs(k) = errs(k - 1); k -= 1 }
        errs(0) = diffed(i) - v
      }
      i += 1
    }
    yHat
  }

  /** CSS log-likelihood of an ARMA(p,q) parameterization on a differenced
    * series (ARIMA.scala:227): residuals start at max(p,q). */
  private[graft] def cssLogLikelihood(diffed: Array[Double], c: Double,
                                      phi: Array[Double], theta: Array[Double]): Double = {
    val n = diffed.length
    val maxLag = math.max(phi.length, theta.length)
    val yHat = armaFitted(diffed, c, phi, theta)
    var css = 0.0
    var i = maxLag
    while (i < n) { val e = diffed(i) - yHat(i); css += e * e; i += 1 }
    val sigma2 = css / n
    (-n / 2.0) * math.log(2 * math.Pi * sigma2) - css / (2 * sigma2)
  }

  /** Hannan-Rissanen initial estimates (ARIMA.scala:131): fit AR(m) with
    * m = max(p,q)+1, take its residuals as error proxies, then OLS of y on
    * p AR lags + q error lags. Returns [c?, φ…, θ…]. */
  private[graft] def hannanRissanen(diffed: Array[Double], p: Int, q: Int,
                                    intercept: Boolean): Array[Double] = {
    val m = math.max(p, q) + 1
    require(diffed.length > 2 * m, s"series of ${diffed.length} values too short for ARMA($p,$q)")
    val (c0, phi0) = arFitSeries(diffed.toSeq, m)
    // residuals of the AR(m) fit, aligned with yTrunc = diffed.drop(m)
    val yTrunc = diffed.drop(m)
    val errors = yTrunc.indices.map { t =>
      val i = t + m
      yTrunc(t) - (c0 + (0 until m).map(j => phi0(j) * diffed(i - j - 1)).sum)
    }.toArray
    // secondary OLS on [1?, y lags 1..p, err lags 1..q] over t ≥ max(p,q)
    val maxLag = math.max(p, q)
    val ic = if (intercept) 1 else 0
    val dim = ic + p + q
    val a = Array.ofDim[Double](dim * dim)
    val b = new Array[Double](dim)
    def reg(t: Int, k: Int): Double =
      if (k < ic) 1.0
      else if (k - ic < p) yTrunc(t - (k - ic) - 1)
      else errors(t - (k - ic - p) - 1)
    for (t <- maxLag until yTrunc.length; i <- 0 until dim) {
      b(i) += reg(t, i) * yTrunc(t)
      for (j <- 0 until dim) a(i * dim + j) += reg(t, i) * reg(t, j)
    }
    gaussSolve(a.toSeq, b.toSeq, dim).toArray
  }

  /** Nelder-Mead simplex minimization (Nelder & Mead 1965, standard
    * reflection/expansion/contraction/shrink coefficients). Driver-side:
    * ARMA parameter vectors are a handful of doubles. */
  private[graft] def nelderMead(f: Array[Double] => Double, x0: Array[Double],
                                maxIter: Int = 2000, tol: Double = 1e-10): Array[Double] = {
    val n = x0.length
    if (n == 0) return x0
    val simplex = Array.tabulate(n + 1) { i =>
      val x = x0.clone()
      if (i > 0) x(i - 1) = if (x(i - 1) != 0.0) x(i - 1) * 1.05 else 0.00025
      x
    }
    val fx = simplex.map(f)
    var iter = 0
    while (iter < maxIter) {
      // order ascending by f
      val ord = fx.zipWithIndex.sortBy(_._1).map(_._2)
      val best = simplex(ord(0)); val fBest = fx(ord(0))
      val worst = ord(n); val fWorst = fx(worst)
      val fSecondWorst = fx(ord(n - 1))
      if (math.abs(fWorst - fBest) <= tol * (math.abs(fBest) + tol)) return best
      // centroid of all but worst
      val cen = new Array[Double](n)
      for (i <- 0 to n if i != worst; j <- 0 until n) cen(j) += simplex(i)(j) / n
      def lerp(alpha: Double): Array[Double] =
        Array.tabulate(n)(j => cen(j) + alpha * (cen(j) - simplex(worst)(j)))
      val refl = lerp(1.0); val fRefl = f(refl)
      if (fRefl < fBest) {
        val exp = lerp(2.0); val fExp = f(exp)
        if (fExp < fRefl) { simplex(worst) = exp; fx(worst) = fExp }
        else { simplex(worst) = refl; fx(worst) = fRefl }
      } else if (fRefl < fSecondWorst) {
        simplex(worst) = refl; fx(worst) = fRefl
      } else {
        val con = lerp(if (fRefl < fWorst) 0.5 else -0.5)
        val fCon = f(con)
        if (fCon < math.min(fRefl, fWorst)) { simplex(worst) = con; fx(worst) = fCon }
        else { // shrink toward best
          for (i <- 0 to n if i != ord(0)) {
            for (j <- 0 until n) simplex(i)(j) = best(j) + 0.5 * (simplex(i)(j) - best(j))
            fx(i) = f(simplex(i))
          }
        }
      }
      iter += 1
    }
    val ord = fx.zipWithIndex.sortBy(_._1).map(_._2)
    simplex(ord(0))
  }

  /** Full ARIMA(p,d,q) fit on one series (ARIMA.scala:48 fitModel): lag-d
    * difference once, then exact AR OLS when q = 0, else Hannan-Rissanen
    * init refined by CSS maximization. */
  def arimaFitSeries(ts: Seq[Double], p: Int, d: Int, q: Int,
                     intercept: Boolean = true): AriModel = {
    val diffed = lagDifference(ts, d).drop(d)
    if (q == 0) {
      val (c, phi) = arFitSeries(diffed.toSeq, p, intercept)
      return AriModel(c, phi, d)
    }
    val ic = if (intercept) 1 else 0
    val init = hannanRissanen(diffed, p, q, intercept)
    def unpack(x: Array[Double]): (Double, Array[Double], Array[Double]) =
      (if (intercept) x(0) else 0.0, x.slice(ic, ic + p), x.slice(ic + p, ic + p + q))
    val best = nelderMead(x => {
      val (c, phi, theta) = unpack(x)
      -cssLogLikelihood(diffed, c, phi, theta)
    }, init)
    val (c, phi, theta) = unpack(best)
    AriModel(c, phi, d, theta)
  }

  /** Reference-shaped ARMA forecast (ARIMA.scala:404): generalizes
    * [[ariForecast]] with MA terms — the leading d raw values, the first
    * max(p,q) diffed seeds, the 1-step-ahead fitted values, then h
    * recursive forecasts (future errors zero, MA seeded from the last
    * residuals), all inverse-differenced. */
  def armaForecast(ts: Seq[Double], model: AriModel, h: Int): Array[Double] = {
    val AriModel(c, phi, d, theta) = model
    val p = phi.length; val q = theta.length
    if (q == 0) return ariForecast(ts, c, phi, d, h)
    val maxLag = math.max(p, q)
    val diffed = lagDifference(ts, d).drop(d)
    val nD = diffed.length
    require(nD >= maxLag, s"series too short: ${ts.length} values for ARMA($p,$d,$q)")
    val hist = armaFitted(diffed, c, phi, theta)
    // forecast seeds: last maxLag FITTED values + last q residuals (newest
    // at index 0); future errors are zero so MA influence fades after q steps
    val errs = new Array[Double](q)
    for (j <- 0 until q if nD - 1 - j >= 0) errs(j) = diffed(nD - 1 - j) - hist(nD - 1 - j)
    val forward = new Array[Double](h + maxLag)
    for (i <- 0 until maxLag) forward(i) = hist(nD - maxLag + i)
    for (i <- maxLag until h + maxLag) {
      var v = c
      for (j <- 0 until p) v += phi(j) * forward(i - j - 1)
      for (j <- 0 until q) v += theta(j) * errs(j)
      forward(i) = v
      var k = q - 1
      while (k > 0) { errs(k) = errs(k - 1); k -= 1 }
      errs(0) = 0.0 // future gold standard = forecast itself
    }
    val results = new Array[Double](ts.length + h)
    for (i <- 0 until d) results(i) = ts(i)
    for (i <- 0 until maxLag) results(d + i) = diffed(i)
    for (i <- maxLag until nD) results(d + i) = hist(i)
    for (i <- 0 until h) results(nD + d + i) = forward(maxLag + i)
    lagInvDifference(results.toSeq, d)
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

final case class AriModel(c: Double, phi: Array[Double], d: Int,
                          theta: Array[Double] = Array.empty)

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
      if (ts == null) null else TimeSeries.armaForecast(ts, m, h))
      .apply(obs.cast(ArrayType(DoubleType)))
  }
  override def transform(ds: org.apache.spark.sql.Dataset[_]): DataFrame =
    ds.toDF().withColumn(s"${prefix}_forecast", forecastColumn(fcol(obsCol), nFuture))
  override def transformSchema(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    schema.add(s"${prefix}_forecast", ArrayType(DoubleType))
  override def copy(extra: org.apache.spark.ml.param.ParamMap): AriTransformer = this
}
