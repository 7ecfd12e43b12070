package graft

import org.apache.spark.sql.functions._
import graft.ml.TimeSeries

/** AR(p) fit/forecast (SURVEY.md §2.11; ref timeseries/ARIMA.scala:15). */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // planted AR(2): x_t = 2 + 0.5·x_{t-1} − 0.25·x_{t-2} + ε, seeded noise
  private def planted(n: Int, noise: Double): Seq[(String, Int, Double)] = {
    val rnd = new scala.util.Random(42)
    var x1 = 1.0; var x2 = 0.0
    (0 until n).map { t =>
      val x = 2.0 + 0.5 * x1 - 0.25 * x2 + (rnd.nextDouble() - 0.5) * noise
      x2 = x1; x1 = x
      ("u", t, x)
    }
  }

  test("arFit recovers planted AR(2) coefficients via normal equations") {
    val df = planted(500, 1.0).toDF("g", "t", "v")
    val fit = TimeSeries.arFit(df, Seq("g"), Seq(col("t")), "v", p = 2)
    val coef = fit.select("coef").as[Seq[Double]].head
    assert(math.abs(coef(0) - 2.0) < 0.5, s"intercept ${coef(0)}")
    assert(math.abs(coef(1) - 0.5) < 0.1, s"phi1 ${coef(1)}")
    assert(math.abs(coef(2) + 0.25) < 0.1, s"phi2 ${coef(2)}")
    assert(fit.select("n").as[Long].head == 498) // 500 minus p lags
  }

  test("arFit handles several groups independently") {
    val a = planted(200, 1.0)
    val b = a.map { case (_, t, v) => ("other", t, -v) } // mirrored series
    val fit = TimeSeries.arFit((a ++ b).toDF("g", "t", "v"), Seq("g"), Seq(col("t")), "v", 2)
      .orderBy("g")
    val coefs = fit.select("coef").as[Seq[Double]].collect()
    assert(coefs.length == 2)
    assert(math.abs(coefs(0)(0) + coefs(1)(0)) < 0.2) // intercepts mirror
    assert(math.abs(coefs(0)(1) - coefs(1)(1)) < 0.05) // slopes match
  }

  test("arFitted one-step predictions track the series") {
    val df = planted(300, 0.2).toDF("g", "t", "v")
    val fitted = TimeSeries.arFitted(df, Seq("g"), Seq(col("t")), "v", p = 2)
      .filter(col("fitted").isNotNull)
    val mae = fitted.select(abs(col("fitted") - col("v"))).as[Double].collect()
    assert(mae.sum / mae.length < 0.2, s"mae ${mae.sum / mae.length}")
    assert(fitted.count() == 298)
  }

  test("arFitted keeps rows of groups too short to fit, with null fitted") {
    val long = planted(50, 0.2)
    val short = Seq(("tiny", 0, 1.0), ("tiny", 1, 2.0)) // 2 rows < p+1
    val out = TimeSeries.arFitted((long ++ short).toDF("g", "t", "v"), Seq("g"), Seq(col("t")), "v", p = 2)
    assert(out.filter(col("g") === "tiny").count() == 2)
    assert(out.filter(col("g") === "tiny" && col("fitted").isNotNull).count() == 0)
  }

  test("gaussSolve solves a known system and flags singularity with NaN") {
    val x = TimeSeries.gaussSolve(Seq(2.0, 1.0, 1.0, 3.0), Seq(5.0, 10.0), 2)
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
    val sing = TimeSeries.gaussSolve(Seq(1.0, 2.0, 2.0, 4.0), Seq(1.0, 2.0), 2)
    assert(sing.forall(_.isNaN))
  }

  test("arFitSeries recovers a planted AR(1) with drift") {
    val rnd = new scala.util.Random(11)
    val ts = Iterator.iterate(10.0)(y => 2.0 + 0.5 * y + rnd.nextGaussian() * 0.1)
      .take(200).toSeq
    val (c, phi) = TimeSeries.arFitSeries(ts, p = 1)
    assert(math.abs(c - 2.0) < 0.3, s"c = $c")
    assert(math.abs(phi(0) - 0.5) < 0.1, s"phi = ${phi.toSeq}")
  }

  test("lag difference round-trips and ariForecast continues a linear trend exactly") {
    val ts = (1 to 10).map(_ * 3.0)
    val diffed = TimeSeries.lagDifference(ts, 1)
    assert(diffed.toSeq == 3.0 +: Seq.fill(9)(3.0))
    val back = TimeSeries.lagInvDifference(diffed.toSeq, 1)
    assert(back.zip(ts).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // p = 0, d = 1, intercept: c = mean of the diffs = 3 exactly; the
    // reference-shaped forecast reconstructs the trend and extends it
    val (c, phi) = TimeSeries.arFitSeries(diffed.drop(1).toSeq, p = 0)
    assert(c == 3.0 && phi.isEmpty)
    val fc = TimeSeries.ariForecast(ts, c, phi, d = 1, h = 2)
    assert(fc.toSeq == (1 to 12).map(_ * 3.0))
  }

  test("nelderMead minimizes a shifted quadratic to its analytic optimum") {
    val opt = TimeSeries.nelderMead(
      x => (x(0) - 3.0) * (x(0) - 3.0) + 2.0 * (x(1) + 1.5) * (x(1) + 1.5) + 7.0,
      Array(0.0, 0.0))
    assert(math.abs(opt(0) - 3.0) < 1e-4 && math.abs(opt(1) + 1.5) < 1e-4,
      s"opt = ${opt.toSeq}")
  }

  test("armaFitted: hand-computed MA(1) one-step predictions") {
    // c = 0, θ = 0.5 over [1, 2, 1, 3]: yHat = [0, 0.5·e0=0, 0.5·2=1, 0.5·0=0]
    val yHat = TimeSeries.armaFitted(Array(1.0, 2.0, 1.0, 3.0),
      c = 0.0, phi = Array.empty, theta = Array(0.5))
    assert(yHat.toSeq == Seq(0.0, 0.0, 1.0, 0.0))
  }

  test("arimaFitSeries with q = 1 recovers a planted ARMA(1,1) and beats the true-parameter CSS start") {
    // x_t = 1 + 0.6·x_{t-1} + ε_t + 0.4·ε_{t-1}, seeded gaussian noise
    val rnd = new scala.util.Random(7)
    val n = 600
    val xs = new Array[Double](n)
    var prevE = 0.0; var prevX = 2.5
    for (t <- 0 until n) {
      val e = rnd.nextGaussian() * 0.5
      xs(t) = 1.0 + 0.6 * prevX + e + 0.4 * prevE
      prevE = e; prevX = xs(t)
    }
    val m = TimeSeries.arimaFitSeries(xs.toSeq, p = 1, d = 0, q = 1)
    assert(math.abs(m.phi(0) - 0.6) < 0.15, s"phi = ${m.phi.toSeq}")
    assert(math.abs(m.theta(0) - 0.4) < 0.2, s"theta = ${m.theta.toSeq}")
    // the optimizer's CSS log-likelihood is at least the true parameters'
    val llFit = TimeSeries.cssLogLikelihood(xs, m.c, m.phi, m.theta)
    val llTrue = TimeSeries.cssLogLikelihood(xs, 1.0, Array(0.6), Array(0.4))
    assert(llFit >= llTrue - 1e-6, s"llFit=$llFit < llTrue=$llTrue")
    // q = 0 path is untouched by the ARMA machinery: exact OLS equivalence
    val ar = TimeSeries.arimaFitSeries(xs.toSeq, p = 2, d = 1, q = 0)
    val (c0, phi0) = TimeSeries.arFitSeries(
      TimeSeries.lagDifference(xs.toSeq, 1).drop(1).toSeq, 2)
    assert(ar.c == c0 && ar.phi.toSeq == phi0.toSeq && ar.theta.isEmpty)
  }

  test("armaForecast: hand-computed MA(1) continuation and q = 0 delegation") {
    // same hand case as armaFitted: last residual e = 3, so the first
    // future step is θ·3 = 1.5 and the second decays to c = 0
    val m = graft.ml.AriModel(0.0, Array.empty, 0, Array(0.5))
    val fc = TimeSeries.armaForecast(Seq(1.0, 2.0, 1.0, 3.0), m, h = 2)
    assert(fc.toSeq == Seq(1.0, 0.0, 1.0, 0.0, 1.5, 0.0))
    // q = 0 delegates to the established ariForecast
    val trend = (1 to 10).map(_ * 3.0)
    val ari = graft.ml.AriModel(3.0, Array.empty, 1)
    assert(TimeSeries.armaForecast(trend, ari, 2).toSeq ==
      TimeSeries.ariForecast(trend, 3.0, Array.empty, 1, 2).toSeq)
  }

  test("ARMA model JSON persistence round-trips theta") {
    val p = java.nio.file.Files.createTempFile("arma", ".json").toString
    val m = graft.ml.AriModel(1.25, Array(0.5, -0.25), 1, Array(0.4))
    TimeSeries.saveAri(m, p)
    val back = TimeSeries.loadAri(p)
    assert(back.c == m.c && back.phi.toSeq == m.phi.toSeq &&
      back.d == m.d && back.theta.toSeq == m.theta.toSeq)
  }

  test("ChangePoints classifies step-ups, shutdowns, and lone spikes") {
    import graft.ml.ChangePoints
    // sustained step 10 → 100: one RISE where the step lands
    val rise = ChangePoints.find(Seq.fill(6)(10.0) ++ Seq.fill(6)(100.0),
      minChange = 20, minRatio = 0.5, minZScore = 3, inactiveThreshold = 1,
      windowSize = 4)
    assert(rise.contains(6), s"got $rise")
    assert(rise(6)._2 == "RISE" && math.abs(rise(6)._1 - 90.0) < 1e-6)
    assert(!rise.values.exists(_._2 == "PEAK"))
    // sustained drop 100 → 0 with threshold 1: STOP (inactive after)
    val stop = ChangePoints.find(Seq.fill(6)(100.0) ++ Seq.fill(6)(0.0),
      minChange = 20, minRatio = 0.5, minZScore = 3, inactiveThreshold = 1,
      windowSize = 4)
    assert(stop.exists(_._2._2 == "STOP"), s"got $stop")
    // lone spike: PEAK at its index, smoothed away before the trend scan
    val spike = ChangePoints.find(
      Seq(10.0, 10, 10, 10, 100, 10, 10, 10, 10),
      minChange = 20, minRatio = 0.5, minZScore = 3, inactiveThreshold = 1,
      windowSize = 4)
    assert(spike.keySet == Set(4), s"got $spike")
    assert(spike(4)._2 == "PEAK" && spike(4)._1 > 80)
  }
}
