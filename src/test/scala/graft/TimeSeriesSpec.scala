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
