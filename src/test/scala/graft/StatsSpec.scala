package graft

import org.apache.spark.sql.functions._
import graft.ml.Stats

/** Correlation/covariance matrix + p-values (SURVEY.md §2.5; ref
  * StatisticsProcessors.scala:154,189,215). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("pearsonPValue matches published t-table quantiles") {
    // two-sided p = 0.05 at t = 2.306 with df = 8 (n = 10):
    // r = t / sqrt(t^2 + df)
    val t = 2.306; val df = 8.0
    val r = t / math.sqrt(t * t + df)
    assert(math.abs(Stats.pearsonPValue(r, 10) - 0.05) < 1e-3)
    // p = 0.01 at t = 3.355, df = 8
    val r2 = 3.355 / math.sqrt(3.355 * 3.355 + df)
    assert(math.abs(Stats.pearsonPValue(r2, 10) - 0.01) < 1e-3)
    assert(Stats.pearsonPValue(0.0, 100) > 0.999)
    assert(Stats.pearsonPValue(1.0, 100) == 0.0)
    assert(Stats.pearsonPValue(0.5, 2).isNaN)
  }

  test("correlationMatrix: perfect, inverse, and noisy pairs in one pass") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 1.0, -x, rnd.nextDouble())
    }
    val df = rows.toDF("x", "y2", "neg", "noise")
    val m = Stats.correlationMatrix(df, Seq("x", "y2", "neg", "noise"), pValues = true)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(m(("x", "y2"))._1 - 1.0) < 1e-9)     // perfect linear
    assert(math.abs(m(("x", "neg"))._1 + 1.0) < 1e-9)    // perfect inverse
    assert(math.abs(m(("x", "x"))._1 - 1.0) < 1e-9)      // self
    assert(math.abs(m(("x", "noise"))._1) < 0.2)         // uncorrelated
    assert(m(("x", "y2"))._2 < 1e-9)                     // p ~ 0 for perfect
    assert(m(("x", "noise"))._2 > 0.01)                  // p large for noise
    assert(m.size == 16)
    // symmetry
    assert(m(("y2", "x"))._1 == m(("x", "y2"))._1)
  }

  test("covarianceMatrix computes population covariance") {
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("a", "b")
    val m = Stats.covarianceMatrix(df, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // var_pop(a) = 2/3; cov(a,b) = 4/3; var_pop(b) = 8/3
    assert(math.abs(m(("a", "a")) - 2.0 / 3) < 1e-12)
    assert(math.abs(m(("a", "b")) - 4.0 / 3) < 1e-12)
    assert(math.abs(m(("b", "b")) - 8.0 / 3) < 1e-12)
  }

  test("spearmanCorr: monotone ±1, tie-averaged ranks, rank-not-value sensitivity") {
    import graft.ml.Stats
    import spark.implicits._
    // group "up": strictly increasing but non-linear (x² vs x) — Spearman
    // sees the monotone RANKS and reports exactly 1, where Pearson
    // wouldn't; group "down": reversed → exactly −1
    val up = (1 to 10).map(i => ("up", i.toLong, (i.toLong * i)))
    val down = (1 to 10).map(i => ("down", i.toLong, (11 - i).toLong))
    // group "tied": x = 1,2,2,4 vs y = 10,20,20,40 — identical tie
    // structure on both sides → rho exactly 1 under AVERAGE ranks
    val tied = Seq(("tied", 1L, 10L), ("tied", 2L, 20L),
      ("tied", 2L, 20L), ("tied", 4L, 40L))
    val df = (up ++ down ++ tied).toDF("grp", "x", "y")
    val out = Stats.spearmanCorr(df, Seq("grp"), "x", "y").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(7))).toMap
    assert(out("up")._1 == 10L && math.abs(out("up")._2 - 1.0) < 1e-12)
    assert(out("down")._1 == 10L && math.abs(out("down")._2 + 1.0) < 1e-12)
    assert(math.abs(out("tied")._2 - 1.0) < 1e-12, s"tied rho: ${out("tied")}")
    // a known non-trivial value: x=1..5 vs y=(1,3,2,5,4): d²=(0,1,1,1,1),
    // rho = 1 − 6·4/(5·24) = 0.8
    val mid = (Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 5L), (5L, 4L)))
      .map { case (a, b) => ("m", a, b) }.toDF("grp", "x", "y")
    val rho = Stats.spearmanCorr(mid, Seq("grp"), "x", "y").head().getDouble(7)
    assert(math.abs(rho - 0.8) < 1e-12, s"rho=$rho")
  }

  test("midrankNormalize: midrank CDF positions, ties share, null passthrough") {
    import graft.ml.Stats
    import spark.implicits._
    // group g: values 10, 20, 20, 40 → avgRank/n CDFs 1/4, 2.5/4, 2.5/4,
    // 4/4; a second group normalizes on its OWN scale
    val df = Seq(("g", 1L, Some(10L)), ("g", 2L, Some(20L)),
      ("g", 3L, Some(20L)), ("g", 4L, Some(40L)),
      ("h", 5L, Some(7L)), ("h", 6L, Some(9L)),
      ("h", 7L, None)).toDF("grp", "id", "v")
    val out = Stats.midrankNormalize(df, Seq("grp"), "v", "cdf").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).contains(0.25) && out(2L).contains(0.625) &&
      out(3L).contains(0.625) && out(4L).contains(1.0), s"$out")
    assert(out(5L).contains(0.5) && out(6L).contains(1.0))
    // null value rows pass through with a null CDF
    assert(out(7L).isEmpty)
    // the calibration property: a global cdf > 0.5 filter keeps each
    // group's own upper half regardless of the groups' raw scales
    val kept = Stats.midrankNormalize(df, Seq("grp"), "v", "cdf")
      .filter(col("cdf") > 0.5).select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 6L))
  }
}
