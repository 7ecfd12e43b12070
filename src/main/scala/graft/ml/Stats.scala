package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Correlation matrix with p-values (SURVEY.md §2.5; ref
 * app/tuktu/processors/bucket/statistics/StatisticsProcessors.scala:154
 * CorrelationProcessor / :215 CorrelationMatrixProcessor, which collect the
 * packet into arrays and call commons-math PearsonsCorrelation).
 *
 * Distributed shape: ONE aggregation pass computes every pairwise moment sum
 * (n, Σxᵢ, Σxᵢxⱼ — k(k+1)/2 + k + 1 exact sums, map-side partials), then the
 * k×k matrix unfolds from that single row as long-form (x, y, corr, p_value)
 * rows — no data collect, no per-pair scan. The two-sided p-value is the
 * Student-t tail of t = r·√((n−2)/(1−r²)) with n−2 dof, the same test
 * commons-math's getCorrelationPValues runs (TDistribution is on Spark's
 * own classpath via commons-math3).
 */
object Stats {

  /** Two-sided Pearson correlation p-value for r with n samples. */
  def pearsonPValue(r: Double, n: Long): Double =
    if (n <= 2 || r.isNaN) Double.NaN
    else if (math.abs(r) >= 1.0) 0.0
    else {
      val t = math.abs(r) * math.sqrt((n - 2) / (1.0 - r * r))
      val dist = new org.apache.commons.math3.distribution.TDistribution(n - 2.0)
      2.0 * dist.cumulativeProbability(-t)
    }

  private val pValueUdf = udf((r: Double, n: Long) => pearsonPValue(r, n))

  private def s(i: Int) = col(s"__s$i")
  private def ss(i: Int, j: Int) = if (i <= j) col(s"__ss${i}_$j") else col(s"__ss${j}_$i")

  /** One row holding n, Σxᵢ and Σxᵢxⱼ for every pair — the single shared
    * aggregation pass under both matrices. */
  private def momentSums(df: DataFrame, fields: Seq[String]): DataFrame = {
    val k = fields.size
    val sums =
      (0 until k).map(i => sum(col(fields(i)).cast(DoubleType)).as(s"__s$i")) ++
        (for (i <- 0 until k; j <- i until k)
          yield sum(col(fields(i)).cast(DoubleType) * col(fields(j)).cast(DoubleType))
            .as(s"__ss${i}_$j"))
    val aggs = count(lit(1)).as("__n") +: sums
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Long-form correlation matrix over `fields`: one row per ordered pair
    * (x, y, corr[, p_value]). Correlations use the exact-sum formula
    * r = (nΣxy − ΣxΣy) / √(nΣx² − (Σx)²) / √(nΣy² − (Σy)²). */
  def correlationMatrix(df: DataFrame, fields: Seq[String],
                        pValues: Boolean = false): DataFrame = {
    val k = fields.size
    val g = momentSums(df, fields)
    val n = col("__n").cast(DoubleType)
    def corr(i: Int, j: Int): Column =
      (n * ss(i, j) - s(i) * s(j)) /
        (sqrt(n * ss(i, i) - s(i) * s(i)) * sqrt(n * ss(j, j) - s(j) * s(j)))
    val pairs = for (i <- 0 until k; j <- 0 until k) yield {
      val xy = Seq(lit(fields(i)).as("x"), lit(fields(j)).as("y"), corr(i, j).as("corr"))
      if (pValues) struct(xy :+ pValueUdf(corr(i, j), col("__n")).as("p_value"): _*)
      else struct(xy: _*)
    }
    g.select(explode(array(pairs: _*)).as("__e")).select(col("__e.*"))
  }

  /** Per-group Spearman rank correlation — Pearson over average ranks,
    * kept EXACT end to end: ranks ride as DOUBLED average ranks
    * (2·avgRank = 2·cumCount − tieCount + 1, an integer even for tie
    * runs), every moment is an integer sum, and ρ is one fixed double
    * expression over those integers — no quantization mitigation needed
    * anywhere, bit-stable cross-engine.
    *
    * Scale shape: ranks come from the VALUE-COUNT table, not the rows —
    * distinct (group, value) counts, a cumulative-count window over that
    * (per group, value-cardinality-sized — never the corpus), joined back
    * to rows by (group, value), then one moment aggregation. The corpus is
    * scanned twice (count + join-back) and never globally sorted. Integer
    * headroom: Σ(2r)² ≤ 4n³ keeps the sums in a BIGINT for groups up to
    * ~1M rows; beyond that, bucket values first (Spearman over quantile
    * bins) — the statistic is rank-based, so binning is the standard
    * extreme-scale fallback.
    *
    * Null x or y drops the ROW (both ranks must exist). Returns one row
    * per group: (groupCols…, n, sx2, sy2, sxy4, sxx4, syy4, spearman_rho)
    * with ρ = (n·sxy4 − sx2·sy2) / √((n·sxx4 − sx2²)·(n·syy4 − sy2²)) —
    * the doubled-rank scaling cancels. A constant column (zero rank
    * variance) divides by zero and yields IEEE NaN, matching DuckDB. */
  def spearmanCorr(df: DataFrame, groupCols: Seq[String], xCol: String,
                   yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val base = df
      .select(gcols :+ col(xCol).cast(DoubleType).as("__x") :+
        col(yCol).cast(DoubleType).as("__y"): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    // the rank table's keys are RENAMED and joined null-safely: a null
    // GROUP is a real group (cf. mixtureSample) and must keep its ranks
    def rank2(vc: String, out: String): DataFrame = {
      val cnts = base.groupBy(gcols :+ col(vc): _*).agg(count(lit(1)).as("__c"))
      val w = Window.partitionBy(gcols: _*).orderBy(col(vc).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnts.withColumn("__cum", sum(col("__c")).over(w))
        .select(groupCols.map(c => col(c).as(s"__$out$c")) :+
          col(vc).as(s"__v$out") :+
          (lit(2L) * col("__cum") - col("__c") + lit(1L)).as(out): _*)
    }
    def cond(vc: String, out: String) =
      groupCols.map(c => col(c) <=> col(s"__$out$c"))
        .foldLeft(col(vc) === col(s"__v$out"))(_ && _)
    val ranked = base
      .join(rank2("__x", "__rx"), cond("__x", "__rx"))
      .join(rank2("__y", "__ry"), cond("__y", "__ry"))
    val n = col("n").cast(DoubleType)
    ranked.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("sx2"), sum(col("__ry")).as("sy2"),
        sum(col("__rx") * col("__ry")).as("sxy4"),
        sum(col("__rx") * col("__rx")).as("sxx4"),
        sum(col("__ry") * col("__ry")).as("syy4"))
      .withColumn("spearman_rho",
        (n * col("sxy4").cast(DoubleType) -
          col("sx2").cast(DoubleType) * col("sy2").cast(DoubleType)) /
        (sqrt(n * col("sxx4").cast(DoubleType) -
            col("sx2").cast(DoubleType) * col("sx2").cast(DoubleType)) *
         sqrt(n * col("syy4").cast(DoubleType) -
            col("sy2").cast(DoubleType) * col("sy2").cast(DoubleType))))
  }

  /** Per-group midrank quantile normalization — map each value to its
    * empirical CDF position cdf = (2·cumCount − tieCount + 1) / (2·n),
    * the average-rank CDF in (0, 1]. The score-calibration step for
    * mixing heterogeneous quality signals across sources: after
    * normalization every group's column is uniform on its own rank scale,
    * so one global threshold means the same thing in every group
    * (a per-group "keep the top 30%" as a single filter).
    *
    * Same exact integer rank algebra and scale shape as [[spearmanCorr]]:
    * ranks come from the value-count table (per-group value-cardinality-
    * sized window, never a corpus sort), joined back null-safely, and the
    * CDF is ONE IEEE division of integers — bit-stable cross-engine.
    * Rows with a null value are passed through with a null CDF. Appends
    * `out` to the input frame. */
  def midrankNormalize(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, out: String = "cdf"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val vals = df.select(gcols :+ col(valueCol).cast(DoubleType).as("__v"): _*)
      .filter(col("__v").isNotNull)
    val cnts = vals.groupBy(gcols :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(gcols: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(gcols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranks = cnts
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(tot))
      .select(groupCols.map(c => col(c).as(s"__g_$c")) :+ col("__v") :+
        ((lit(2L) * col("__cum") - col("__c") + lit(1L)).cast(DoubleType) /
          (lit(2L) * col("__n")).cast(DoubleType)).as(out): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .foldLeft(col(valueCol).cast(DoubleType) === col("__v"))(_ && _)
    df.join(ranks, cond, "left")
      .drop((groupCols.map(c => s"__g_$c") :+ "__v"): _*)
  }

  /** Covariance matrix, long-form (ref CovarianceProcessor,
    * StatisticsProcessors.scala:189): population covariance from the same
    * single-pass sums. */
  def covarianceMatrix(df: DataFrame, fields: Seq[String]): DataFrame = {
    val k = fields.size
    val g = momentSums(df, fields)
    val n = col("__n").cast(DoubleType)
    val pairs = for (i <- 0 until k; j <- 0 until k) yield
      struct(lit(fields(i)).as("x"), lit(fields(j)).as("y"),
        (ss(i, j) / n - (s(i) / n) * (s(j) / n)).as("covar"))
    g.select(explode(array(pairs: _*)).as("__e")).select(col("__e.*"))
  }
}
