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
