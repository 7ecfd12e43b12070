package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from:
  *  - [[QueriesCore]]: the reference's operator inventory (SURVEY.md §2)
  *  - [[QueriesLLM]]: training-data-pipeline extras (dedup, similarity,
  *    text analysis, multimodal)
  */
object SparkEntry {

  /** Session defaults applied by Verify/Bench/tests: reference semantics are
    * lenient (no ANSI errors), AQE re-plans shuffles at runtime. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // Harness-regime sizing, NOT production values: the SF test tables are
    // single ~1-10 MB parquet files, which the 128 MB default maps to ONE
    // scan task regardless of core count — and the scan stage is where the
    // per-row-heavy phase of every text operator (tokenize/hash/explode)
    // runs (measured: all of gopher_repetition's explode pipeline on one
    // core, 5+ s single-threaded). Likewise the 64 MB AQE advisory
    // coalesces every small-SF shuffle back to 1-2 tasks. These three
    // shrink both to the MB regime so local[32] actually uses its cores; a
    // cluster run against TB-scale inputs must use the defaults (tune() is
    // the test-harness contract, not a deployment profile — 256 KB splits
    // on 100 TB would mean 4e8 tasks).
    .config("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
    .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (512 * 1024).toString)
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      (64 * 1024).toString)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * filter → groupBy-agg (AggregateByValue) → sort, the §7.3 slice. */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    engine.Ops.filter(li, "${l_quantity} > 5")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (QueriesCore.queries ++ QueriesExtra.queries ++ QueriesLLM.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    (QueriesCore.oracleSql ++ QueriesExtra.oracleSql ++ QueriesLLM.oracleSql).toMap
}
