package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries N times each and report every run + median —
  * the box is CPU-noisy, so only medians are comparable run-to-run.
  * Run: sbt "runMain graft.TimeQuery <sfDir> <reps> <query...>" */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r16: no base-table cache (mirror the bench's re-baselined protocol —
    // timed reps scan parquet). Warm each query once untimed instead
    // (JIT/codegen), and clear leaked operator-internal caches between
    // reps exactly like the bench does.
    val all = SparkEntry.queries
    for (n <- names; fn <- all.get(n)) {
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[time] $n%s runs=${times.map(t => f"$t%.2f").mkString(",")} median=$med%.2f")
    }
    spark.stop()
  }
}
