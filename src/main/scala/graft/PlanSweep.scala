package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FilterExec

/** Dev tool (r14): sweep EVERY query's final physical plan for the
  * expression-re-inlining pathology class the winnowing fix exposed —
  * a Filter (usually inferred by InferFiltersFromGenerate and pushed
  * through projects) whose condition contains a higher-order function
  * over an expensive leaf (md5/conv), which re-evaluates a whole
  * computed array per row or per element. Prints one line per flagged
  * query; silence = clean sweep.
  *
  * Run: sbt "runMain graft.PlanSweep [sfDir]" */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.foreach(_ => ()) // finalize under AQE
        // walk the FINAL plan tree (not toString: it truncates long
        // expressions and appends an Initial Plan duplicate)
        val finals = df.queryExecution.executedPlan.collect {
          case f: FilterExec => f.condition.toString
        }
        val bad = finals.filter(c =>
          (c.contains("md5") || c.contains("conv(")) &&
            (c.contains("transform(") || c.contains("element_at(")))
        if (bad.nonEmpty) {
          flagged += 1
          println(s"[sweep] FLAG $name: filter re-evaluates an expensive " +
            s"HOF chain (${bad.head.take(160)}...)")
        }
      } catch {
        case e: Throwable =>
          println(s"[sweep] ERR $name: ${Option(e.getMessage).getOrElse(e).toString.take(100)}")
      }
    }
    println(s"[sweep] done: $flagged flagged of ${SparkEntry.queries.size} queries")
    spark.stop()
  }
}
