package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan summaries for selected queries so shuffle
  * counts, broadcast joins, and codegen coverage can be eyeballed per round.
  * Run: sbt "runMain graft.PlanAudit [sfDir] [query...]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "drop_processor", "running_count", "size_buffer", "dedup_minhash_lsh",
      "pmi", "ar2_fit", "json_merge")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries
    for (n <- names; fn <- all.get(n)) {
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val wins = "Window".r.findAllIn(plan).size
      val rdds = "ExistingRDD".r.findAllIn(plan).size
      val wsc = "WholeStageCodegen".r.findAllIn(plan).size
      println(s"[audit] $n exchanges=$exchanges bhj=$bhj smj=$smj window=$wins rddScan=$rdds codegenSpans=$wsc")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
        .take(12).map("[audit]   " + _.trim.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
