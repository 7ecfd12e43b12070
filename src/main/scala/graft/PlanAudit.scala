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
      // materialize THIS QueryExecution first (df.write would build its
      // own): under AQE the plan finalizes — and codegen stages collapse
      // into `*(n)` spans — only after execution; the pre-execution
      // toString shows isFinalPlan=false with no spans and provisional
      // join picks
      val executed =
        try { df.queryExecution.toRdd.foreach(_ => ()); true }
        catch { case e: Throwable => println(s"[audit] $n FAILED: $e"); false }
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val wins = "Window".r.findAllIn(plan).size
      val rdds = "ExistingRDD".r.findAllIn(plan).size
      // codegen renders as `*(n)` operator prefixes in toString (the word
      // "WholeStageCodegen" only appears in formatted-mode explain);
      // distinct span ids = codegen region count
      val wsc = raw"\*\((\d+)\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      println(s"[audit] $n exchanges=$exchanges bhj=$bhj smj=$smj window=$wins rddScan=$rdds codegenSpans=$wsc")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Window"))
        .take(12).map("[audit]   " + _.trim.take(150)).mkString("\n"))
      // hot-path queries must stay inside whole-stage codegen: an
      // interpreted-HOF or non-codegen-Expression regression here would
      // silently multiply the per-row cost at 100 TB — fail the audit.
      // Only assert on plans that actually executed: a failed run leaves
      // the AQE plan non-finalized (0 spans by construction), and the
      // FAILED line above is the real diagnosis
      if (executed && codegenHot(n))
        require(wsc >= 1, s"[audit] $n lost whole-stage codegen (0 spans)")
    }
    spark.stop()
  }

  /** Queries whose hot loop must be codegen'd (dedup sketching, ANN
    * scoring, quality heuristics) — audited with a hard assert. */
  private val codegenHot = Set(
    "dedup_minhash_lsh", "dedup_simhash", "ann_cosine_topk",
    "ann_knn_join_heap", "gopher_repetition", "doc_embedding_pool")
}
