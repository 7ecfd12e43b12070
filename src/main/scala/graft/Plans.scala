package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints formatted physical plans for selected queries so
  * scan pushdown (PushedFilters/ReadSchema), join strategies (broadcast vs
  * SMJ), and WholeStageCodegen spans can be audited per SURVEY.md §4. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet else
      Set("packet_filter", "join_inner", "join_broadcast", "agg_by_value", "ann_cosine_topk")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => names.contains(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
