package graft
import org.apache.spark.sql.SparkSession
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.queryExecution.toRdd.foreach(_ => ())
    val p = df.queryExecution.executedPlan.toString
    java.nio.file.Files.write(java.nio.file.Paths.get(args(1)), p.getBytes)
    spark.stop()
  }
}
