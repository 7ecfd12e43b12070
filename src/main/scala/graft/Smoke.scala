package graft

import org.apache.spark.sql.SparkSession

/** Smoke main mirroring the driver's t1 check: SparkEntry.entry rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry schema: ${df.schema.simpleString}")
    rows.foreach(r => println(s"[smoke] $r"))
    println(s"[smoke] rows=${rows.length} ${if (rows.nonEmpty) "OK" else "FAIL"}")
    spark.stop()
  }
}
