package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table readers for the driver fixtures.
  *
  * `events.parquet` stores TIMESTAMP(NANOS) which Spark's vectorized reader
  * rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  * SparkEntry.tune) it reads as a nanos LongType which we convert to a real
  * microsecond timestamp with integer arithmetic (`div` — a double division
  * would lose precision: 2024 epoch-nanos ≈ 1.7e18 > 2^53). */
object Tables {
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
