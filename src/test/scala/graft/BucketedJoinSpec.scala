package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides bucketed on the join key eliminate
  * the shuffle entirely — the repeated-join scale path (SCALE.md §Joins). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without Exchange") {
    // warehouse dir is a static conf — use the session default (spark-warehouse
    // under the test working dir); tables are dropped in the finally block
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "rv")
    left.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_left")
    right.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_right")
    try {
      // disable auto-broadcast so the shuffle-free plan is attributable to bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("intervalJoin equals the native range theta-join") {
    import graft.engine.Ops
    val points = (0L until 500L).map(i => (i, i * 37L % 10000L))
      .toDF("pid", "ts")
    val intervals = (0L until 40L).map(i => (i, i * 251L % 9000L))
      .map { case (i, s0) => (i, s0, s0 + 800L) }
      .toDF("iid", "lo", "hi")
    val binned = Ops.intervalJoin(points, "ts", intervals, "lo", "hi",
        binWidth = 500L)
      .select("iid", "pid").orderBy("iid", "pid").collect()
    val naive = points.join(intervals,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("iid", "pid").orderBy("iid", "pid").collect()
    assert(binned.nonEmpty && binned.toSeq == naive.toSeq)
  }

  test("intervalJoin plans as an equality join, not BroadcastNestedLoop") {
    import graft.engine.Ops
    val points = (0L until 100L).map(i => (i, i * 13L)).toDF("pid", "ts")
    val intervals = (0L until 10L).map(i => (i, i * 100L, i * 100L + 90L))
      .toDF("iid", "lo", "hi")
    val plan = Ops.intervalJoin(points, "ts", intervals, "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to nested loop:\n$plan")
    // the bin key must be the equality join key
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/SMJ equality join:\n$plan")
  }
}
