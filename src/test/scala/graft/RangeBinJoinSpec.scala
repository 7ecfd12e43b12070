package graft

import org.apache.spark.sql.functions._

/** RangeBinJoinRule: range θ-joins become binned equality joins when
  * spark.graft.rangeJoin.binWidth is set; results are unchanged. */
class RangeBinJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0L until 500L).map(i => (i, i * 37L % 10000L))
    .toDF("pid", "ts")
  private def intervals = (0L until 40L).map(i => (i, i * 251L % 9000L))
    .map { case (i, s0) => (i, s0, s0 + 800L) }.toDF("iid", "lo", "hi")
  private def q() = points
    .join(intervals, col("ts") >= col("lo") && col("ts") <= col("hi"))
    .select("iid", "pid").orderBy("iid", "pid")

  test("range theta-join rewrites to an equality join under the conf") {
    val offPlan = q().queryExecution.executedPlan.toString
    assert(offPlan.contains("BroadcastNestedLoopJoin"),
      s"expected the native nested-loop baseline:\n$offPlan")
    val expected = q().collect().toSeq
    spark.conf.set("spark.graft.rangeJoin.binWidth", "500")
    try {
      val onPlan = q().queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$onPlan")
      assert(onPlan.contains("HashJoin") || onPlan.contains("SortMergeJoin"),
        s"expected an equality join:\n$onPlan")
      assert(q().collect().toSeq == expected)
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("SQL range joins rewrite identically") {
    points.createOrReplaceTempView("rb_points")
    intervals.createOrReplaceTempView("rb_intervals")
    try {
      val sql = """SELECT iid, pid FROM rb_points p JOIN rb_intervals i
                   ON p.ts >= i.lo AND p.ts <= i.hi ORDER BY iid, pid"""
      val expected = spark.sql(sql).collect().toSeq
      spark.conf.set("spark.graft.rangeJoin.binWidth", "500")
      try {
        val df = spark.sql(sql)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"not rewritten:\n$plan")
        assert(df.collect().toSeq == expected)
      } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
    } finally {
      spark.catalog.dropTempView("rb_points")
      spark.catalog.dropTempView("rb_intervals")
    }
  }

  test("equality joins and extra-conjunct joins are left alone") {
    spark.conf.set("spark.graft.rangeJoin.binWidth", "500")
    try {
      // plain equi-join: no __graft markers may appear
      val eq = points.join(intervals, col("ts") === col("lo"))
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft"))
      // range + extra predicate: not the exact two-conjunct pattern
      val extra = points.join(intervals,
        col("ts") >= col("lo") && col("ts") <= col("hi") && col("pid") =!= col("iid"))
      assert(!extra.queryExecution.optimizedPlan.toString.contains("__graft"))
      // the rewrite also never fires without the conf (checked implicitly
      // by the first test's baseline) — and results here still match
      assert(eq.count() ==
        points.join(intervals, col("ts") === col("lo")).count())
    } finally spark.conf.unset("spark.graft.rangeJoin.binWidth")
  }
}
