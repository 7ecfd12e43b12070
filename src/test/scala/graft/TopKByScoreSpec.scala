package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** TopKByScore bounded-heap aggregate: window-equivalence + plan shape. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 40L)
    .map(i => (i, Seq((i % 7).toDouble, (i % 5).toDouble, 1.0)))
    .toDF("id", "v")

  test("knnJoinHeap equals knnJoinExact bit-for-bit") {
    val a = Similarity.knnJoinExact(vecs, "id", "v", k = 4)
      .orderBy("id", "rank").collect().toSeq
    val b = Similarity.knnJoinHeap(vecs, "id", "v", k = 4)
      .orderBy("id", "rank").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("heap path plans without Window or Sort before the aggregate") {
    val plan = Similarity.knnJoinHeap(vecs, "id", "v", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object agg:\n$plan")
    // the window form, for contrast, sorts the full candidate stream
    val winPlan = Similarity.knnJoinExact(vecs, "id", "v", k = 4)
      .queryExecution.executedPlan.toString
    assert(winPlan.contains("Window"))
  }

  test("topk_by SQL function: dedup of exact duplicates, null skip, ties") {
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 10L), // exact duplicate collapses
      (1L, 0.9, 9L),                  // tie score → smaller id ranks first
      (1L, 0.5, 11L), (1L, 0.1, 12L),
      (2L, 0.7, 20L)
    ).toDF("g", "s", "i")
      .unionByName(Seq((2L, null.asInstanceOf[java.lang.Double], 21L))
        .toDF("g", "s", "i"))
    val out = df.groupBy("g")
      .agg(expr("topk_by(s, i, 3)").as("tk"))
      .select(col("g"), expr("transform(tk, x -> x.id)").as("ids"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) == Seq(9L, 10L, 11L))
    assert(out(1).getSeq[Long](1) == Seq(20L)) // null score skipped
  }
}
