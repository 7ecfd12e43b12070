package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout clustering: Morton key bit-exactness and the locality
  * property the write path exists for. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("mortonKey interleaves bits exactly (hand-computed vectors)") {
    // x=3 (011), y=5 (101), x owns even bit positions: z = 100111 = 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.mortonKey(Seq(col("x"), col("y")), bits = 3))
      .as[Long].head()
    assert(out == 39L)
    // single dimension degenerates to the identity
    val id = Seq(6L).toDF("x")
      .select(Layout.mortonKey(Seq(col("x")), bits = 3)).as[Long].head()
    assert(id == 6L)
    // three dimensions: (1,1,1) at bits=1 → 0b111
    val d3 = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(Layout.mortonKey(Seq(col("a"), col("b"), col("c")), bits = 1))
      .as[Long].head()
    assert(d3 == 7L)
  }

  test("zorderRank clamps and scales exactly") {
    val d = Seq(-5L, 0L, 50L, 100L, 999L).toDF("v")
      .select(col("v"), Layout.zorderRank(col("v"), 0L, 100L, bits = 4).as("r"))
      .as[(Long, Long)].collect().toMap
    assert(d(-5L) == 0L && d(0L) == 0L)     // below-range clamps to 0
    assert(d(100L) == 15L && d(999L) == 15L) // above-range clamps to top
    assert(d(50L) == (50L * 15L) / 100L)     // exact integer scale
  }

  test("prefixRank preserves order on alpha prefixes and pads short strings") {
    val d = Seq("alpha", "alps", "beta", "a", "", "zz9").toDF("s")
      .select(col("s"), Layout.prefixRank(col("s"), bits = 20).as("r"))
      .as[(String, Long)].collect().toMap
    // 4-char prefix, 5 bits each: lexicographic on [a-z] prefixes
    assert(d("") < d("a") && d("a") < d("alpha"))
    assert(d("alpha") < d("alps") && d("alps") < d("beta"))
    // same 4-char prefix ties (only the prefix ranks)
    val same = Seq("alphabet", "alphanumeric").toDF("s")
      .select(Layout.prefixRank(col("s"), bits = 20)).as[Long].collect()
    assert(same(0) == same(1))
    // exact code check: "a" -> [1,0,0,0] over 5-bit slots
    assert(d("a") == (1L << 15))
    // non-letter chars rank after z (documented heuristic)
    val zz = Seq(("zz9", "zzz")).toDF("x", "y")
      .select(Layout.prefixRank(col("x"), 20).as("rx"),
        Layout.prefixRank(col("y"), 20).as("ry"))
      .as[(Long, Long)].head()
    assert(zz._1 > zz._2)
  }

  test("statsRanges: one-pass min/max with degenerate and null columns widened") {
    val d = Seq((1L, 7L, Option.empty[Long]), (5L, 7L, None), (3L, 7L, None))
      .toDF("a", "b", "c")
    val r = Layout.statsRanges(d, Seq(col("a"), col("b"), col("c")))
    assert(r(0)._2 == 1L && r(0)._3 == 5L)
    assert(r(1)._2 == 7L && r(1)._3 == 8L, "constant column widens by one")
    assert(r(2)._2 == 0L && r(2)._3 == 1L, "all-null column gets a unit range")
    // the triples drop straight into the key
    val keyed = d.select(Layout.zorderKey(r, bits = 8)).collect()
    assert(keyed.length == 3)
  }

  test("clusterByZorder groups 2-D-near rows into the same range bucket") {
    implicit val s = spark
    // a 32×32 grid: after z-ordering into 16 range buckets, each bucket
    // holds a spatially-compact blob — so per-bucket min/max spans of BOTH
    // x and y are far tighter than a row-major layout's y span
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val clustered = Layout.clusterByZorder(grid,
      Seq((col("x"), 0L, 31L), (col("y"), 0L, 31L)), numFiles = 16, bits = 5)
    val spans = clustered
      .withColumn("part", spark_partition_id())
      .groupBy("part")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum == 1024L)
    // every bucket's 2-D bounding box is a fraction of the 31-wide domain:
    // 1024 rows / 16 buckets = 64 cells ≈ an 8×8 z-square (span ≤ 15 allows
    // for range-boundary sampling slop; row-major would give sy = 31)
    val bad = spans.filter(r => r.getAs[Long]("sx") > 15 || r.getAs[Long]("sy") > 15)
    assert(bad.isEmpty, s"loose buckets: ${bad.mkString(", ")}")
  }
}
