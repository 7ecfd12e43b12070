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

  test("z-ordered parquet layout prunes row groups under a 2-predicate range scan") {
    implicit val s = spark
    // 128×128 grid written two ways into 16 files (one row group each):
    // z-clustered, and round-robin (the no-layout baseline). A 16×16
    // corner box predicate must be answerable from a couple of z-files,
    // while every round-robin file straddles the full domain.
    val n = 128L
    val grid = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val zDir = s"$base/z"; val rrDir = s"$base/rr"
    Layout.clusterByZorder(grid, Seq((col("x"), 0L, n - 1), (col("y"), 0L, n - 1)),
        numFiles = 16, bits = 7)
      .drop("__zkey").write.parquet(zDir)
    grid.repartition(16).write.parquet(rrDir)

    // footer-stats view: the row groups a min/max-pruning reader must read
    val preds = Map("x" -> (0L, 15L), "y" -> (0L, 15L))
    val (zRead, zTotal) = Layout.scannedRowGroups(spark, zDir, preds)
    val (rrRead, rrTotal) = Layout.scannedRowGroups(spark, rrDir, preds)
    assert(zTotal == 16 && rrTotal == 16, s"z=$zTotal rr=$rrTotal")
    assert(zRead <= 3, s"z-layout should confine the box to ~1 file, read $zRead")
    assert(rrRead == 16, s"round-robin must straddle everything, read $rrRead")

    // Spark's own scan agrees: parquet row-group pushdown returns far
    // fewer rows from the clustered layout for the identical query
    def scanRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir)
        .filter(col("x").between(0, 15) && col("y").between(0, 15))
      // execute THIS dataframe (count() would build and run a different
      // plan, leaving q's scan metrics empty)
      val res = q.collect().length.toLong
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case o => o.children.flatMap(scans)
      }
      (res, scans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum)
    }
    val (zRes, zScan) = scanRows(zDir)
    val (rrRes, rrScan) = scanRows(rrDir)
    assert(zRes == 256L && rrRes == 256L)
    assert(rrScan >= n * n, s"round-robin scan should read everything, got $rrScan")
    assert(zScan * 4 <= rrScan, s"clustered scan read $zScan vs $rrScan — no pruning?")
  }
}
