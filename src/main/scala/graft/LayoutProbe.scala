package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: measure what the Z-order layout actually buys a
  * stats-pruning scan on REAL data (SCALE.md §"z-order layout"). Writes
  * lineitem three ways — z-clustered on (l_partkey, l_suppkey),
  * single-dimension sorted on l_partkey, and round-robin — then runs a
  * 2-predicate range box and a suppkey-only band, reporting for each
  * layout (a) row groups a min/max-pruning reader must read (parquet
  * footer stats via Layout.rowGroupStats) and (b) the rows Spark's own
  * parquet scan returned (row-group pushdown). The single-sort baseline
  * is the honest comparison: it wins one dimension, the Morton key wins
  * both.
  *
  * Run: sbt "runMain graft.LayoutProbe [sfDir] [numFiles]" */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.read(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val ranges = graft.operators.Layout.statsRanges(
      li, Seq(col("l_partkey"), col("l_suppkey")))
    val Seq((_, pLo, pHi), (_, sLo, sHi)) = ranges
    println(s"[layout] ranges: l_partkey [$pLo,$pHi] l_suppkey [$sLo,$sHi]")

    val base = java.nio.file.Files.createTempDirectory("graft_layout_probe").toString
    val dirs = Map(
      "zorder" -> s"$base/z", "sort1d" -> s"$base/s", "roundrobin" -> s"$base/rr")
    graft.operators.Layout.clusterByZorder(li, ranges, numFiles)
      .drop("__zkey").write.parquet(dirs("zorder"))
    li.repartitionByRange(numFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey").write.parquet(dirs("sort1d"))
    li.repartition(numFiles).write.parquet(dirs("roundrobin"))

    // a ~5% box in each dimension, centered
    def box(lo: Long, hi: Long): (Long, Long) = {
      val mid = (lo + hi) / 2; val half = math.max(1L, (hi - lo) / 40)
      (mid - half, mid + half)
    }
    val (pa, pb) = box(pLo, pHi)
    val (sa, sb) = box(sLo, sHi)
    val queries = Seq(
      "both-dims box" -> Map("l_partkey" -> (pa, pb), "l_suppkey" -> (sa, sb)),
      "suppkey-only band" -> Map("l_suppkey" -> (sa, sb)))

    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    for ((qname, preds) <- queries; (lname, dir) <- dirs.toSeq.sortBy(_._1)) {
      val (read, total) = graft.operators.Layout.scannedRowGroups(spark, dir, preds)
      val q = preds.foldLeft(spark.read.parquet(dir): DataFrame) {
        case (d, (c, (lo, hi))) => d.filter(col(c).between(lo, hi))
      }
      val res = q.collect().length
      val scanned = scans(q.queryExecution.executedPlan)
        .map(_.metrics("numOutputRows").value).sum
      println(f"[layout] $qname%-18s $lname%-10s rowgroups=$read%d/$total%d " +
        f"scanRows=$scanned%d resultRows=$res%d")
    }
    spark.stop()
  }
}
