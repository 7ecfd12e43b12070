package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool (r14): stage-level timing for winnowFingerprints. The
  * "posexplode"/"window-min" stages here use the PLAIN posexplode on
  * purpose — they reproduce the InferFiltersFromGenerate pathology the
  * operator had (the inferred `size(__sh) > 0` filter is pushed below the
  * projects with the md5 token-transform inlined per element_at, ~300 md5
  * per gram; 58 s at sf0.1): compare them against "full-op", which uses
  * the fixed posexplode_outer shape (~1 s).
  * Run: sbt "runMain graft.WinnowProbe [sfDir]" */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val d = Tables.read(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    d.cache(); d.count()
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[wprobe] $label%-18s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val B = Dedup.WinnowPosBound
    val th = d.withColumn("__th", Dedup.tokenHashes(col("text")))
    val sh = th.withColumn("__sh", Dedup.posShingleHashes(col("__th"), 3))
    val grams = sh.select(col("doc_id"), size(col("__sh")).as("__ng"),
      posexplode(col("__sh")).as(Seq("__p", "__h")))
    time("tokenHashes")(th.select(col("doc_id"), size(col("__th")).as("n")))
    time("shingles")(sh.select(col("doc_id"), size(col("__sh")).as("n")))
    time("posexplode")(grams)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__p"))
      .rowsBetween(-3, org.apache.spark.sql.expressions.Window.currentRow)
    val keyed = grams.withColumn("__key", col("__h") * B + (lit(B - 1) - col("__p")))
      .withColumn("__mk", min(col("__key")).over(win))
    time("window-min")(keyed)
    time("full-op")(Dedup.winnowFingerprints(d, "doc_id", "text", 3, 4))
    val full = Dedup.winnowFingerprints(d, "doc_id", "text", 3, 4)
    for ((label, plan) <- Seq(
        "grams.optimized" -> grams.queryExecution.optimizedPlan.toString,
        "full.optimized" -> full.queryExecution.optimizedPlan.toString,
        "full.executed" -> full.queryExecution.executedPlan.toString)) {
      val md5s = "md5".r.findAllIn(plan).size
      val tfs = "transform".r.findAllIn(plan).size
      val lens = plan.length
      println(s"[wprobe] $label md5=$md5s transform=$tfs chars=$lens")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/wplan_$label.txt"), plan)
    }
    spark.stop()
  }
}
