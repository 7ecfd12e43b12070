package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev tool: scale probe for the centroids-as-DATA family
  * (Similarity.ivfAssignJoin / Dedup.semanticDedup): synthesizes an
  * N-copy embeddings corpus (shifted vec_ids, per-copy integer offset on
  * the already-integerized components so copies are distinct but exact)
  * and times assignment + SemDeDup against a k-row centroid table. The
  * input is localCheckpointed first, so the timings exclude synthesis.
  *
  * This answers the question the per-SF bench can't: does the
  * BroadcastHashJoin path stay linear when BOTH the corpus (×N) and the
  * centroid count (k → √N-scale) grow — i.e. the claim that k rides as
  * data and never re-enters an expression tree. Results are recorded in
  * SCALE.md §"centroids-as-data at 10×".
  *
  * Run: sbt "runMain graft.ScaleProbe [sfDir] [copies] [k] [reps]" */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(25)
    val k = args.lift(2).map(_.toInt).getOrElse(256)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e0 = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding").cast(ArrayType(DoubleType)),
          x => floor(x * 1e6)).cast(ArrayType(DoubleType)).as("q"))
    val n0 = e0.count()
    val e = (0 until copies).map { c =>
      e0.select((col("vec_id") + lit(c * n0)).as("vec_id"),
        transform(col("q"), x => x + lit(c.toDouble)).as("q"))
    }.reduce(_ unionByName _)
      .repartition(cpus.toInt * 2, col("vec_id"))
      .localCheckpoint()
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("centroid_id"),
        col("q").as("centroid"))
      .localCheckpoint()
    println(s"[probe] corpus=${e.count()} vectors, k=${cents.count()} centroids")

    // operators localCheckpoint their slim intermediates; keep the probe's
    // own inputs but drop those between reps or they accumulate across
    // repetitions and the later reps measure GC pressure, not the plan
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => keep(id) }
          .values.foreach(_.unpersist(true))
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[probe] $label%s copies=$copies k=$k " +
        f"runs=${times.map(t => f"$t%.2f").mkString(",")} median=$med%.2f")
    }

    time("ivf_assign_join") {
      graft.operators.Similarity.ivfAssignJoin(e, "vec_id", "q", cents)
    }
    time("semantic_dedup_join") {
      graft.operators.Dedup.semanticDedup(e, "vec_id", "q", cents, tau = 0.4,
        "centroid_id", "centroid")
    }
    spark.stop()
  }
}

/** Dev tool: KLL quantile-sketch scale probe — measures, at sf0.1 ×
  * {1, 4, 10} copies, (a) the max retained per-group sample size and
  * (b) the wall-time of the full sketch + extraction. The claim under
  * test is the operator's 100 TB contract: per-group state is
  * O(k·log(n/k)) at EVERY stage — the state column must grow by at most
  * a couple of compaction LEVELS (log₂ of the copy factor) while the
  * input grows 10×, and wall-time must stay ~linear in rows (scan-bound,
  * no corpus sort/window). Results go in SCALE.md §"quantile sketch
  * state plateau".
  *
  * Run: sbt "runMain graft.QuantileProbe [sfDir] [k] [reps]" */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d0 = Tables.read(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
      .select(col("source"), length(col("text")).cast(DoubleType).as("v"))
    for (copies <- Seq(1, 4, 10)) {
      // per-copy epsilon keeps values distinct so compaction can't cheat
      // by collapsing exact duplicates it would not see in real data
      val d = (0 until copies).map(c =>
          d0.select(col("source"), (col("v") + lit(c * 1e-3)).as("v")))
        .reduce(_ unionByName _)
        .repartition(cpus.toInt * 2)
        .localCheckpoint()
      val n = d.count()
      val sk = graft.operators.Sketch.quantileSketch(d, Seq("source"), col("v"), k = k)
      val maxState = sk.select(max(size(col("qsk")))).head.getInt(0)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Sketch.sketchQuantiles(
            graft.operators.Sketch.quantileSketch(d, Seq("source"), col("v"), k = k),
            "qsk", Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(times.size / 2)
      println(f"[probe] quantile_sketch copies=$copies rows=$n k=$k " +
        f"maxStateRows=$maxState runs=${times.map(t => f"$t%.2f").mkString(",")} " +
        f"median=$med%.2f")
    }
    spark.stop()
  }
}
