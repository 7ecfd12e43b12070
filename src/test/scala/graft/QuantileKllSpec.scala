package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** KLL quantile sketch (`qsketch` / plans.QuantileKll): exact-regime
  * multiset identity, partition invariance, weight conservation, merge
  * path equivalence, compaction-regime state + rank-error bounds, null
  * handling, k guard, plan shape. */
class QuantileKllSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  /** Lower quantile at rank ceil(p·n) over an exact multiset. */
  private def exactQ(vs: Seq[Double], p: Double): Double = {
    val s = vs.sorted
    s((math.ceil(p * s.length) - 1).toInt.max(0))
  }

  test("exact regime: sketch IS the sorted multiset at weight 1, partition-invariant") {
    val vs = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 3.0) // dups retained
    def sk(parts: Int) = Sketch
      .quantileSketch(vs.map(v => ("g", v)).toDF("g", "v").repartition(parts),
        Seq("g"), col("v"), k = 8)
      .select("qsk").collect()(0).getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    val one = sk(1)
    assert(one == vs.sorted.map((_, 1L)))
    assert(sk(7) == one) // multiset property: any partitioning, same sample
  }

  test("sketchQuantiles matches exact order statistics in the exact regime") {
    val vs = (1 to 200).map(i => ((i * 37) % 101).toDouble)
    val df = vs.zipWithIndex.map { case (v, i) => (s"g${i % 3}", v) }.toDF("g", "v")
    val got = Sketch.sketchQuantiles(
        Sketch.quantileSketch(df, Seq("g"), col("v"), k = 256), "qsk", ps)
      .orderBy("g").collect()
    val byG = vs.zipWithIndex.groupBy { case (_, i) => s"g${i % 3}" }
    got.foreach { r =>
      val g = r.getString(0)
      val mine = byG(g).map(_._1)
      assert(r.getLong(r.fieldIndex("n")) == mine.length)
      ps.foreach { case (name, p) =>
        assert(r.getDouble(r.fieldIndex(name)) == exactQ(mine, p),
          s"$g $name")
      }
    }
  }

  test("mergedQuantiles over shard sketches equals the unsharded extraction") {
    val df = (0 until 300)
      .map(i => (s"g${i % 2}", i % 5, ((i * 53) % 997).toDouble))
      .toDF("g", "shard", "v")
    val whole = Sketch.sketchQuantiles(
        Sketch.quantileSketch(df, Seq("g"), col("v"), k = 512), "qsk", ps)
      .select("g", "n", "p50", "p90", "p99").orderBy("g").collect().toSeq
    val merged = Sketch.mergedQuantiles(
        Sketch.quantileSketch(df, Seq("g", "shard"), col("v"), k = 512),
        Seq("g"), "qsk", ps)
      .select("g", "n", "p50", "p90", "p99").orderBy("g").collect().toSeq
    assert(whole.nonEmpty && merged == whole)
  }

  test("compaction regime: bounded state, conserved weight, bounded rank error") {
    val n = 10000
    val k = 64
    // deterministic shuffle of 0..n-1 so ranks are readable off values
    val vs = (0 until n).map(i => ((i.toLong * 48271) % n).toDouble)
    val df = vs.map(("g", _)).toDF("g", "v").repartition(4)
    val sk = Sketch.quantileSketch(df, Seq("g"), col("v"), k = k)
    val sample = sk.select("qsk").collect()(0).getSeq[Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    // state: ≤ k+1 per level, ~log2(n/k)+2 levels — far below n
    val levels = math.ceil(math.log(n.toDouble / k) / math.log(2)).toInt + 2
    assert(sample.length <= (k + 1) * levels,
      s"retained ${sample.length} of $n")
    assert(sample.length < n / 10)
    assert(sample.map(_._2).sum == n) // odd-leftover rule conserves weight
    val got = Sketch.sketchQuantiles(sk, "qsk", ps).collect()(0)
    assert(got.getLong(got.fieldIndex("n")) == n)
    ps.foreach { case (name, p) =>
      // value ≈ rank by construction; each level-i compaction moves any
      // rank by ≤ 2^i — empirically well inside 5% of n for k=64
      val err = math.abs(got.getDouble(got.fieldIndex(name)) - exactQ(vs, p))
      assert(err <= 0.05 * n, s"$name off by $err")
    }
  }

  test("nulls are skipped; an all-null group yields empty sketch and null quantiles") {
    val df = Seq(("a", Some(2.0)), ("a", None), ("a", Some(4.0)), ("b", None))
      .toDF("g", "v")
    val out = Sketch.sketchQuantiles(
        Sketch.quantileSketch(df, Seq("g"), col("v"), k = 8), "qsk", ps)
      .orderBy("g").collect()
    assert(out(0).getLong(out(0).fieldIndex("n")) == 2L)
    assert(out(0).getDouble(out(0).fieldIndex("p50")) == 2.0)
    assert(out(1).getLong(out(1).fieldIndex("n")) == 0L)
    assert(out(1).isNullAt(out(1).fieldIndex("p50")))
  }

  test("serialize/deserialize round-trips multi-level state") {
    val agg = plans.QuantileKll(
      org.apache.spark.sql.catalyst.expressions.Literal(0.0), k = 8)
    val st = agg.createAggregationBuffer()
    st.levels(0) ++= Seq(3.0, 1.0)
    st.levels += scala.collection.mutable.ArrayBuffer(7.0)
    st.levels += scala.collection.mutable.ArrayBuffer(2.0, 9.0)
    val back = agg.deserialize(agg.serialize(st))
    assert(back.levels.map(_.toSeq) == st.levels.map(_.toSeq))
  }

  test("qsketch rejects k < 8 and non-literal k") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[Exception] {
      df.groupBy("g").agg(expr("qsketch(v, 4)")).collect()
    }
    intercept[Exception] {
      spark.sql("SELECT qsketch(1.0, NULL)").collect()
    }
  }

  test("streamingQuantiles: cross-batch KLL fold equals batch order statistics") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Double)]
    val out = graft.streaming.Streams.streamingQuantiles(
      in.toDF.toDF("grp", "v"), "grp", "v", k = 64)
    val q = out.writeStream.format("memory").queryName("squant")
      .outputMode("update").start()
    val b1 = (1 to 30).map(i => ("g", i.toDouble))
    val b2 = (31 to 50).map(i => ("g", i.toDouble)) :+ (("h", 7.0))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM squant").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      val fin = rows.groupBy(_._1).map { case (g, rs) => g -> rs.maxBy(_._2) }
      // exact regime (50 ≤ k): the fold across the batch boundary answers
      // the same ceil(p·n) order statistics as the batch extractor
      val all = (b1 ++ b2).filter(_._1 == "g").map(_._2)
      assert(fin("g") == (("g", 50L, exactQ(all, 0.5), exactQ(all, 0.9), exactQ(all, 0.99))))
      assert(fin("h") == (("h", 1L, 7.0, 7.0, 7.0)))
      // first-batch emission answered b1's order statistics, not a prefix guess
      val firstG = rows.filter(r => r._1 == "g" && r._2 == 30L)
      assert(firstG.nonEmpty && firstG.head._3 == exactQ(b1.map(_._2), 0.5))
    } finally q.stop()
  }

  test("streamingQuantiles compaction regime: n exact across batches, error bounded") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val n = 4000
    val in = MemoryStream[(String, Double)]
    val out = graft.streaming.Streams.streamingQuantiles(
      in.toDF.toDF("grp", "v"), "grp", "v", k = 32)
    val q = out.writeStream.format("memory").queryName("squantc")
      .outputMode("update").start()
    try {
      val vs = (0 until n).map(i => ("g", ((i.toLong * 48271) % n).toDouble))
      in.addData(vs.take(n / 2): _*); q.processAllAvailable()
      in.addData(vs.drop(n / 2): _*); q.processAllAvailable()
      val fin = spark.sql("SELECT * FROM squantc").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)
      assert(fin._1 == n) // weight conservation survives the state round-trip
      assert(math.abs(fin._2 - exactQ(vs.map(_._2), 0.5)) <= 0.05 * n)
    } finally q.stop()
  }

  test("adversarial distributions at n >> k stay inside the deterministic-compactor envelope") {
    // The classic adversaries for a deterministic even-index compactor:
    // sorted-ascending input (every compaction drops from the same flank),
    // reverse-sorted, and heavy-duplicate (one value owns half the mass,
    // so compaction keeps collapsing equal items). Documented envelope:
    // each level-i compaction moves any rank by ≤ 2^i and level i sees
    // ≤ n/(k·2^i) compactions, so total rank error is O(n·log₂(n/k)/k);
    // asserted here with constant 1 — and with the same weight
    // conservation and state bound as the shuffled case, since neither
    // depends on the input order.
    val n = 20000
    val k = 64
    val envelope = n.toDouble * (math.log(n.toDouble / k) / math.log(2)) / k
    val cases: Seq[(String, Seq[Double])] = Seq(
      "sorted-ascending" -> (0 until n).map(_.toDouble),
      "reverse-sorted" -> (0 until n).map(i => (n - 1 - i).toDouble),
      "heavy-duplicate" -> (0 until n).map(i =>
        if (i % 2 == 0) (n / 2).toDouble else ((i.toLong * 48271) % n).toDouble))
    cases.foreach { case (label, vs) =>
      // single partition: preserves the adversarial arrival order end-to-end
      val sk = Sketch.quantileSketch(
        vs.map(("g", _)).toDF("g", "v").coalesce(1), Seq("g"), col("v"), k = k)
      val sample = sk.select("qsk").collect()(0).getSeq[Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      val levels = math.ceil(math.log(n.toDouble / k) / math.log(2)).toInt + 2
      assert(sample.length <= (k + 1) * levels, s"$label state ${sample.length}")
      assert(sample.map(_._2).sum == n, s"$label weight")
      val got = Sketch.sketchQuantiles(sk, "qsk", ps).collect()(0)
      assert(got.getLong(got.fieldIndex("n")) == n, label)
      ps.foreach { case (name, p) =>
        val est = got.getDouble(got.fieldIndex(name))
        // rank error via the true multiset: |#{v < est} .. #{v <= est}|
        // straddles the realized rank, so distance from ceil(p·n) to the
        // nearest edge of that interval is the exact rank displacement
        val target = math.ceil(p * n)
        val lo = vs.count(_ < est)
        val hi = vs.count(_ <= est)
        val rankErr =
          if (target < lo) lo - target else if (target > hi) target - hi else 0.0
        assert(rankErr <= envelope,
          s"$label $name rank error $rankErr > envelope $envelope")
      }
    }
  }

  test("plan shape: one ObjectHashAggregate pair, no Window, no Sort of the input") {
    val df = (0 until 100).map(i => (s"g${i % 4}", i.toDouble)).toDF("g", "v")
    val plan = Sketch.sketchQuantiles(
        Sketch.quantileSketch(df, Seq("g"), col("v"), k = 256), "qsk", ps)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort"), plan)
  }
}
