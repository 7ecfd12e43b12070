package graft

// scratch profiling main for gopher_repetition stages — NOT committed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, TextAnalysis}

object GopherProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_x10")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label rows=$n time=${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    val d0 = Tables.read(spark, dir, "documents")
    val n = math.max(32, (d0.count() / 200).toInt)
    val df = d0.repartition(n, col("doc_id"))
    val staged = df.select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("__tot",
        aggregate(col("__toks"), lit(0L), (a, x) => a + length(x)) +
          size(col("__toks")) - 1)
    t("tokenize+tot")(staged.count())
    val PACK = 1L << 20
    val ex = staged.select(col("id"), col("__tot"),
      posexplode(col("__toks")).as(Seq("pos", "t")))
      .select(col("id"), col("__tot"), col("pos"),
        ((TextAnalysis.tokenHash(col("t")) % Dedup.P) * PACK +
          least(length(col("t")).cast(LongType), lit(PACK - 1))).as("p0"))
    t("explode+hash")(ex.count())
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val maxN = 10
    val withLeads = ex.select(col("id") +: col("__tot") +: col("p0") +:
      (1 until maxN).map(k => lead(col("p0"), k).over(w).as(s"p$k")): _*)
    t("window leads")(withLeads.count())
    def h(k: Int) = shiftright(col(s"p$k"), 20)
    def l(k: Int) = col(s"p$k").bitwiseAND(PACK - 1)
    val ghash = scala.collection.mutable.Map(1 -> h(0))
    val glen = scala.collection.mutable.Map(1 -> l(0))
    for (nn <- 2 to maxN) {
      ghash(nn) = (ghash(nn - 1) * 131 + h(nn - 1)) % Dedup.P
      glen(nn) = glen(nn - 1) + l(nn - 1)
    }
    val gramStructs = ((2 to 4) ++ (5 to 10)).map { nn =>
      struct(lit(nn).as("n"), ghash(nn).as("gh"), (glen(nn) + (nn - 1)).as("gl"))
    }
    val exploded = withLeads
      .select(col("id"), col("__tot"), explode(array(gramStructs: _*)).as("s"))
      .filter(col("s.gh").isNotNull)
      .select(col("id"), col("__tot"), col("s.n").as("n"),
        col("s.gh").as("gh"), col("s.gl").as("gl"))
    t("gram explode")(exploded.count())
    val pinned = exploded.localCheckpoint(true)
    val counts = pinned.groupBy(col("id"), col("__tot"), col("n"), col("gh"), col("gl"))
      .agg(count(lit(1)).as("cnt"))
    t("counts on pinned (no exchange)")(counts.count())
    val counts2 = pinned.repartition(250, col("gh"))
      .groupBy(col("id"), col("__tot"), col("n"), col("gh"), col("gl"))
      .agg(count(lit(1)).as("cnt"))
    t("counts on pinned (forced exchange)")(counts2.count())
    t("plain count of pinned")(pinned.count())
    // synthetic control: same shape, 22M rows, 5 cols, mostly-unique keys
    val syn = spark.range(0, 22000000, 1, 250)
      .select((col("id") % 50000).as("id"), lit(1000L).as("__tot"),
        (col("id") % 9 + 2).cast(IntegerType).as("n"),
        (col("id") * 2654435761L % 2147483647L).as("gh"),
        (col("id") % 60).as("gl"))
      .localCheckpoint(true)
    val synCounts = syn.groupBy(col("id"), col("__tot"), col("n"), col("gh"), col("gl"))
      .agg(count(lit(1)).as("cnt"))
    t("synthetic agg 22M")(synCounts.count())
    // distribution check: rows per partition of the real pinned frame
    val sizes = pinned.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println(s"[probe] partitions=${sizes.length} max=${sizes.max} " +
      s"min=${sizes.min} nonzero=${sizes.count(_ > 0)}")
    println(counts.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Aggregate") ||
        l.contains("Window") || l.contains("Sort")).mkString("\n"))
    spark.stop()
  }
}
