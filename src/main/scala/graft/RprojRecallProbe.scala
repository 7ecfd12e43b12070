package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Dev tool (r15): measured recall@k of the two-stage JL rerank
  * (`Similarity.rprojRerankTopK`) against exact `cosineTopK`, per query id
  * and stage-1 candidate budget m. Both stages are deterministic
  * (id-tie-broken TakeOrderedAndProject), so each (queryId, m) cell is a
  * FIXED integer for a given dataset — the operating curve goes in
  * SCALE.md next to the SemDeDup one.
  * Run: sbt "runMain graft.RprojRecallProbe [sfDir] [k] [m,m,...] [qid,qid,...] [dOut,...]" */
object RprojRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val ms = args.lift(2).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(20, 50, 100))
    val qids = args.lift(3).map(_.split(",").map(_.toLong).toSeq).getOrElse(Seq(0L, 7L, 42L))
    val dOuts = args.lift(4).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(16))
    val spark = SparkEntry.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .cache()
    val n = e.count()
    println(s"[recall] corpus=$n dIn=64 k=$k")
    for (qid <- qids) {
      val exact = graft.operators.Similarity
        .cosineTopK(e.withColumnRenamed("v", "embedding"), "vec_id", "embedding", qid, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      for (dOut <- dOuts; m <- ms) {
        val got = graft.operators.Similarity
          .rprojRerankTopK(e, "vec_id", "v", qid, dIn = 64, dOut = dOut, m = m, k = k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        println(s"[recall] qid=$qid dOut=$dOut m=$m recall@$k=${(exact & got).size}/$k")
      }
    }
    spark.stop()
  }
}
