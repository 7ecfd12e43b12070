package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Similarity

class TmpAb2Spec extends SparkSpec {
  test("ab2: ivfTopKExplicit wallclock + cosine variants") {
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val cents = e.orderBy("vec_id").limit(8)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    def t(label: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab2] $label median=${times.sorted.apply(1)}%6.2f")
    }
    t("full ivfTopKExplicit")(Similarity.ivfTopKExplicit(e, "vec_id", "embedding",
      cents, queryId = 0, kResults = 10, nProbe = 2).collect())
    val assigned = Similarity.ivfAssignExplicit(e, "embedding", cents)
    t("assign only")(assigned.agg(sum(col("__centroid"))).collect())
    val q = Array.fill(64)(0.5)
    val qvec = array(q.map(lit): _*)
    t("cosine native")(assigned
      .select(Similarity.cosine(col("embedding"), qvec).as("c"))
      .agg(sum(col("c"))).collect())
    def cosHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Similarity.dotHof(a, b) / (sqrt(Similarity.dotHof(a, a)) * sqrt(Similarity.dotHof(b, b)))
    t("cosine hof")(assigned
      .select(cosHof(col("embedding"), qvec).as("c"))
      .agg(sum(col("c"))).collect())
    t("orderBy limit")(assigned
      .select(col("vec_id"), Similarity.cosine(col("embedding"), qvec).as("c"))
      .orderBy(col("c").desc).limit(10).collect())
  }
}
