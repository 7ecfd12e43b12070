package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines: exact (hash-groupBy),
 * MinHash+LSH near-dup (shingle → minhash → band → bucket-join), SimHash,
 * and n-gram Jaccard verification.
 *
 * Scale design: everything is expression-level (codegen'd) per row until the
 * single LSH bucket-join shuffle, which is keyed on (band index, band value) —
 * candidate generation never does an all-pairs comparison, so cost is
 * O(rows · shingles) + O(bucket collisions), not O(rows²). At 100 TB the
 * band-bucket shuffle is the only wide stage and AQE handles skewed buckets
 * (identical boilerplate docs) via skew-join splitting.
 *
 * Determinism contract: hashes derive from md5 prefixes (15 hex chars →
 * 60-bit int) and fixed odd multipliers mod 2^31-1, reproducible bit-for-bit
 * in the DuckDB oracle.
 */
object Dedup {

  val P: Long = 2147483647L // 2^31-1, Mersenne prime

  /** 60-bit md5-prefix hash, then reduced mod P (DuckDB-replicable). */
  def hash60(c: Column): Column = TextAnalysis.tokenHash(c) % P

  /** Word n-gram shingles of a text column: contiguous `n`-token windows
    * joined by a single space. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    // sequence(1, k) is descending for k<1 — guard short docs to an empty set
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Distinct shingle hashes per document (the set MinHash samples from). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => hash60(s)))

  /** MinHash signature: k independent affine permutations h_j(x)=(a_j·x+b_j) mod P,
    * minimum over the document's shingle-hash set. a_j odd, deterministic. */
  def minhashSignature(hashes: Column, k: Int = 16): Column =
    array((0 until k).map { j =>
      array_min(transform(hashes, x => (x * (2L * j + 1) + (12289L * j + 741)) % P))
    }: _*)

  /** LSH band keys: signature split into `bands` bands of `rows` values,
    * each band rendered "j:v1:v2:…" — equal band key ⇒ candidate pair. */
  def lshBands(sig: Column, bands: Int = 4, rows: Int = 4): Column =
    array((0 until bands).map { j =>
      concat_ws(":", lit(j.toString) +: (0 until rows).map(r =>
        element_at(sig, j * rows + r + 1).cast(StringType)): _*)
    }: _*)

  /** Exact n-gram Jaccard similarity between two shingle-hash sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Exact dedup by content hash: per duplicate-cluster keep the smallest id.
    * One shuffle on md5(text); map-side partial agg collapses uniques early. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Full MinHash+LSH near-dup candidate pipeline:
    * doc → shingle hashes → signature → explode bands → bucket join on band
    * key → candidate pairs (id1 < id2) → exact Jaccard verify ≥ threshold.
    * Returns (id1, id2, jaccard). */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3, k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band", explode(lshBands(col("sig"), bands, k / bands)))
    val l = withSig.select(col("band"), col("id").as("id1"), col("sh").as("sh1"))
    val r = withSig.select(col("band"), col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("band"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 60-bit signature; bit i is the sign of the sum over tokens of
    * ±1 according to bit i of the token hash. Near-dup iff hamming distance
    * of signatures ≤ d (bit_count(xor)). */
  def simhash(text: Column, bits: Int = 60): Column = {
    val th = transform(array_distinct(TextAnalysis.tokens(text)), t => TextAnalysis.tokenHash(t))
    (0 until bits).map { i =>
      when(aggregate(th, lit(0L),
        (s, h) => s + (shiftright(h, i) % 2) * 2 - 1) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold via the
    * Similarity module's LSH-bucketed ANN (see Similarity.scala). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame =
    Similarity.lshCandidatePairs(df, idCol, vecCol)
      .filter(col("cosine") >= threshold)
}
