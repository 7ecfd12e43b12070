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

  /** Per-token md5-based hashes in [0, P). */
  def tokenHashes(text: Column): Column =
    transform(TextAnalysis.tokens(text), t => TextAnalysis.tokenHash(t) % P)

  /** Shingle hash composed from a MATERIALIZED token-hash column by a rolling
    * fold h = (h*131 + th[i]) mod P — one md5 per token instead of one per
    * shingle (HOFs get no codegen CSE, so `thCol` must be a real column: its
    * element_at references are then cheap attribute lookups). */
  def shingleHashesFromTokens(thCol: Column, n: Int = 3): Column =
    when(size(thCol) < n, array().cast(ArrayType(LongType)))
      .otherwise(array_distinct(transform(sequence(lit(1), size(thCol) - (n - 1)), i =>
        (1 until n).foldLeft(element_at(thCol, i))((h, k) =>
          (h * 131 + element_at(thCol, i + k)) % P))))

  /** Attach a distinct-shingle-hash column (staged projects — see above). */
  def withShingleHashes(df: DataFrame, textCol: String, out: String, n: Int = 3): DataFrame =
    df.withColumn("__th", tokenHashes(col(textCol)))
      .withColumn(out, shingleHashesFromTokens(col("__th"), n))
      .drop("__th")

  /** Distinct shingle hashes as a single expression (prefer withShingleHashes
    * in pipelines — this form re-evaluates tokenHashes at each reference). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => hash60(s)))

  /** MinHash signature: k independent affine permutations h_j(x)=(a_j·x+b_j) mod P,
    * minimum over the document's shingle-hash set. a_j odd, deterministic.
    *
    * Single traversal of the shingle set: the accumulator is the array of k
    * running minima, updated with zip_with against the literal (a,b) params —
    * higher-order functions get no codegen subexpression elimination, so a
    * per-permutation transform would re-evaluate `hashes` k times. */
  def minhashSignature(hashes: Column, k: Int = 16): Column = {
    val params = array((0 until k).map { j =>
      struct(lit(2L * j + 1).as("a"), lit(12289L * j + 741).as("b"))
    }: _*)
    val init = array(Seq.fill(k)(lit(Long.MaxValue)): _*)
    aggregate(hashes, init,
      (acc, x) => zip_with(acc, params,
        (m, p) => least(m, (x * p.getField("a") + p.getField("b")) % P)))
  }

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
    val base = withShingleHashes(df.select(col(idCol).as("id"), col(textCol)), textCol, "sh", n)
      .drop(textCol)
    // Candidate generation carries ONLY (band, id): a pair sharing m bands
    // must not shuffle both shingle arrays m times and compute Jaccard m
    // times — dedup the id pairs first, then join the shingle sets back in
    // (one shuffle of each side's shingles) and verify each pair ONCE.
    val banded = base
      .withColumn("band", explode(lshBands(minhashSignature(col("sh"), k), bands, k / bands)))
      .select(col("band"), col("id"))
    val candidates = banded.select(col("band"), col("id").as("id1"))
      .join(banded.select(col("band"), col("id").as("id2")), Seq("band"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
    candidates
      .join(base.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .select(col("id1"), col("id2"), jaccard(col("sh1"), col("sh2")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 60-bit signature; bit i is the sign of the sum over tokens of
    * ±1 according to bit i of the token hash. Near-dup iff hamming distance
    * of signatures ≤ d (bit_count(xor)). */
  def simhash(text: Column, bits: Int = 60): Column = {
    val th = transform(array_distinct(TextAnalysis.tokens(text)), t => TextAnalysis.tokenHash(t))
    val masks = array((0 until bits).map(i => lit(1L << i)): _*)
    val init = array(Seq.fill(bits)(lit(0L)): _*)
    // one pass over tokens: per-bit vote sums via bitwiseAND against the mask
    val votes = aggregate(th, init,
      (acc, h) => zip_with(acc, masks,
        (s, m) => s + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, masks, (v, m) => when(v >= 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold via the
    * Similarity module's LSH-bucketed ANN (see Similarity.scala). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame =
    Similarity.lshCandidatePairs(df, idCol, vecCol)
      .filter(col("cosine") >= threshold)
}
