package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Training-corpus assembly operators: temperature-weighted domain mixture
 * sampling and concatenate-and-chunk sequence packing — the two steps between
 * a cleaned/deduped document set and actual pre-training batches.
 *
 * Both are deterministic (salted md5 hashes, integer window arithmetic), so
 * reruns select identical rows and the DuckDB oracle replicates them
 * bit-for-bit.
 */
object Corpus {

  /** Deterministic uniform draw in [0, P) from a salted doc id. */
  private def mixHash(id: Column): Column =
    Dedup.hash60(concat(lit("mix:"), id.cast(StringType)))

  /** Weight-proportional Poisson sampling: keep a row iff
    * hash(id)·W < k·w·2⁶⁰, i.e. with probability k·w/W — expected sample
    * size k, inclusion probability proportional to weight (token budget,
    * char count). The cheapest sampler that exists at 100 TB: ONE scalar
    * total W rides along broadcast, then the corpus is a pure filter — no
    * sort, no top-k, no shuffle, no state. Independent Bernoulli draws ⇒
    * size concentrates at k ± O(√k) (Poisson sampling, Särndal et al.
    * 1992 §3.2; the PPS primitive under DSIR-style budget resampling).
    * All-integer (decimal-widened) arithmetic: reruns and the DuckDB
    * oracle select the identical row set. Rows with weight ≥ W/k are
    * certain picks; weight-0 rows never qualify. */
  def poissonWeightedSample(df: DataFrame, idCol: String, weight: Column,
                            k: Int): DataFrame = {
    require(k >= 1, "sample size k >= 1")
    val dec = DecimalType(38, 0)
    val tot = df.agg(sum(weight.cast(LongType)).as("__W"))
    df.crossJoin(broadcast(tot))
      .filter(TextAnalysis.tokenHash(col(idCol).cast(StringType)).cast(dec) *
        col("__W").cast(dec) <
        lit(k).cast(dec) * weight.cast(LongType).cast(dec) *
          lit(1152921504606846976L).cast(dec))
      .drop("__W")
  }

  /** Deterministic per-group uniform sample of exactly min(k, |group|)
    * rows: the k SMALLEST md5 id-hashes per group, ids breaking hash ties.
    * Hash order is independent of the data's physical order, so the pick
    * is a uniform without-replacement sample that is stable run-to-run,
    * engine-to-engine, and — unlike reservoir sampling — mergeable with no
    * RNG state: it rides the bounded-heap [[graft.plans.TopKByScore]]
    * aggregate (score = −hash), so map-side partials reduce every
    * partition to k rows per group BEFORE the shuffle and the plan is
    * ObjectHashAggregate — no per-group sort, no window, no corpus
    * shuffle of non-sampled rows. The fixed-k-per-key shape for building
    * eval/holdout slices from a 100 TB corpus.
    *
    * ID CONTRACT (mirrors topk_by's own null-skip contract): `idCol` must
    * be unique within each group and castable to BIGINT. Ids that are null
    * or fail the cast become null and are SKIPPED by the aggregate (the
    * row silently leaves the sampling frame), and duplicate ids collapse
    * to one (hash, id) entry — so "exactly min(k, |group|) rows" holds
    * only for unique, BIGINT-castable ids. Non-numeric ids should be
    * pre-hashed to a surrogate (e.g. [[TextAnalysis.tokenHash]]) first.
    *
    * Returns (groupCols…, id, h) for the sampled rows, h the sampling
    * hash in [0, P). */
  def hashBottomKSample(df: DataFrame, groupCols: Seq[String], idCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "sample size k >= 1")
    val h = TextAnalysis.tokenHash(col(idCol).cast(StringType)) % Dedup.P
    df.select((groupCols.map(col) :+ col(idCol).cast(LongType).as("__id") :+
        h.as("__h")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("topk_by", -col("__h").cast(DoubleType), col("__id"),
        lit(k)).as("__bk"))
      .select((groupCols.map(col) :+ explode(col("__bk")).as("__e")): _*)
      .select((groupCols.map(col) :+ col("__e.id").as(idCol) :+
        (-col("__e.score")).cast(LongType).as("h")): _*)
  }

  /** Weighted without-replacement sample of k rows per group via PRIORITY
    * SAMPLING (Duffield–Lund–Thorup, JACM 54(6) 2007 — "Priority sampling
    * for estimation of arbitrary subset sums"): each row gets priority
    * q = w / u with u = (hash(id)+1)/2⁶⁰ ∈ (0, 1], the k largest
    * priorities per group are the sample, and τ = the (k+1)-th largest
    * priority (0 when the group holds ≤ k rows) gives each sampled row the
    * unbiased weight estimator ŵ = max(w, τ): Σ ŵ over the sample
    * estimates any subset's total weight, the property that makes a k-row
    * slice of a 100 TB corpus answer weighted questions (token-hour
    * budgeting, per-source loss mass) without a second pass.
    *
    * Everything is hash-deterministic — u is an md5-derived rational, both
    * divisions are single correctly-rounded IEEE ops — so the sample and
    * the estimator columns replay bit-for-bit in the DuckDB oracle (the
    * reason priorities are preferred here over Efraimidis–Spirakis
    * exponential keys, whose ln() is not correctly rounded and may differ
    * in the last ulp across libms). Ties break by smaller id, matching
    * [[graft.plans.TopKByScore]].
    *
    * Scale shape: one bounded-heap `topk_by` aggregate (k+1 entries per
    * group at every stage, map-side partials ship k+1 pairs per
    * (partition, group) — no sort, no window), then the k·|G|-row sample
    * broadcast-joins the corpus scan once to recover the original weight —
    * unsampled rows are never shuffled. Same id contract as
    * [[hashBottomKSample]]: unique BIGINT-castable ids, nulls skipped.
    * Weights must be positive; a null weight nulls the priority and the
    * aggregate skips the row.
    *
    * Returns (groupCols…, id, weight, priority, tau, w_hat). */
  def prioritySample(df: DataFrame, groupCols: Seq[String], idCol: String,
                     weightCol: String, k: Int): DataFrame = {
    require(k >= 1, "sample size k >= 1")
    val two60 = 1152921504606846976.0 // 2^60, the hash domain
    val gcols = groupCols.map(col)
    val u = (TextAnalysis.tokenHash(col(idCol).cast(StringType)) + lit(1L))
      .cast(DoubleType) / lit(two60)
    val q = col(weightCol).cast(DoubleType) / u
    val sampled = df
      .select(gcols :+ col(idCol).cast(LongType).as("__id") :+ q.as("__q"): _*)
      .groupBy(gcols: _*)
      .agg(call_function("topk_by", col("__q"), col("__id"), lit(k + 1)).as("__tk"))
      .withColumn("tau",
        when(size(col("__tk")) === k + 1,
          element_at(col("__tk"), k + 1).getField("score")).otherwise(lit(0.0)))
      .select(gcols ++ Seq(explode(slice(col("__tk"), 1, k)).as("__e"), col("tau")): _*)
      .select(groupCols.map(c => col(c).as(s"__g_$c")) ++ Seq(
        col("__e.id").as("__sid"), col("__e.score").as("priority"), col("tau")): _*)
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c"))
      .foldLeft(col(idCol).cast(LongType) === col("__sid"))(_ && _)
    df.select(gcols :+ col(idCol) :+ col(weightCol).cast(DoubleType).as("weight"): _*)
      .join(broadcast(sampled), cond)
      .select(gcols ++ Seq(col(idCol), col("weight"), col("priority"), col("tau"),
        greatest(col("weight"), col("tau")).as("w_hat")): _*)
  }

  /** Temperature-weighted mixture sampling over a domain column (the
    * multilingual/multi-source balancing step: raw web corpora are dominated
    * by a few giant domains; training mixtures want flatter shares).
    *
    * With per-domain sizes n_d, each domain keeps rate
    * r_d = (n_min / n_d)^(1-alpha), so the smallest domain is kept whole and
    * post-sample sizes are proportional to n_d^alpha: alpha = 1 keeps
    * everything, alpha → 0 flattens toward equal shares. The keep decision
    * per row is `salted_hash(id) < floor(r_d · P)` — deterministic, so the
    * sample is reproducible run-to-run and engine-to-engine.
    *
    * alpha = 0.5 computes r_d via sqrt, which IEEE 754 requires to be
    * correctly rounded (bit-identical across engines); other alphas go
    * through pow, whose last ulp may differ between libm implementations —
    * fine for sampling, but only the sqrt path is oracle-hash-exact.
    *
    * Scale shape: one tiny groupBy(domain) count (map-side combined, result
    * is |domains| rows), broadcast back; the keep decision is a codegen'd
    * per-row expression — the corpus itself is never shuffled. A null domain
    * (missing crawl metadata) is treated as its own group and sampled like
    * any other, not dropped.
    *
    * Returns the kept rows with a `mix_rate` column appended. */
  def mixtureSample(df: DataFrame, domainCol: String, idCol: String,
                    alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(domainCol).as("_mix_domain"))
      .agg(count(lit(1)).cast(DoubleType).as("_mix_n"))
    val nMin = counts.agg(min(col("_mix_n")).as("_mix_nmin"))
    val ratio = col("_mix_nmin") / col("_mix_n")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 1.0) lit(1.0)
      else pow(ratio, 1.0 - alpha)
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col("_mix_domain"), rate.as("mix_rate"))
    // null-safe join: a null domain (missing crawl metadata) is a real group
    // — groupBy counted it, so an equi-join would silently drop those rows
    // while still letting them drag n_min down
    df.join(broadcast(rates), df(domainCol) <=> col("_mix_domain"))
      .filter(mixHash(df(idCol)) < floor(col("mix_rate") * lit(Dedup.P)).cast(LongType))
      .drop("_mix_domain")
  }

  /** UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual Pretraining"
    * — public): distribute a total training budget uniformly across
    * domains, capping every domain at `maxEpochs` repetitions of its own
    * size; budget a capped domain cannot absorb is re-shared uniformly
    * among the rest. Closed form: visit domains in increasing size order
    * and give each min(maxEpochs·n_d, remaining budget / domains left).
    *
    * Returns (domain, alloc, epochs = alloc/n_d) in that visit order. The
    * arithmetic is a fixed sequence of IEEE double ops, replayed verbatim
    * by the oracle's recursive CTE — bit-identical. */
  def unimaxAllocate(counts: Seq[(String, Long)], budget: Double,
                     maxEpochs: Double): Seq[(String, Double, Double)] = {
    require(budget >= 0 && maxEpochs > 0, "need budget >= 0, maxEpochs > 0")
    val sorted = counts.sortBy { case (d, n) => (n, d) }
    var bRem = budget
    var rem = sorted.size
    sorted.map { case (d, n) =>
      val a = math.min(maxEpochs * n, bRem / rem)
      bRem -= a
      rem -= 1
      (d, a, a / n)
    }
  }

  /** UniMax sampling: every kept row carries `n_epochs` — how many times
    * the document appears in the training mixture (fractional epochs
    * resolve per-document by the same salted-hash draw as
    * [[mixtureSample]], so the sample is deterministic engine-to-engine).
    *
    * Scale shape: one |domains|-row count aggregate reaches the driver
    * (the allocation is model-sized); the per-row decision is a broadcast
    * join + codegen'd hash compare — the corpus never shuffles. Budget
    * units are documents by default, or Σ `sizeCol` per domain (chars,
    * tokens) when given — the paper's character-budget form. */
  def unimaxSample(df: DataFrame, domainCol: String, idCol: String,
                   budget: Double, maxEpochs: Double,
                   sizeCol: Option[String] = None): DataFrame = {
    val weight = sizeCol.map(c => sum(col(c).cast(LongType)))
      .getOrElse(count(lit(1)))
    // cast the domain to string on BOTH sides (groupBy here, join below) so
    // a non-string domain column groups/joins consistently instead of
    // throwing ClassCastException at getString; coalesce the weight so a
    // domain whose sizeCol values are all null sums to 0 (then drops —
    // zero mass earns zero epochs) rather than NPE-ing getLong
    val counts = df.groupBy(col(domainCol).cast(StringType).as("_um_domain"))
      .agg(coalesce(weight, lit(0L)).as("_um_n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).filter(_._2 > 0).toSeq
    val allocs = unimaxAllocate(counts, budget, maxEpochs)
    val spark = df.sparkSession
    import spark.implicits._
    val rates = allocs.map { case (d, _, e) =>
      val full = math.floor(e)
      (d, full.toLong, math.floor((e - full) * Dedup.P).toLong)
    }.toDF("_um_domain", "_um_full", "_um_thr")
    // distinct salt so the fractional-epoch draw is independent of the
    // mixtureSample keep draw when both stages run in one pipeline
    val draw = Dedup.hash60(concat(lit("unimax:"), df(idCol).cast(StringType)))
    df.join(broadcast(rates), df(domainCol).cast(StringType) <=> col("_um_domain"))
      .withColumn("n_epochs", col("_um_full") +
        when(draw < col("_um_thr"), lit(1L)).otherwise(lit(0L)))
      .filter(col("n_epochs") > 0)
      .drop("_um_domain", "_um_full", "_um_thr")
  }

  /** Sliding-window chunking — the long-document prep for
    * context-bounded models and retrieval indexing: each document's token
    * sequence splits into windows of `window` tokens advancing by
    * `stride` (overlap = window − stride; BERT-style striding at
    * stride < window, disjoint segmentation at stride == window). A
    * window is emitted for every start in {0, stride, 2·stride, …} below
    * the token count, so no token is dropped and the final window may be
    * short. Returns (id, chunk_id, start, n_toks, chunk) with provenance
    * intact — chunk_id = start / stride.
    *
    * Scale shape: pure per-row sequence+explode projection — no shuffle,
    * no state, embarrassingly parallel; output size is
    * ≈ corpus · window/stride, the caller's knob. */
  def chunkSliding(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window >= 1, "chunkSliding needs window >= 1")
    require(stride >= 1 && stride <= window,
      "chunkSliding needs 1 <= stride <= window (stride > window drops tokens)")
    df.select(col(idCol).as("id"),
        graft.operators.TextAnalysis.tokens(col(textCol)).as("__toks"))
      // null text → no chunks (nothing to chunk): without the filter,
      // size(null) = -1 makes sequence(0, -2, stride) THROW at runtime —
      // one bad row must not kill a corpus-sized job
      .filter(col("__toks").isNotNull)
      .withColumn("__n", size(col("__toks")))
      // tokens() of any non-null string is non-empty (split of "" is
      // [""]), so sequence(0, n-1, stride) is always well-formed ascending
      .select(col("id"), col("__toks"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(col("id"), col("chunk_id"), col("start"),
        least(lit(window), col("__n") - col("start")).as("n_toks"),
        array_join(slice(col("__toks"), col("start") + 1, lit(window)), " ").as("chunk"))
  }

  /** Concatenate-and-chunk sequence packing (GPT-style pre-training
    * batching): documents are deterministically sharded by salted id hash,
    * totally ordered within each shard (hash, then id — a reproducible
    * shuffle), laid head-to-tail into a token stream, and the stream is cut
    * every `budget` tokens. Returns one row per document:
    * (id, shard, pos, n_tok, tok_offset, seq_id) where `tok_offset` is the
    * document's start position in its shard's token stream and
    * seq_id = tok_offset / budget —
    * the training sequence its first token lands in (documents may straddle
    * sequence boundaries, exactly like concat-and-chunk batching).
    *
    * Scale shape: the hash shard key distributes the corpus evenly across
    * `nShards` window partitions (pick nShards ≫ executor count), the
    * running sum is a streaming rows-frame window — no global sort, no
    * driver state; per-shard sort is the price any deterministic packing
    * pays and is bounded by corpus_size / nShards. */
  def packSequences(df: DataFrame, idCol: String, tokenCount: Column,
                    nShards: Int, budget: Long): DataFrame = {
    require(nShards > 0 && budget > 0, "nShards and budget must be positive")
    val base = df.select(col(idCol).as("id"), tokenCount.cast(LongType).as("n_tok"))
      .withColumn("h", Dedup.hash60(concat(lit("shard:"), col("id").cast(StringType))))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("id"))
    base
      .withColumn("pos", row_number().over(w).cast(LongType))
      // "tok_offset", not "offset": OFFSET is a reserved word downstream (SQL)
      .withColumn("tok_offset", coalesce(
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // SQL `div` is exact integer division (Column./ would be double)
      .withColumn("seq_id", expr(s"tok_offset div ${budget}L"))
      .select("id", "shard", "pos", "n_tok", "tok_offset", "seq_id")
  }

  /** Document-boundary-preserving packing (next-fit): unlike
    * [[packSequences]]' concat-and-chunk (which splits documents at budget
    * boundaries — right for pretraining token streams), this variant keeps
    * every document whole and walks each shard's deterministic (hash, id)
    * order, opening a new bin whenever the next document would overflow —
    * the shape SFT/long-context pipelines need. A document larger than the
    * budget gets a bin of its own (callers filter oversize upstream if
    * that's policy).
    *
    * Packing with per-bin remainders is inherently sequential, so the
    * shard is the parallelism unit (exactly as in [[packSequences]]): one
    * repartition + in-partition sort, then a single forward walk per
    * shard — O(n/shards) per task, no window, no driver involvement. The
    * walk is the documented mapPartitions last-resort: next-fit's
    * remainder reset is not a prefix-sum, so no window expresses it.
    * Returns (id, shard, pos, n_tok, bin), bins 1-based per shard. */
  def packDocsNoSplit(df: DataFrame, idCol: String, tokenCount: Column,
                      nShards: Int, budget: Long): DataFrame = {
    require(nShards > 0 && budget > 0, "nShards and budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("id"), tokenCount.cast(LongType).as("n_tok"))
      .withColumn("h", Dedup.hash60(concat(lit("shard:"), col("id").cast(StringType))))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("id"))
      .select(col("id"), col("n_tok"), col("shard")).as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bin = 0L; var fill = 0L; var pos = 0L
        it.map { case (id, nTok, shard) =>
          if (shard != curShard) {
            curShard = shard; bin = 1L; fill = nTok; pos = 1L
          } else {
            pos += 1
            if (fill + nTok <= budget) fill += nTok else { bin += 1; fill = nTok }
          }
          (id, shard, pos, nTok, bin)
        }
      }.toDF("id", "shard", "pos", "n_tok", "bin")
  }

  /** Integer hash thresholds for [[splitAssign]]'s cumulative fractions —
    * exposed so an external replayer (the DuckDB oracle, an audit job) can
    * embed the EXACT same boundaries instead of re-deriving them through
    * its own floating-point sum order. */
  def splitThresholds(fractions: Seq[(String, Double)]): Seq[Long] =
    fractions.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => math.floor(c * Dedup.P).toLong)

  /** Deterministic train/validation/test assignment: each row's bucket is a
    * pure function of `salt` and its id (salted 60-bit hash mapped through
    * the cumulative fraction boundaries), so membership is reproducible
    * run-to-run, stable under corpus growth (existing ids never migrate),
    * and joinable from any other pipeline stage without materializing the
    * assignment. Zero shuffle — one codegen'd expression per row. */
  def splitAssign(df: DataFrame, idCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = "split", out: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = Dedup.hash60(concat(lit(s"$salt:"), col(idCol).cast(StringType)))
    val label = fractions.init.zip(splitThresholds(fractions)) match {
      case Nil => lit(fractions.head._1)
      case (n0, t0) :: rest =>
        rest.foldLeft(when(h < t0, lit(n0._1))) {
          case (acc, ((name, _), t)) => acc.when(h < t, lit(name))
        }.otherwise(lit(fractions.last._1))
    }
    df.withColumn(out, label)
  }

  /** Deterministic global shuffle (training-order randomization): sort by a
    * salted id hash, which is uncorrelated with crawl/source order, and
    * number the result. Reshuffling is changing the salt; the permutation
    * is reproducible engine-to-engine.
    *
    * Scale shape: the sort is Spark's sample-based range-partition exchange
    * (each partition sorts locally — no global single-reducer window), and
    * the position comes from [[graft.engine.Ops.indexByLayout]]'s
    * per-partition numbering + broadcast offsets. This is exactly the
    * pre-training "shuffle the corpus once, stream it in order" step. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = "shuffle",
                           posCol: String = "pos"): DataFrame = {
    // both output columns are part of the contract — refuse to silently
    // clobber same-named inputs (drop the previous epoch's columns first)
    require(!df.columns.contains("shuffle_key") && !df.columns.contains(posCol),
      s"deterministicShuffle: input already has 'shuffle_key'/'$posCol'")
    val keyed = df.withColumn("shuffle_key",
      Dedup.hash60(concat(lit(s"$salt:"), col(idCol).cast(StringType))))
    graft.engine.Ops.withGlobalIndex(keyed,
      Seq(col("shuffle_key"), col(idCol)), posCol)
  }

  /** Write the corpus as deterministic training shards: `shard` = salted id
    * hash mod nShards (the same assignment as [[packSequences]]), laid out as
    * parquet partitioned by shard. Shard membership is a pure function of the
    * id, so interrupted pipelines can re-run and overwrite byte-identical
    * shard directories, and downstream readers prune to `shard = k` at the
    * file-listing level (partition pruning, no data scan).
    *
    * `maxRecordsPerFile` > 0 additionally caps file sizes inside each shard —
    * at 100 TB, bounded files are what keeps downstream loaders' task sizes
    * uniform. */
  def writeShards(df: DataFrame, idCol: String, path: String, nShards: Int,
                  maxRecordsPerFile: Long = 0L): Unit = {
    require(nShards > 0, "nShards must be positive")
    val sharded = df.withColumn("shard",
      pmod(Dedup.hash60(concat(lit("shard:"), col(idCol).cast(StringType))),
        lit(nShards.toLong)))
    val w = sharded.write.mode("overwrite")
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w)
      .partitionBy("shard").parquet(path)
  }

  /** Corpus snapshot diff: classify every document id across two corpus
    * versions as added / removed / changed / unchanged by content
    * fingerprint — the version-control primitive behind incremental
    * releases (recrawl deltas, takedown audits, feeding ONLY changed docs
    * to downstream dedup/embedding stages instead of recomputing 100 TB).
    *
    * ONE full-outer join on the id with fingerprints compared in-join;
    * fingerprints are [[TextAnalysis.fingerprint]]'s rolling hash
    * (SQL-replayable), computed scan-side so the shuffle carries
    * (id, fp) rows, never text. Both sides shuffle once on id — or zero
    * times when snapshots are bucketed on id, the natural layout for a
    * versioned corpus store. Returns (id, status, old_fp, new_fp). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // presence markers, not fp-nullness: a null-text doc still EXISTS in
    // its snapshot (its fp is null), and null fps compare null-safely
    val o = oldDf.select(col(idCol).cast(LongType).as("id"),
      lit(true).as("__inOld"), TextAnalysis.fingerprint(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol).cast(LongType).as("id"),
      lit(true).as("__inNew"), TextAnalysis.fingerprint(col(textCol)).as("new_fp"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__inOld").isNull, lit("added"))
          .when(col("__inNew").isNull, lit("removed"))
          .when(col("old_fp") <=> col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))
  }

  // ------------------------------------------- training-objective prep
  // Deterministic objective transforms: the document rewriting between a
  // packed corpus and the actual loss — fill-in-the-middle for code/infill
  // models, span corruption for T5-family denoisers. Cut points and mask
  // decisions are salted-hash functions of (id[, position]), so reruns
  // rewrite identically and a SQL replayer reproduces every byte.

  /** Fill-in-the-middle transform (Bavarian et al. 2022): for a
    * hash-selected `ratePct`% of documents, split the text at two
    * hash-chosen character cuts c1 ≤ c2 and emit the PSM rearrangement
    * `<|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle`; the rest pass
    * through untouched (the paper's joint FIM+AR recipe). Pure per-row
    * codegen expressions — zero shuffle, linear scan at any scale.
    * Returns (id, fim, out). */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
                   ratePct: Int = 50): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, "ratePct in [0,100]")
    def h(salt: String) =
      Dedup.hash60(concat(lit(salt), col(idCol).cast(StringType)))
    val L = length(col(textCol)).cast(LongType)
    val c1 = h("fim1:") % (L + 1)
    val c2 = c1 + h("fim2:") % (L - c1 + 1)
    val prefix = col(textCol).substr(lit(1), c1.cast(IntegerType))
    val middle = col(textCol).substr((c1 + 1).cast(IntegerType),
      (c2 - c1).cast(IntegerType))
    val suffix = col(textCol).substr((c2 + 1).cast(IntegerType),
      L.cast(IntegerType))
    val doFim = h("fim:") % 100 < ratePct
    df.select(col(idCol).as("id"), doFim.as("fim"),
      when(doFim, concat(lit("<|fim_pre|>"), prefix, lit("<|fim_suf|>"),
        suffix, lit("<|fim_mid|>"), middle))
        .otherwise(col(textCol)).as("out"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): each
    * whitespace token is masked with hash probability `maskPct`%;
    * CONSECUTIVE masked tokens collapse into one `<Xk>` sentinel in the
    * corrupted input, and the target lists each sentinel followed by the
    * tokens it swallowed. Returns (id, input, target, n_masked,
    * n_groups).
    *
    * Scale shape: one posexplode, one per-DOCUMENT window chain
    * (lag + running sum — partitions are doc-keyed, state is one bool),
    * one groupBy reassembly with in-partition HOF folds. The token stream
    * is the only corpus-sized shuffle, carrying (id, pos, tok) rows. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  maskPct: Int = 15): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, "maskPct in [0,100]")
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
    val w = Window.partitionBy("id").orderBy("pos")
    val g = toks
      .withColumn("m", Dedup.hash60(concat(lit("span:"),
        col("id").cast(StringType), lit(":"),
        col("pos").cast(StringType))) % 100 < maskPct)
      .withColumn("strt", col("m") && !lag(col("m"), 1, false).over(w))
      .withColumn("gid",
        sum(when(col("strt"), 1L).otherwise(0L)).over(w))
    val sentinel = concat(lit("<X"), (col("gid") - 1).cast(StringType), lit(">"))
    val pieces = g.select(col("id"), col("pos"), col("m"),
      when(!col("m"), col("tok")).when(col("strt"), sentinel)
        .otherwise(lit("")).as("in_piece"),
      when(col("m") && col("strt"), concat(sentinel, lit(" "), col("tok")))
        .when(col("m"), col("tok")).otherwise(lit("")).as("tgt_piece"),
      col("gid"))
    def joined(piece: String) = array_join(
      filter(transform(sort_array(collect_list(struct(col("pos"),
        col(piece).as("p")))), x => x("p")), p => p =!= ""), " ")
    pieces.groupBy("id").agg(
      joined("in_piece").as("input"),
      joined("tgt_piece").as("target"),
      sum(when(col("m"), 1L).otherwise(0L)).as("n_masked"),
      max(col("gid")).as("n_groups"))
  }
}
