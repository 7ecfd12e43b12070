package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * WordPiece subword tokenization (the BERT inference shape, Wu et al.
 * 2016 / Devlin et al. 2019): greedy longest-match-first against a piece
 * vocabulary whose word-internal pieces carry the `##` continuation
 * prefix. With [[Bpe]] (merge-list family), [[Bpe.trainBytes]] (byte
 * level) and [[Unigram]] (unigram-LM Viterbi family) this completes the
 * three tokenizer families production pipelines draw from.
 *
 * The vocabulary rides as DATA — the production case is a shipped
 * vocab.txt loaded into a DataFrame — and [[vocab]] gives a
 * frequency-seeded one for self-contained runs.
 *
 * Scale shape (the bpe_train / unigram lesson): after the one corpus
 * token-count scan, everything runs on the DISTINCT-WORD table. The
 * candidate explode is O(len·maxPieceLen) per distinct word, the vocab
 * join is piece-keyed, and the greedy walk is a pure per-row fold over
 * the word's own matched-edge list — no shuffle, no state, at most L
 * steps each consuming ≥ 1 character. Encoding 100 TB costs one
 * token-count pass plus vocabulary-sized work and a broadcast join back.
 */
object WordPiece {

  val UNK = "[UNK]"

  /** Candidate piece at (j, i): the substring with the `##` continuation
    * prefix when it does not start the word. */
  private def prefixed(w: Column, j: Column, i: Column): Column =
    when(j === 0, w.substr(j + 1, i - j))
      .otherwise(concat(lit("##"), w.substr(j + 1, i - j)))

  /** Frequency-seeded piece vocabulary: every (position-aware) candidate
    * piece of every distinct word weighted by word frequency, top `k` by
    * (freq desc, piece asc), UNION every single-character piece in both
    * its initial and `##` forms so the greedy walk never dead-ends on
    * in-corpus words. Returns one `piece` column. */
  def vocab(wf: DataFrame, k: Int, maxPieceLen: Int = 6): DataFrame = {
    val pieces = wf
      .select(col("w"), col("freq"), length(col("w")).as("L"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, L), j ->
              transform(sequence(1, least($maxPieceLen, L - j + 1)), len ->
                CASE WHEN j = 1 THEN substr(w, j, len)
                     ELSE '##' || substr(w, j, len) END)))""")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").as("freq"))
    val top = pieces.orderBy(col("freq").desc, col("piece").asc).limit(k)
    val chars = pieces.filter(
      length(col("piece")) === 1 ||
        (length(col("piece")) === 3 && col("piece").startsWith("##")))
    top.unionAll(chars).select("piece").distinct()
  }

  /** Greedy longest-match-first encode of every distinct word of `wf`
    * (length ≤ `maxWordLen`) against `vocab` (one `piece` column, `##`
    * marks continuations): returns (w, n_pieces, seg, is_unk) — BERT's
    * whole-word [[UNK]] fallback when any position has no matching piece.
    *
    * Matched edges (j → i when the prefixed piece ∈ vocab) come from one
    * piece-keyed equality join; the walk is a single aggregate() fold per
    * word over its own edge array — each step takes the LONGEST edge at
    * the current position, so ≤ L steps always terminate. */
  def encodeWords(wf: DataFrame, vocab: DataFrame, maxPieceLen: Int = 6,
                  maxWordLen: Int = 16): DataFrame = {
    val dw = wf.select(col("w"), length(col("w")).as("L"))
      .filter(col("L") >= 1 && col("L") <= maxWordLen)
    val cand = dw.select(col("w"), col("L"),
      explode(expr(
        s"""flatten(transform(sequence(1, L), j ->
              transform(sequence(1, least($maxPieceLen, L - j + 1)), len ->
                struct(j - 1 AS j, j - 1 + len AS i,
                  CASE WHEN j = 1 THEN substr(w, j, len)
                       ELSE '##' || substr(w, j, len) END AS piece))))"""))
        .as("e"))
      .select(col("w"), col("e.j").as("j"), col("e.i").as("i"),
        col("e.piece").as("piece"))
    val matched = cand.join(vocab.select(col("piece")).distinct(), "piece")
      .groupBy("w")
      .agg(collect_list(struct(col("j"), col("i"))).as("edges"))
    val edges = dw.join(matched, Seq("w"), "left")
      .select(col("w"), col("L"),
        coalesce(col("edges"), array().cast(
          ArrayType(StructType(Seq(StructField("j", IntegerType),
            StructField("i", IntegerType)))))).as("edges"))
    // greedy fold: state (pos, n, seg, unk); a step from a completed or
    // failed state is the identity, so folding L steps is always enough
    val walk = aggregate(
      sequence(lit(1), col("L")),
      struct(lit(0).as("pos"), lit(0L).as("n"), lit("").as("seg"),
        lit(false).as("unk")),
      (acc: Column, _: Column) => {
        val best = array_max(transform(
          filter(col("edges"), e => e("j") === acc("pos")), e => e("i")))
        val piece = prefixed(col("w"), acc("pos"), best)
        when(acc("unk") || acc("pos") >= col("L"), acc)
          .otherwise(when(best.isNull,
            struct(col("L").as("pos"), lit(1L).as("n"), lit(UNK).as("seg"),
              lit(true).as("unk")))
            .otherwise(struct(best.as("pos"), (acc("n") + 1L).as("n"),
              concat(acc("seg"),
                when(acc("seg") === "", lit("")).otherwise(lit(" ")),
                piece).as("seg"),
              lit(false).as("unk"))))
      })
    edges.withColumn("__s", walk)
      .select(col("w"), col("__s.n").as("n_pieces"), col("__s.seg").as("seg"),
        col("__s.unk").as("is_unk"))
  }

  /** Per-document WordPiece token counts: distinct words encoded once,
    * broadcast-joined back to per-doc word counts — the same scale shape
    * as [[Bpe.encodeCounts]]. Words longer than `maxWordLen` count as one
    * [[UNK]] apiece (BERT's max_input_chars_per_word rule). */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
                   vocab: DataFrame, maxPieceLen: Int = 6,
                   maxWordLen: Int = 16): DataFrame = {
    val docWords = df.select(col(idCol).as("id"),
      explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
    val wf = docWords.select(col("w")).distinct()
      .withColumn("freq", lit(1L))
    // words over maxWordLen never enter encodeWords (length filter) —
    // the left join + coalesce below is what applies the one-[UNK] rule
    val enc = encodeWords(wf, vocab, maxPieceLen, maxWordLen)
      .select(col("w"), col("n_pieces"), col("is_unk"))
    docWords.join(broadcast(enc), Seq("w"), "left")
      .select(col("id"), col("c"),
        coalesce(col("n_pieces"), lit(1L)).as("n_pieces"),
        coalesce(col("is_unk"), lit(true)).as("is_unk"))
      .groupBy(col("id"))
      .agg(sum(col("c") * col("n_pieces")).as("n_wp_tokens"),
        sum(col("c")).as("n_words"),
        sum(when(col("is_unk"), col("c")).otherwise(lit(0L))).as("n_unk_words"))
      .select(col("id").as(idCol), col("n_wp_tokens"), col("n_words"),
        col("n_unk_words"))
  }
}
