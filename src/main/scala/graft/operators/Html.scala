package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * HTML-to-text extraction for web-scraped training corpora: strip markup,
 * scripts, styles and comments, decode the common entities, and normalize
 * whitespace — the boilerplate-extraction pass every CommonCrawl-style
 * pipeline runs before quality filtering and dedup.
 *
 * Pure Column expressions (regexp chains, whole-stage codegen, zero
 * shuffle), embarrassingly parallel per row at 100 TB. Every pattern stays
 * in the RE2-compatible subset — non-greedy dotall, no backreferences, no
 * lookaround — so the DuckDB oracle replays the identical chain.
 */
object Html {

  /** Strip one HTML document to plain text:
    * comments and script/style blocks out first (their content is not
    * text), block-level closers become newlines (so paragraph structure
    * survives), remaining tags become spaces, entities decode, whitespace
    * collapses. The fixed rewrite order is part of the contract — the
    * oracle applies the same chain in the same order. */
  def stripTags(c: Column): Column = {
    val noComments = regexp_replace(c, "(?s)<!--.*?-->", "")
    val noScript = regexp_replace(noComments, "(?is)<script.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style.*?</style>", "")
    val blocksToNl = regexp_replace(noStyle,
      "(?i)<br[^>]*>|</p>|</div>|</li>|</tr>|</h[1-6]>|</title>", "\n")
    val noTags = regexp_replace(blocksToNl, "<[^>]*>", " ")
    // entity decode, innermost-last so "&amp;lt;" becomes "&lt;" not "<"
    val entities = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (acc, (e, ch)) =>
      replace(acc, lit(e), lit(ch))
    }
    // horizontal runs -> one space, trim around newlines, squeeze blank lines
    val hs = regexp_replace(decoded, "[ \\t\\x0B\\f\\r]+", " ")
    val nl = regexp_replace(hs, " ?\\n ?", "\n")
    trim(regexp_replace(nl, "\\n{2,}", "\n"))
  }

  /** Outbound links: the href values of anchor tags (both quote styles). */
  def links(c: Column): Column =
    concat(
      regexp_extract_all(c, lit("href=\"([^\"]*)\""), lit(1)),
      regexp_extract_all(c, lit("href='([^']*)'"), lit(1)))

  /** Extraction stage: html column -> (out = clean text, out_links,
    * n_links). `n_links` is a fixed output name (withColumn overwrites a
    * same-named input — rename yours first). The usual pipeline follows
    * with [[TextAnalysis]] quality signals and [[Dedup]] passes over the
    * clean text. */
  def extract(df: DataFrame, htmlCol: String, out: String): DataFrame =
    df.withColumn(out, stripTags(col(htmlCol)))
      .withColumn(s"${out}_links", links(col(htmlCol)))
      .withColumn("n_links", size(col(s"${out}_links")).cast(LongType))
}
