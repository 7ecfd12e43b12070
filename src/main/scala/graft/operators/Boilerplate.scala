package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-frequency boilerplate removal, the CCNet / jusText-family trick:
 * navigation bars, cookie banners, and copyright footers repeat verbatim
 * across a site's pages, so any line present in more than `fracPct`% of a
 * domain's documents (and at least `minDocs` of them) is template, not
 * content. Deduplication research (e.g. Lee et al. 2022 "Deduplicating
 * Training Data Makes Language Models Better") treats this as the
 * first-pass cleanup before document-level dedup.
 *
 * Scale shape: one posexplode (no shuffle), one (group, line) count over
 * DISTINCT (group, line, doc) — map-side combined, state bounded by the
 * template vocabulary, which is domain-sized, not corpus-sized — one
 * broadcast-able anti-join of the line table against the per-group
 * boilerplate set, and one groupBy(doc) reassembly that carries (pos,
 * line) structs so the surviving lines rejoin in original order. The
 * threshold compare is integer (n_docs·100 ≥ n_total·fracPct) — exact
 * cross-engine.
 */
object Boilerplate {

  /** Remove lines that appear in ≥ `fracPct`% (and ≥ `minDocs`) of the
    * docs sharing `groupCol`. Returns (docIdCol, groupCol, text) with text
    * rebuilt from surviving lines in original order; a doc whose every
    * line is boilerplate keeps an empty text. Empty/whitespace lines are
    * compared by their trimmed form, so a blank line present across the
    * template is removed like any other repeated line. */
  def removeBoilerplate(df: DataFrame, docIdCol: String, textCol: String,
                        groupCol: String, fracPct: Int = 50,
                        minDocs: Int = 2): DataFrame = {
    require(fracPct >= 1 && fracPct <= 100 && minDocs >= 1)
    val lines = df.select(col(docIdCol), col(groupCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__key", trim(col("__line")))
    val lineDocs = lines.select(col(groupCol), col("__key"), col(docIdCol))
      .distinct()
      .groupBy(col(groupCol), col("__key"))
      .agg(count(lit(1)).as("__n_docs"))
    val grpDocs = df.groupBy(col(groupCol))
      .agg(count_distinct(col(docIdCol)).as("__n_total"))
    val bp = lineDocs.join(grpDocs, groupCol)
      .filter(col("__n_docs") >= minDocs &&
        col("__n_docs") * 100 >= col("__n_total") * fracPct)
      .select(col(groupCol), col("__key"))
    val kept = lines.join(bp, Seq(groupCol, "__key"), "left_anti")
    val rebuilt = kept.groupBy(col(docIdCol), col(groupCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol))
    // an all-boilerplate doc loses every line row — restore it as empty
    df.select(col(docIdCol), col(groupCol))
      .join(rebuilt, Seq(docIdCol, groupCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }
}
