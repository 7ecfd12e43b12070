package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Token-sequence cleanup operators (reference
 * modules/nlp/app/tuktu/nlp/processors/cleanup/Cleanup.scala and
 * SentenceSplitter.scala; modules/csv/app/tuktu/csv/processors/
 * CsvProcessors.scala:179 FixedWidthProcessor): the text-preprocessing
 * steps between tokenization and modeling.
 *
 * All but two are pure array/lambda expressions (codegen, zero shuffle).
 * The exceptions carry their justification: odd-character flattening needs
 * java.text.Normalizer (no Catalyst NFD expression exists) and sentence
 * splitting needs the locale-aware BreakIterator automaton — the reference
 * calls the same JDK libraries, so ours are the same per-row library calls,
 * wrapped once per executor instead of once per actor.
 */
object Cleanup {

  /** CaseConverterProcessor (ref Cleanup.scala:97): whole-sequence upper or
    * lower fold; the reference defaults to lowercase. */
  def caseConvert(tokens: Column, uppercase: Boolean = false): Column =
    if (uppercase) transform(tokens, upper(_)) else transform(tokens, lower(_))

  /** PunctuationRemoverProcessor (ref Cleanup.scala:66): the reference
    * regex `(\p{P})` is applied with matches(), so it drops tokens that ARE
    * one punctuation character — multi-char tokens survive. */
  def punctuationRemover(tokens: Column): Column =
    filter(tokens, t => !t.rlike("^\\p{P}$"))

  /** NCharsRemoverProcessor (ref Cleanup.scala:82): keep tokens strictly
    * longer than n characters. */
  def nCharsRemover(tokens: Column, n: Int): Column =
    filter(tokens, t => length(t) > n)

  /** Public emoji/pictograph blocks (Unicode 15 ranges): Misc Symbols &
    * Pictographs through Symbols for Legacy Computing, dingbats, arrows-as-
    * emoji, keycap combiner (U+20E3), both variation selectors (text FE0E /
    * emoji FE0F) and ZWJ (sequence glue). The reference delegates to the
    * vdurmont emoji DB; the block form covers the same characters without
    * bundling a database. Residual divergence vs that DB: skin-tone-bearing
    * TEXT glyphs outside these blocks keep their base character here. */
  val emojiClass: String =
    "[\\x{1F000}-\\x{1FAFF}\\x{2600}-\\x{27BF}\\x{2B00}-\\x{2BFF}\\x{FE0E}\\x{FE0F}\\x{200D}\\x{20E3}]"

  /** EmojiRemoverProcessor (ref Cleanup.scala:75): strip emoji codepoints
    * from every token (the token itself stays, possibly empty — the
    * reference behaves the same way). */
  def emojiRemover(tokens: Column): Column =
    transform(tokens, t => regexp_replace(t, emojiClass, ""))

  /** Built-in minimal stopword lists; the reference ships full per-language
    * resource files (conf/stopwords/<lang>) and reads them by the language
    * part of a tag like `nl_NL` — pass a loaded list for parity with a
    * specific deployment's files. */
  val defaultStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
      "if", "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
      "that", "the", "their", "then", "there", "these", "they", "this", "to",
      "was", "will", "with"),
    "nl" -> Seq("de", "het", "een", "en", "van", "in", "is", "dat", "die",
      "niet", "met", "te", "voor", "op", "zijn", "er", "maar", "om", "aan",
      "als", "dan", "ook", "naar", "bij", "of", "uit", "nog", "door"))

  /** Language-tag prefix per the reference's matcher: `nl_NL` → `nl`. */
  def langOfTag(tag: String): String = tag.takeWhile(_ != '_')

  /** Load a one-word-per-line stopword file (any Hadoop-visible path) —
    * the shape of the reference's conf/stopwords/<lang> resources. */
  def loadStopwords(spark: SparkSession, path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq.map(_.trim).filter(_.nonEmpty)

  /** StopwordRemoverProcessor (ref Cleanup.scala:118): drop exact stopword
    * tokens. The list compiles into the plan (an `isin` literal set). */
  def stopwordRemover(tokens: Column, stopwords: Seq[String]): Column =
    filter(tokens, t => !t.isin(stopwords: _*))
  def stopwordRemover(tokens: Column, langTag: String): Column =
    // an unknown language throws, like the reference's missing-resource
    // IOException — a silent no-op would quietly keep every stopword
    stopwordRemover(tokens, defaultStopwords.getOrElse(langOfTag(langTag),
      throw new IllegalArgumentException(
        s"no stopword list for '$langTag' — pass a loaded list (loadStopwords)")))

  /** OddCharacterRemoverProcessor (ref Cleanup.scala:48): NFD-decompose,
    * keep ASCII, then keep only letters and spaces ("café!" → "cafe").
    * UDF — justified: Catalyst has no Unicode-normalizer expression. */
  private val flattenAsciiUdf =
    udf { (ts: Seq[String]) =>
      if (ts == null) null
      else ts.map { s =>
        if (s == null) null // null tokens pass through, like the Catalyst cleaners
        else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
          .filter(_ <= '\u007F').replaceAll("[^a-zA-Z ]", "")
      }
    }
  def oddCharacterRemover(tokens: Column): Column = flattenAsciiUdf(tokens)

  /** The standard UTF-8-read-as-CP1252 mojibake table (the ftfy core
    * cases): each left-hand sequence is what a common Latin-1-supplement /
    * general-punctuation character's UTF-8 bytes render as when a crawler
    * mis-decodes them as CP1252 — the single most common encoding defect
    * in web corpora. Every left-hand side is a full distinct sequence
    * (U+201D's third byte \x9D maps to the C1 control U+009D and is kept,
    * so no entry is a prefix of another and chain order is inert — but the
    * chain IS ordered punctuation-first by convention, matching ftfy).
    * Exposed so the oracle/audit side can unroll the identical chain. */
  val mojibakeTable: Seq[(String, String)] = Seq(
    // U+2019/2018 apostrophes, U+201C/201D quotes, U+2013/2014 dashes,
    // U+2026 ellipsis (3-byte UTF-8 → 3-char mojibake). U+201D's third
    // byte \x9D is unmapped in CP1252: decoders either substitute U+FFFD
    // (the JDK) or pass the C1 control U+009D through (iconv //TRANSLIT,
    // many web stacks) — repair BOTH spellings.
    "â€�" -> "”",
    "â€™" -> "’",
    "â€˜" -> "‘",
    "â€œ" -> "“",
    "â€" -> "”",
    "â€“" -> "–",
    "â€”" -> "—",
    "â€¦" -> "…",
    // Latin-1 supplement letters (2-byte UTF-8 → 2-char mojibake)
    "Ã©" -> "é", // é
    "Ã¨" -> "è", // è
    "Ã¡" -> "á", // á
    "Ã³" -> "ó", // ó
    "Ã¼" -> "ü", // ü
    "Ã¶" -> "ö", // ö
    "Ã¤" -> "ä", // ä
    "Ã±" -> "ñ", // ñ
    "Ã§" -> "ç") // ç

  /** Mojibake repair (ftfy-lite): undo one round of
    * UTF-8-bytes-decoded-as-CP1252 for the [[mojibakeTable]] sequences — a
    * deterministic chain of plain (non-regex) replaces in table order,
    * entirely codegen'd, zero shuffle. One chain application repairs one
    * round of mis-decoding (doubly-corrupted text needs two passes —
    * callers gate on [[mojibakeCount]] reaching zero). */
  def mojibakeFix(text: Column): Column =
    mojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      call_function("replace", c, lit(bad), lit(good))
    }

  /** Count of mojibake sequence occurrences — the corruption signal a
    * quality-filter thresholds on (and the convergence gate for repeated
    * [[mojibakeFix]] passes). Counts each table sequence in the RAW text:
    * Σ (len(text) − len(replace(text, seq, ''))) / len(seq), all exact
    * integer arithmetic. */
  def mojibakeCount(text: Column): Column =
    mojibakeTable.map { case (bad, _) =>
      ((length(text) -
        length(call_function("replace", text, lit(bad), lit("")))) /
        lit(bad.length)).cast(LongType)
    }.reduce(_ + _)

  /** SentenceSplitterProcessor (ref SentenceSplitter.scala:18): text →
    * sentences via the locale-aware JDK BreakIterator (same automaton the
    * reference uses). UDF — justified: library algorithm, no expression
    * form; BreakIterator is not thread-safe, so one instance per call. */
  def sentenceSplit(text: Column, localeTag: String = "en"): Column = {
    val splitUdf = udf { (s: String) =>
      if (s == null) null
      else {
        val bi = java.text.BreakIterator.getSentenceInstance(
          java.util.Locale.forLanguageTag(localeTag))
        bi.setText(s)
        val out = Seq.newBuilder[String]
        var start = bi.first
        var end = bi.next
        while (end != java.text.BreakIterator.DONE) {
          out += s.substring(start, end)
          start = end
          end = bi.next
        }
        out.result()
      }
    }
    splitUdf(text)
  }

  /** FixedWidthProcessor (ref CsvProcessors.scala:179): cut a string field
    * at fixed widths; the REMAINDER after the last width is kept as one
    * final element (reference substringFetch's `case Nil => List(string)`).
    * With `flatten` the pieces become top-level columns named by `headers`
    * (or "0".."n"); otherwise they land in `result` as an array. Pure
    * substring expressions. */
  def fixedWidth(df: DataFrame, field: String, widths: Seq[Int],
                 headers: Option[Seq[String]] = None, flatten: Boolean = false,
                 result: String = "fixed"): DataFrame = {
    require(widths.forall(_ > 0), "widths must be positive")
    val starts = widths.scanLeft(1)(_ + _) // 1-based substring starts
    val pieces = widths.zip(starts.init).map { case (w, s) =>
      substring(col(field), s, w)
    } :+ col(field).substr(lit(starts.last), // remainder to end, '' if short
      greatest(length(col(field)) - starts.last + 1, lit(0)))
    val names = headers.getOrElse(pieces.indices.map(_.toString))
    if (flatten)
      names.zip(pieces).foldLeft(df) { case (d, (n, p)) => d.withColumn(n, p) }
    else df.withColumn(result, array(pieces: _*))
  }
}
