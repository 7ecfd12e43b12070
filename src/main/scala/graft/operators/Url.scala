package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL normalization and domain extraction for web-corpus pipelines —
 * URL-level dedup needs canonical forms (case, default ports, fragments,
 * tracking parameters), and per-domain statistics need registrable domains.
 * Reference analog: the web module's URL handling (URLCheckerProcessor /
 * web analytics); the normalization rules themselves follow RFC 3986 §6
 * syntax-based normalization plus the common tracking-param strip.
 *
 * All pure codegen'd expressions (no UDFs, no shuffles): safe in any hot
 * path at 100 TB. Deliberately avoids regex backreference replacement —
 * Java ($1) and RE2-style engines (\\1) disagree on syntax, and the DuckDB
 * oracle must reproduce every step bit-for-bit, so splitting/filtering/
 * reassembly use only extract, substring, CASE, and array ops that exist
 * identically in both engines.
 */
object Url {

  /** scheme://authority prefix (empty when the value isn't an absolute URL). */
  private def schemeAuthority(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#]*", 0)

  /** Canonical form: strip fragment; lowercase scheme+authority; drop default
    * ports (http:80, https:443); drop tracking params (utm_*, fbclid, gclid)
    * and empty params; collapse a bare "/" path. Path/query case and order
    * are preserved (they are semantically significant). */
  def normalize(url: Column): Column = {
    val u1 = regexp_replace(url, "#.*$", "") // fragment never survives
    val base = substring_index(u1, "?", 1)
    val qs = when(instr(u1, "?") > 0, substring(u1, instr(u1, "?") + 1, lit(1000000)))
      .otherwise(lit(""))
    val sa = schemeAuthority(base)
    val path0 = substring(base, length(sa) + 1, lit(1000000))
    val path = when(path0 === "/", lit("")).otherwise(path0)
    val saL = lower(sa)
    val saNorm =
      when(saL.startsWith("http://") && saL.endsWith(":80"),
        saL.substr(lit(1), length(saL) - 3))
      .when(saL.startsWith("https://") && saL.endsWith(":443"),
        saL.substr(lit(1), length(saL) - 4))
      .otherwise(saL)
    val params = filter(split(qs, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid=") || p.startsWith("gclid=") ||
        p === ""))
    concat(saNorm, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Hostname, lowercased, without port. */
  def host(url: Column): Column =
    lower(regexp_extract(url, "^[^:/?#]+://([^:/?#]*)", 1))

  /** Naive registrable domain: the last two labels (no public-suffix list —
    * documented approximation); single-label hosts return themselves. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val lastTwo = regexp_extract(h, "[^.]+\\.[^.]+$", 0)
    when(lastTwo === "", h).otherwise(lastTwo)
  }

  /** Top-level domain (last label). */
  /** Domain-suffix blocklist filter with the blocklist AS DATA — the UT1 /
    * SafeSearch-list shape: `blocklist` is a one-column table of domain
    * suffixes ("ads.example.com" blocks itself and every subdomain), the
    * corpus row is dropped when ANY suffix of its host matches. The host's
    * suffix chain is exploded with a bounded lambda (hosts have ≤ ~6
    * labels; no UDF) and anti-joined against the blocklist — broadcast-able
    * at any corpus size because blocklists are thousands of rows, and the
    * corpus is touched once with no shuffle on the corpus side.
    *
    * @param df        corpus with a host column (use [[host]] to derive it)
    * @param idCol     unique row key (doc id) — the anti-join key
    * @param hostCol   canonical lowercase hostname column name
    * @param blocklist one column `suffixCol` of lowercase domain suffixes
    * @return df rows whose host matches no blocklist suffix */
  def blocklistFilter(df: org.apache.spark.sql.DataFrame, idCol: String, hostCol: String,
                      blocklist: org.apache.spark.sql.DataFrame,
                      suffixCol: String = "suffix"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val labels = split(col(hostCol), "\\.")
    // suffix i = labels[i..n-1] joined by '.', for i in 0..n-1
    val suffixes = transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
    val bl = broadcast(blocklist.select(lower(trim(col(suffixCol))).as("__sfx")).distinct())
    val blockedIds = df.select(col(idCol), explode(suffixes).as("__sfx"))
      .join(bl, "__sfx").select(col(idCol)).distinct()
    // blocked ids are usually ≪ corpus (a hit is the exception) — leave the
    // anti-join unhinted so AQE broadcasts when that holds and falls back
    // to a keyed shuffle when a whale domain is blocked
    df.join(blockedIds, Seq(idCol), "left_anti")
  }

  def tld(url: Column): Column =
    regexp_extract(host(url), "[^.]+$", 0)
}
