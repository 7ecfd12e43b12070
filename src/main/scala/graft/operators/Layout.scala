package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import scala.jdk.CollectionConverters._

/**
 * Data-layout clustering for scan locality (SURVEY §3 scale posture; the
 * technique behind Databricks OPTIMIZE ZORDER BY and Iceberg's sort-order
 * rewrite, both public): interleave the bits of several normalized column
 * ranks into one Morton (Z-order) key, then range-partition + sort the
 * write by that key. Rows close in EVERY clustered dimension land in the
 * same parquet files, so per-file min/max statistics prune
 * multi-predicate scans — at 100 TB the difference between touching a few
 * files and touching all of them for a `custkey BETWEEN … AND date
 * BETWEEN …` query.
 *
 * Everything is exact integer expression work (no UDF, codegen-friendly):
 * the rank is one integer scale `((v − min)·(2^bits − 1)) div (max −
 * min)` with clamping, the interleave a fixed fold of shifts/ors —
 * bits·dims codegen'd ops per row, fully replayable by the SQL oracle.
 */
object Layout {

  /** Clamped `bits`-bit rank of a numeric column over a caller-supplied
    * [min, max] range (ranges are data statistics the caller owns — at
    * scale they come from one cheap agg or the catalog, never recomputed
    * per row). Exact integer math; null in → null out. */
  def zorderRank(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "rank bits must be in [1, 31]")
    require(max > min, "zorderRank needs max > min")
    // the scale product must stay double-exact for the floor-division to
    // be the integer quotient (Column has no integral-divide operator):
    // span·(2^bits − 1) < 2^53 covers any real stats range at ≤ 21 bits
    require((max - min) <= (1L << 53) / ((1L << bits) - 1),
      s"span ${max - min} × 2^$bits-1 exceeds the exact-double envelope")
    val span = lit(max - min)
    val top = lit((1L << bits) - 1)
    val clamped = greatest(lit(min), least(lit(max), c.cast(LongType)))
    floor(((clamped - lit(min)) * top) / span).cast(LongType)
  }

  /** Locality-preserving `bits`-bit rank of a STRING column from its
    * lowercase prefix: each of ⌈bits/5⌉ leading characters contributes 5
    * bits (a=1 … z=26; 0 = shorter-than-prefix; anything else = 27), so
    * lexicographic order is preserved across [a-z] prefixes (non-letters
    * all rank after z — a locality heuristic, not a collation) and
    * same-prefix strings — the domain-clustering case — land adjacent.
    * Pure codegen'd expressions, replayable in SQL. */
  def prefixRank(c: Column, bits: Int): Column = {
    require(bits >= 5 && bits <= 30 && bits % 5 == 0,
      "prefix rank bits must be a multiple of 5 in [5, 30]")
    val nChars = bits / 5
    val lowered = lower(c)
    val codes = (1 to nChars).map { i =>
      val ch = ascii(substring(lowered, i, 1)) // 0 when past end of string
      val code = when(ch === 0, lit(0))
        .when(ch.between('a'.toInt, 'z'.toInt), ch - lit('a'.toInt - 1))
        .otherwise(lit(27))
      shiftleft(code.cast(LongType), (nChars - i) * 5)
    }
    codes.reduce(_ + _)
  }

  /** Morton key: interleave the bits of `ranks` (each already a `bits`-bit
    * non-negative long; dimension i owns absolute bit positions
    * b·dims + i). dims·bits must fit a signed long (≤ 62). */
  def mortonKey(ranks: Seq[Column], bits: Int): Column = {
    val dims = ranks.size
    require(dims >= 1, "mortonKey needs at least one dimension")
    require(dims * bits <= 62, s"$dims dims × $bits bits exceeds a signed long")
    val terms = for {
      b <- 0 until bits
      (r, i) <- ranks.zipWithIndex
    } yield shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * dims + i)
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Z-order key over numeric columns with caller-supplied ranges. */
  def zorderKey(cols: Seq[(Column, Long, Long)], bits: Int): Column =
    mortonKey(cols.map { case (c, lo, hi) => zorderRank(c, lo, hi, bits) }, bits)

  /** Caller-owned stats ranges from ONE aggregate pass: (col, min, max)
    * triples ready for [[zorderKey]]/[[clusterByZorder]]. Degenerate
    * columns (min == max, or all null) widen by one so the rank math
    * stays defined. At a real deployment these numbers come from the
    * table catalog; this is the self-contained path. */
  def statsRanges(df: DataFrame, cols: Seq[Column]): Seq[(Column, Long, Long)] = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast(LongType)).as(s"__mn$i"), max(c.cast(LongType)).as(s"__mx$i"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val mn = if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) mn + 1 else row.getLong(2 * i + 1)
      (c, mn, if (mx > mn) mx else mn + 1)
    }
  }

  /** Cluster a DataFrame for writing: range-partition into `numFiles`
    * buckets of the Z-key and sort within each, so the downstream
    * `.write.parquet` emits files whose per-column min/max spans are tight
    * in every clustered dimension. One shuffle (the range exchange), one
    * local sort — the standard rewrite cost, paid once per layout pass. */
  def clusterByZorder(df: DataFrame, cols: Seq[(Column, Long, Long)],
                      numFiles: Int, bits: Int = 21,
                      keyCol: String = "__zkey"): DataFrame = {
    val keyed = df.withColumn(keyCol, zorderKey(cols, bits))
    keyed.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
  }

  /** Per-row-group [min, max] footer statistics for `cols` under a
    * parquet directory — exactly the numbers a stats-based reader (or a
    * table format's file index) consults to skip row groups. One
    * driver-side metadata pass (footers only, no data pages); the proof
    * surface for "did the layout make the scan prunable". */
  def rowGroupStats(spark: SparkSession, dir: String, cols: Seq[String])
      : Seq[(String, Map[String, (Long, Long)])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .flatMap { f =>
        val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
          val m = b.getColumns.asScala.flatMap { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            if (cols.contains(name) && st != null && st.hasNonNullValue)
              Some(name -> (st.genericGetMin.asInstanceOf[Number].longValue,
                st.genericGetMax.asInstanceOf[Number].longValue))
            else None
          }.toMap
          (f.getName, m)
        } finally rdr.close()
      }
  }

  /** How many row groups under `dir` must be READ for a conjunction of
    * closed-range predicates (a group survives when EVERY predicate's
    * [lo, hi] intersects its [min, max]; a group missing stats for a
    * predicated column is conservatively read). Returns (read, total). */
  def scannedRowGroups(spark: SparkSession, dir: String,
                       preds: Map[String, (Long, Long)]): (Int, Int) = {
    val groups = rowGroupStats(spark, dir, preds.keys.toSeq)
    val read = groups.count { case (_, stats) =>
      preds.forall { case (c, (lo, hi)) =>
        stats.get(c).forall { case (mn, mx) => lo <= mx && hi >= mn }
      }
    }
    (read, groups.size)
  }
}
