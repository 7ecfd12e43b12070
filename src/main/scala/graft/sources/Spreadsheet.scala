package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Spreadsheet ingestion (SURVEY.md §2.1 flattening generators; ref
 * modules/csv/app/tuktu/csv/generators/flattening/XlsxGenerator.scala:105,
 * CsvGenerator.scala, locators/SimpleLocators.scala).
 *
 * XLSX is a zip of XML parts — parsed here with java.util.zip + scala-xml,
 * no POI dependency. Legacy binary XLS (BIFF8 inside a CFB container) is
 * handled by the sibling [[XlsBiff]] parser, which shares this module's
 * locator scan.
 *
 * Scale shape: the flattening scan is inherently sequential WITHIN a sheet
 * (locators carry values forward down rows/across columns), so the unit of
 * distribution is the FILE: `binaryFiles` gives one task per file and the
 * hierarchy state is instantiated fresh per file. A 100 TB ingest of many
 * workbooks parallelizes across files; a single workbook is small by format
 * design (XLSX sheets cap at ~1M rows).
 */
object Spreadsheet {

  // ------------------------------------------------------------ locators

  /** One level of the flattening hierarchy: name + stateful cell locator
    * called in row-major scan order (ref Common.scala ParseNode). */
  final case class ParseNode(name: String, locator: (IndexedSeq[String], Int, Int) => String)

  /** Column locator (ref SimpleLocators.scala:5): fixed column, active from
    * rowStart (to rowEnd), empty cells repeat the previous value. */
  def columnLocator(name: String, columnOffset: Int, rowStart: Int = 0,
                    rowEnd: Option[Int] = None): ParseNode = {
    var previous: String = null
    ParseNode(name, (row, rowIndex, colIndex) =>
      if (rowIndex >= rowStart && colIndex >= columnOffset && rowEnd.forall(rowIndex < _)) {
        val v = if (columnOffset < row.size) row(columnOffset) else null
        if (v == null || v.isEmpty) previous
        else { previous = v; v }
      } else null)
  }

  /** Row locator (ref SimpleLocators.scala:41): header row `rowOffset`
    * memorized per column, gaps repeat the previous value. */
  def rowLocator(name: String, rowOffset: Int): ParseNode = {
    var previous: String = null
    val values = collection.mutable.ArrayBuffer[String]()
    ParseNode(name, (row, rowIndex, colIndex) => {
      if (rowIndex == rowOffset) {
        val v = if (colIndex < row.size && row(colIndex) != null && row(colIndex).nonEmpty)
          row(colIndex) else previous
        if (colIndex < row.size && row(colIndex) != null && row(colIndex).nonEmpty)
          previous = row(colIndex)
        while (values.size <= colIndex) values += null
        values(colIndex) = v
      }
      if (values.nonEmpty) {
        if (colIndex < values.size) values(colIndex) else previous
      } else null
    })
  }

  /** Cell-range splitter (ref SimpleLocators.scala:73): one cell holds
    * "start<sep>end"; columns cycle through the generated range. */
  def cellRangeSplitter(name: String, rowOffset: Int, colOffset: Int,
                        separator: String, step: Int = 1): ParseNode = {
    val values = collection.mutable.ArrayBuffer[String]()
    ParseNode(name, (row, rowIndex, colIndex) => {
      if (rowIndex == rowOffset && colIndex == colOffset && values.isEmpty) {
        val cell = if (colIndex < row.size) row(colIndex) else ""
        if (cell != null && cell.contains(separator)) {
          // Separator is a REGEX, matching the reference's String.split
          // contract (SimpleLocators.scala:86). Deliberate divergence: the
          // reference's branching generates a DESCENDING list for a<=b and an
          // EMPTY one for a>b (degenerate `start to end by +step`); we emit
          // the range in its natural direction instead.
          val parts = cell.split(separator)
          val (a, b) = (parts(0).trim.toInt, parts(1).trim.toInt)
          val range = if (a <= b) a to b by math.max(1, step) else a to b by -math.max(1, step)
          values ++= range.map(_.toString)
        } else values += cell
      }
      if (values.nonEmpty) values((colIndex % values.size + values.size) % values.size) else null
    })
  }

  // ------------------------------------------------------------ flattening core

  /** The reference's scan loop (XlsxGenerator.scala:80-100): walk rows until
    * the end marker, apply every locator to every cell, emit one record per
    * data cell once all hierarchy levels resolve. */
  def flattenSheet(rows: Iterator[IndexedSeq[String]], valueName: String,
                   dataColStart: Int, dataColEnd: Option[Int],
                   hierarchy: List[ParseNode],
                   endFieldCol: Int = -1, endField: String = null): Iterator[Map[String, String]] = {
    var rowOffset = -1
    var stopped = false
    rows.flatMap { line =>
      rowOffset += 1
      if (stopped) Nil
      else if (endFieldCol >= 0 && endFieldCol < line.size && line(endFieldCol) == endField) {
        stopped = true; Nil
      } else {
        val endPos = dataColEnd.getOrElse(line.size - 1)
        (0 to endPos).flatMap { i =>
          val flat = hierarchy.map(pn => pn.name -> pn.locator(line, rowOffset, i))
          if (i >= dataColStart && flat.forall(_._2 != null))
            Some((flat :+ (valueName -> (if (i < line.size) line(i) else ""))).toMap)
          else None
        }
      }
    }
  }

  // ------------------------------------------------------------ xlsx parsing

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** "A1" → 0, "AB3" → 27: column letters to 0-based index. */
  private[graft] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1

  /** Reference cell rendering (XlsxGenerator.scala:36-44): numeric cells
    * print as int when integral, else as double. */
  private[graft] def renderNumeric(v: String): String =
    try {
      val d = v.toDouble
      if (d.toInt.toDouble == d) d.toInt.toString else d.toString
    } catch { case _: NumberFormatException => v }

  /** Parse one worksheet of an xlsx byte payload into dense string rows
    * (gaps filled with ""). Only physically present rows are returned, in
    * file order — matching POI's sheet iterator. */
  def xlsxRows(bytes: Array[Byte], sheetName: Option[String] = None): Seq[IndexedSeq[String]] = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] =
      entries.get("xl/sharedStrings.xml").map { ss =>
        val x = SecureXml.load(new ByteArrayInputStream(ss))
        (x \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)
    // name → worksheet part: resolve through xl/_rels/workbook.xml.rels when
    // present (sheet order and sheetN.xml numbering decouple once sheets are
    // deleted/reordered in Excel); fall back to positional sheetN.xml.
    val relsNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val relTargets: Map[String, String] =
      entries.get("xl/_rels/workbook.xml.rels").map { rl =>
        val x = SecureXml.load(new ByteArrayInputStream(rl))
        (x \\ "Relationship").map(r =>
          (r \ "@Id").text -> (r \ "@Target").text.stripPrefix("/xl/").stripPrefix("./")).toMap
      }.getOrElse(Map.empty)
    val sheetPath = sheetName.flatMap { name =>
      entries.get("xl/workbook.xml").flatMap { wb =>
        val x = SecureXml.load(new ByteArrayInputStream(wb))
        val sheets = (x \\ "sheet").map { s =>
          val rid = s.attribute(relsNs, "id").map(_.text).getOrElse("")
          ((s \ "@name").text, rid)
        }
        val i = sheets.indexWhere(_._1 == name)
        if (i < 0) None
        else relTargets.get(sheets(i)._2)
          .map(t => if (t.startsWith("xl/")) t else s"xl/$t")
          .orElse(Some(s"xl/worksheets/sheet${i + 1}.xml"))
      }
    }.getOrElse("xl/worksheets/sheet1.xml")
    val sheet = entries.getOrElse(sheetPath,
      throw new IllegalArgumentException(s"no worksheet $sheetPath in xlsx"))
    val x = SecureXml.load(new ByteArrayInputStream(sheet))
    (x \ "sheetData" \ "row").map { r =>
      // the r= cell reference is optional in OOXML: a cell without one sits
      // immediately after the previous cell (implied sequential position)
      var nextImplied = 0
      val cells = (r \ "c").map { c =>
        val ref = (c \ "@r").text
        val idx = if (ref.isEmpty || !ref.headOption.exists(_.isLetter)) nextImplied
                  else colIndex(ref)
        nextImplied = idx + 1
        val v = (c \ "@t").text match {
          case "s"         => shared((c \ "v").text.trim.toInt)
          case "inlineStr" => (c \ "is" \\ "t").map(_.text).mkString
          case "str"       => (c \ "v").text
          case "b"         => if ((c \ "v").text.trim == "1") "true" else "false"
          case _           => renderNumeric((c \ "v").text.trim)
        }
        idx -> v
      }
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val row = Array.fill(width)("")
      cells.foreach { case (i, v) => if (i >= 0) row(i) = v }
      row.toIndexedSeq
    }
  }

  // ------------------------------------------------------------ Spark surface

  private def toDf(spark: SparkSession, records: org.apache.spark.rdd.RDD[Map[String, String]],
                   names: Seq[String]): DataFrame = {
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(records.map(m => Row.fromSeq(names.map(m.getOrElse(_, null)))), schema)
  }

  /** Shared driver for the flattening cousins (csv/xlsx/xls): one task per
    * file, fresh locator state per file (locators are stateful by contract),
    * row parsing pluggable. Output columns = hierarchy names + valueName,
    * all strings — parity with the reference's emitted datum. */
  private[graft] def flattenedDf(spark: SparkSession, glob: String,
                                 rowsOf: Array[Byte] => Iterator[IndexedSeq[String]],
                                 valueName: String, dataColStart: Int, dataColEnd: Option[Int],
                                 hierarchy: () => List[ParseNode],
                                 endFieldCol: Int, endField: String): DataFrame = {
    val names = hierarchy().map(_.name) :+ valueName
    val records = spark.read.format("binaryFile").load(glob)
      .select("path", "content").rdd
      .flatMap { row =>
        flattenSheet(rowsOf(row.getAs[Array[Byte]]("content")), valueName,
          dataColStart, dataColEnd, hierarchy(), endFieldCol, endField)
      }
    toDf(spark, records, names)
  }

  /** XlsxGenerator flattened mode. */
  def xlsxFlattened(spark: SparkSession, glob: String, sheetName: Option[String],
                    valueName: String, dataColStart: Int, dataColEnd: Option[Int],
                    hierarchy: () => List[ParseNode],
                    endFieldCol: Int = -1, endField: String = null): DataFrame =
    flattenedDf(spark, glob, bytes => xlsxRows(bytes, sheetName).iterator,
      valueName, dataColStart, dataColEnd, hierarchy, endFieldCol, endField)

  /** Plain (non-flattened) xlsx read: first row as header (or positional
    * c0..cN), remaining rows as string columns. */
  def xlsx(spark: SparkSession, glob: String, sheetName: Option[String] = None,
           header: Boolean = true): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select("path", "content").rdd
    val rows = files.flatMap { row =>
      val all = xlsxRows(row.getAs[Array[Byte]]("content"), sheetName)
      val (head, data) = if (header && all.nonEmpty) (all.head, all.tail) else (IndexedSeq.empty[String], all)
      data.map(r => (head, r))
    }
    // schema width = the widest row anywhere (a sparse first record must not
    // truncate later columns). One metadata pass collects width + the first
    // header per partition — not one job per question, which would re-read
    // and re-parse every workbook several times.
    val meta = rows.mapPartitionsWithIndex { case (pi, it) =>
      var w = 0
      var firstHeader: Option[IndexedSeq[String]] = None
      it.foreach { case (h, r) =>
        w = math.max(w, math.max(h.size, r.size))
        if (firstHeader.isEmpty) firstHeader = Some(h)
      }
      Iterator((pi, w, firstHeader))
    }.collect().sortBy(_._1)
    val width = if (meta.isEmpty) 0 else meta.map(_._2).max
    val names = meta.flatMap(_._3).headOption.filter(_.nonEmpty)
      .map(h => (0 until width).map(i => if (i < h.size && h(i).nonEmpty) h(i) else s"c$i"))
      .getOrElse((0 until width).map(i => s"c$i"))
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      rows.map { case (_, r) => Row.fromSeq((0 until width).map(i => if (i < r.size) r(i) else null)) },
      schema)
  }

  // ------------------------------------------------------------ CSV cousin

  /** RFC-4180-ish line parser with configurable quote and escape chars,
    * matching the opencsv CSVReader contract the reference hands its
    * `quote`/`escape` config to (flattening/CsvGenerator.scala:23,90-98):
    * the escape char before a quote or escape yields that literal char
    * (opencsv's isNextCharacterEscapable) — but only in-quotes or mid-field
    * (opencsv gates on `inQuotes || inField`; at the very start of an
    * unquoted field the escape char is a literal) — a doubled quote inside
    * a quoted field yields a literal quote, and separators inside quotes
    * are data. */
  private[graft] def parseCsvLine(line: String, sep: Char = ',',
                                  quote: Char = '"',
                                  escape: Char = '\\'): IndexedSeq[String] = {
    val out = collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == escape && (inQ || cur.nonEmpty) && i + 1 < line.length &&
          (line.charAt(i + 1) == quote || line.charAt(i + 1) == escape)) {
        cur += line.charAt(i + 1); i += 1
      } else if (inQ) {
        if (c == quote && i + 1 < line.length && line.charAt(i + 1) == quote) { cur += quote; i += 1 }
        else if (c == quote) inQ = false
        else cur += c
      } else {
        if (c == quote) inQ = true
        else if (c == sep) { out += cur.result(); cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.result()
    out.toIndexedSeq
  }

  /** Flattening CsvGenerator (ref flattening/CsvGenerator.scala): the same
    * hierarchy scan over CSV files, one task per file. Blank lines are KEPT:
    * locators anchor on physical row numbers, so dropping a line would shift
    * every rowOffset below it; only a trailing newline artifact is trimmed. */
  def csvFlattened(spark: SparkSession, glob: String, valueName: String,
                   dataColStart: Int, dataColEnd: Option[Int],
                   hierarchy: () => List[ParseNode], sep: Char = ',',
                   endFieldCol: Int = -1, endField: String = null,
                   quote: Char = '"', escape: Char = '\\'): DataFrame =
    flattenedDf(spark, glob, { bytes =>
      val raw = new String(bytes, "UTF-8").split("\r?\n", -1)
      (if (raw.nonEmpty && raw.last.isEmpty) raw.init else raw)
        .iterator.map(parseCsvLine(_, sep, quote, escape))
    }, valueName, dataColStart, dataColEnd, hierarchy, endFieldCol, endField)
}
