package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (ISO 28500 / Web ARChive, the public Common-Crawl container format)
 * record source: the standard input for web-scale training corpora. The
 * reference stops at line/binary/CSV/XML file generators; a 100 TB text
 * pipeline starts from crawl archives, so this is a first-class source
 * extension alongside them.
 *
 * Layout per record: a `WARC/1.x` version line, CRLF-terminated
 * `Name: value` headers (`WARC-Type`, `WARC-Target-URI`, `WARC-Date`,
 * `Content-Length`, ...), a blank line, `Content-Length` bytes of block,
 * then CRLF CRLF. `response` records carry an HTTP response as their
 * block — status line, headers, body — parsed into http_status /
 * http_content_type / body here.
 *
 * Scale design: crawl archives ship as many ~1 GB segment files, so the
 * industry-standard unit of parallelism is the FILE (one task per
 * segment), not the byte range — records straddle no file boundary and a
 * splitter would have to scan for record magic anyway. This source uses
 * `sparkContext.binaryFiles`' PortableDataStream, which hands each task a
 * lazily-opened stream: records parse incrementally and only ONE record
 * is ever materialized per task, so executor memory is bounded by the
 * largest record, not the largest file (`spark.read.format("binaryFile")`
 * would materialize whole segments as row values). Gzip members are
 * detected by magic and decoded through the JDK's multi-member
 * `GZIPInputStream` — the Common-Crawl member-per-record layout and
 * whole-file gzip both stream through it. The RDD hop is the documented
 * imperative-I/O carve-out (same justification as `linesPerRow`); the
 * result lands in a DataFrame immediately, so everything downstream is
 * Catalyst-planned.
 */
object Warc {

  /** One parsed WARC record. `body` is the HTTP payload for parsed
    * `response` records, else the raw block. */
  final case class WarcRecord(
      file: String,
      record_seq: Long,
      warc_type: String,
      target_uri: Option[String],
      warc_date: Option[String],
      record_id: Option[String],
      content_type: Option[String],
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      body: Array[Byte])

  /** Read a CRLF- (or bare-LF-) terminated header line as ISO-8859-1.
    * Returns null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record block of $n bytes exceeds 2 GiB")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new EOFException(s"truncated WARC block at $off/$n")
      off += r
    }
    buf
  }

  private def headerBlock(in: InputStream): Option[Map[String, String]] = {
    var line = readLine(in)
    // tolerate inter-record padding
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/"))
      throw new IllegalArgumentException(s"not a WARC record header: '$line'")
    val m = Map.newBuilder[String, String]
    line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0) m += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      line = readLine(in)
    }
    Some(m.result())
  }

  /** Parse one stream of concatenated (possibly gzipped) WARC records. */
  def parseStream(raw: InputStream, file: String): Iterator[WarcRecord] = {
    val buffered = new BufferedInputStream(raw, 1 << 16)
    buffered.mark(2)
    val m1 = buffered.read(); val m2 = buffered.read()
    buffered.reset()
    val in: InputStream =
      if (m1 == 0x1f && m2 == 0x8b) new GZIPInputStream(buffered, 1 << 16)
      else buffered
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var recSeq = 0L
      private var done = false
      private def advance(): Unit = {
        if (done || nextRec != null) return
        headerBlock(in) match {
          case None =>
            done = true
            try in.close() catch { case _: java.io.IOException => () }
          case Some(h) =>
            val len = h.getOrElse("content-length", "0").toLong
            val block = readFully(in, len)
            val wtype = h.getOrElse("warc-type", "unknown")
            val (status, mime, body) =
              if (wtype == "response") parseHttp(block) else (None, None, block)
            nextRec = WarcRecord(file, recSeq, wtype,
              h.get("warc-target-uri"), h.get("warc-date"), h.get("warc-record-id"),
              h.get("content-type"), len, status, mime, body)
            recSeq += 1
        }
      }
      override def hasNext: Boolean = { advance(); !done }
      override def next(): WarcRecord = {
        advance()
        if (done) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /** Split an HTTP response block into (status, content-type, body). A
    * block that is not an HTTP message comes back unparsed. */
  private def parseHttp(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    if (block.length < 5 ||
      new String(block, 0, 5, "ISO-8859-1") != "HTTP/")
      return (None, None, block)
    // header/body split: first CRLFCRLF (or LFLF)
    var i = 0; var split = -1; var sepLen = 0
    while (split < 0 && i < block.length - 1) {
      if (block(i) == '\n' &&
        (block(i + 1) == '\n' ||
          (block(i + 1) == '\r' && i + 2 < block.length && block(i + 2) == '\n'))) {
        split = i + 1; sepLen = if (block(i + 1) == '\n') 1 else 2
      }
      i += 1
    }
    if (split < 0) return (None, None, block)
    val head = new String(block, 0, split, "ISO-8859-1")
    val lines = head.split("\r?\n")
    val status = lines.head.split(" ").lift(1).flatMap(_.toIntOption)
    val mime = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(13).trim.split(";").head.trim.toLowerCase
    }
    val body = java.util.Arrays.copyOfRange(block, split + sepLen, block.length)
    (status, mime, body)
  }

  /** Read WARC segment files (plain or gzipped) under a glob into a
    * DataFrame of records. One task per segment file. */
  def read(spark: SparkSession, glob: String,
           minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (minPartitions > 0) minPartitions
    else spark.sparkContext.defaultMinPartitions
    spark.sparkContext.binaryFiles(glob, parts)
      .flatMap { case (path, pds) =>
        val in = pds.open()
        // parseStream closes at record-iterator EOF; the task-completion
        // listener is the backstop for partially consumed iterators
        // (limit/take early-out, task failure) — long-lived executors
        // scanning many segments must not accumulate open descriptors
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => () }
          })
        parseStream(in, path)
      }
      .toDF()
  }

  /** The text-pipeline view: successful HTML responses decoded as UTF-8,
    * ready for `TextAnalysis.htmlExtract` and the quality battery. */
  def htmlResponses(records: DataFrame): DataFrame =
    records
      .filter(col("warc_type") === "response" && col("http_status") === 200 &&
        col("http_content_type") === "text/html")
      .select(col("file"), col("record_seq"), col("target_uri"),
        col("warc_date"), decode(col("body"), "UTF-8").as("html"))
}
