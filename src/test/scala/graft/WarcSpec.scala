package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.sources.Warc

/** WARC source: record framing, HTTP response parsing, gzip layouts. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val crlf = "\r\n"

  private def record(wtype: String, uri: Option[String], block: Array[Byte],
                     extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0" + crlf
    h ++= s"WARC-Type: $wtype" + crlf
    uri.foreach(u => h ++= s"WARC-Target-URI: $u" + crlf)
    h ++= "WARC-Date: 2026-08-13T00:00:00Z" + crlf
    h ++= s"WARC-Record-ID: <urn:uuid:$wtype-${uri.getOrElse("x")}>" + crlf
    extra.foreach { case (k, v) => h ++= s"$k: $v" + crlf }
    h ++= s"Content-Length: ${block.length}" + crlf + crlf
    h.toString.getBytes("ISO-8859-1") ++ block ++ (crlf + crlf).getBytes("ISO-8859-1")
  }

  private def httpBlock(status: Int, mime: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK" + crlf + s"Content-Type: $mime; charset=utf-8" + crlf +
      "Server: test" + crlf + crlf + body).getBytes("UTF-8")

  private def sampleWarc(): Array[Byte] =
    record("warcinfo", None, ("software: graft-test" + crlf).getBytes("ISO-8859-1"),
      Seq("Content-Type" -> "application/warc-fields")) ++
      record("response", Some("http://example.test/a"),
        httpBlock(200, "text/html", "<html><body>Hello <b>Warc</b></body></html>"),
        Seq("Content-Type" -> "application/http; msgtype=response")) ++
      record("request", Some("http://example.test/a"),
        ("GET /a HTTP/1.1" + crlf + crlf).getBytes("ISO-8859-1")) ++
      record("response", Some("http://example.test/missing"),
        httpBlock(404, "text/plain", "nope"))

  private def writeTmp(suffix: String, bytes: Array[Byte]): String = {
    val f = Files.createTempFile("warc_spec", suffix)
    val out = new FileOutputStream(f.toFile)
    out.write(bytes); out.close()
    f.toString
  }

  test("plain WARC: framing, headers, HTTP split") {
    val path = writeTmp(".warc", sampleWarc())
    val df = Warc.read(spark, path)
    val rows = df.orderBy("record_seq").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "response", "request", "response"))
    val ok = rows(1)
    assert(ok.getAs[String]("target_uri") == "http://example.test/a")
    assert(ok.getAs[Int]("http_status") == 200)
    assert(ok.getAs[String]("http_content_type") == "text/html")
    assert(new String(ok.getAs[Array[Byte]]("body"), "UTF-8")
      .startsWith("<html><body>Hello"))
    assert(rows(3).getAs[Int]("http_status") == 404)
    // the request block is not an HTTP *response*: raw block, no status
    assert(rows(2).isNullAt(rows(2).fieldIndex("http_status")))
  }

  test("gzip layouts: whole-file and member-per-record both stream") {
    val whole = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(whole)
    gz.write(sampleWarc()); gz.close()
    val perRecord = {
      val bos = new ByteArrayOutputStream()
      def member(b: Array[Byte]): Unit = {
        val g = new GZIPOutputStream(bos); g.write(b); g.close()
      }
      member(record("response", Some("http://example.test/1"),
        httpBlock(200, "text/html", "<p>one</p>")))
      member(record("response", Some("http://example.test/2"),
        httpBlock(200, "text/html", "<p>two</p>")))
      bos.toByteArray
    }
    val p1 = writeTmp(".warc.gz", whole.toByteArray)
    val p2 = writeTmp(".warc.gz", perRecord)
    assert(Warc.read(spark, p1).count() == 4)
    val two = Warc.read(spark, p2).orderBy("record_seq")
      .select("target_uri").as[String].collect()
    assert(two.toSeq == Seq("http://example.test/1", "http://example.test/2"))
  }

  test("end-to-end corpus build: WARC → html → quality battery → dedup") {
    import graft.operators.{Dedup, Html, TextAnalysis}
    // a crawl with a boilerplate page fetched twice under different URLs,
    // a good article, and a low-quality stub
    val article = "<html><body><p>" +
      ("the quick brown fox jumps over that lazy dog have with " * 6).trim +
      "</p></body></html>"
    val boiler = "<html><body><p>buy now click here</p></body></html>"
    val crawl =
      record("response", Some("http://a.test/article"),
        httpBlock(200, "text/html", article)) ++
        record("response", Some("http://b.test/mirror-1"),
          httpBlock(200, "text/html", boiler)) ++
        record("response", Some("http://b.test/mirror-2"),
          httpBlock(200, "text/html", boiler)) ++
        record("response", Some("http://c.test/404"),
          httpBlock(404, "text/html", "<p>gone</p>"))
    val path = writeTmp(".warc", crawl)
    val docs = graft.operators.Html.extract(
      Warc.htmlResponses(Warc.read(spark, path))
        .select(col("record_seq").as("doc_id"), col("target_uri"), col("html")),
      "html", "text")
    assert(docs.count() == 3) // the 404 never enters the corpus
    // quality gate: the article passes Gopher, the boilerplate stubs fail
    val q = TextAnalysis.gopherFilter(docs, "text")
      .select("target_uri", "keep").as[(String, Boolean)].collect().toMap
    assert(q("http://a.test/article"))
    assert(!q("http://b.test/mirror-1") && !q("http://b.test/mirror-2"))
    // dedup stage still collapses the mirrored fetches
    val dd = Dedup.exactDedup(docs, "text", "doc_id")
    assert(dd.count() == 2)
    assert(dd.filter(col("dup_count") === 2).count() == 1)
  }

  test("htmlResponses filters to 200 text/html and feeds htmlExtract") {
    val path = writeTmp(".warc", sampleWarc())
    val html = Warc.htmlResponses(Warc.read(spark, path))
    val rows = html.collect()
    assert(rows.length == 1)
    val text = graft.operators.Html.extract(
      html.select(col("record_seq").as("doc_id"), col("html")),
      "html", "extracted_text")
    val extracted = text.select("extracted_text").as[String].head()
    assert(extracted.contains("Hello") && extracted.contains("Warc")
      && !extracted.contains("<b>"))
  }
}
