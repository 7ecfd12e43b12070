package graft.operators

import javax.xml.XMLConstants
import javax.xml.transform.TransformerFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * XSLT transformation of an XML string column (ref modules/dlib/app/tuktu/
 * dlib/processors/xsltProcessor.scala:29 — the reference compiles one JAXP
 * Transformer from a stylesheet URL and runs every datum through it).
 *
 * Spark shape: the stylesheet TEXT loads once on the driver (Hadoop FS —
 * file:/, hdfs://, s3a:// paths all work) and rides the closure; each
 * executor JVM compiles it into a shared thread-safe `Templates` exactly
 * once, and each row transforms through a lightweight per-call Transformer
 * (JAXP Transformers are not thread-safe; Templates are). UDF justified
 * like the other library automatons: JAXP is the same JDK machinery the
 * reference calls.
 *
 * XXE hardening: row XML is untrusted corpus data, so by default the JAXP
 * factory runs with FEATURE_SECURE_PROCESSING and all external access shut
 * off (ACCESS_EXTERNAL_DTD / ACCESS_EXTERNAL_STYLESHEET = "") — a hostile
 * row carrying a DOCTYPE external entity, or a stylesheet reaching out via
 * document()/xsl:include, fails the transform instead of reading executor
 * files or probing the network. Trusted stylesheets that genuinely need
 * document() can opt out with `secure = false`.
 */
object Xslt {
  @transient private lazy val compiled =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), javax.xml.transform.Templates]()

  private def factory(secure: Boolean): TransformerFactory = {
    val f = TransformerFactory.newInstance()
    if (secure) {
      f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
      // empty protocol list = no external DTDs (row XML entities) and no
      // external stylesheet fetches (document(), xsl:import/include)
      f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
      f.setAttribute(XMLConstants.ACCESS_EXTERNAL_STYLESHEET, "")
    }
    f
  }

  private def templates(xsl: String, secure: Boolean): javax.xml.transform.Templates =
    compiled.computeIfAbsent((xsl, secure), { case (s, sec) =>
      factory(sec).newTemplates(
        new javax.xml.transform.stream.StreamSource(new java.io.StringReader(s)))
    })

  /** Stylesheet text from any Hadoop-visible path (the reference's
    * `Source.fromURL`). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
           encoding: String = "UTF-8"): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, encoding)
    } finally in.close()
  }

  /** Transform each row's XML through the stylesheet. `secure = false` only
    * for trusted stylesheets that need document()/external DTDs. */
  def transformColumn(xml: Column, xslText: String, secure: Boolean = true): Column =
    udf { (x: String) =>
      if (x == null) null
      else {
        val w = new java.io.StringWriter()
        templates(xslText, secure).newTransformer().transform(
          new javax.xml.transform.stream.StreamSource(new java.io.StringReader(x)),
          new javax.xml.transform.stream.StreamResult(w))
        w.toString
      }
    }.apply(xml)
}
