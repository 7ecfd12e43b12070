package graft.sources

import javax.xml.XMLConstants
import javax.xml.parsers.{SAXParser, SAXParserFactory}

/**
 * Hardened XML parsing for untrusted content (row XML from scraped corpora,
 * XLSX part streams). The JAXP defaults resolve DOCTYPE external entities,
 * so a hostile document can exfiltrate executor-local files or probe the
 * network (XXE/SSRF) — at 100 TB of scraped web data, hostile documents are
 * a certainty, not an edge case.
 *
 * Policy: DOCTYPE declarations are rejected outright (disallow-doctype-decl)
 * and external general/parameter entities are disabled, alongside JAXP
 * secure processing. Data XML never legitimately needs a DTD; a document
 * carrying one fails the parse and surfaces as a per-row error.
 */
object SecureXml {
  // SAXParser is reusable but not thread-safe; executor task threads each
  // get their own via ThreadLocal (parser construction is the costly part).
  private val parsers: ThreadLocal[SAXParser] =
    ThreadLocal.withInitial { () =>
      val f = SAXParserFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
      f.newSAXParser()
    }

  private def loader: scala.xml.factory.XMLLoader[scala.xml.Elem] =
    scala.xml.XML.withSAXParser(parsers.get())

  def loadString(s: String): scala.xml.Elem = loader.loadString(s)

  def load(in: java.io.InputStream): scala.xml.Elem = loader.load(in)
}
