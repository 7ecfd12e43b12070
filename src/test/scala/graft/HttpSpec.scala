package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import graft.operators.Http
import graft.engine.Flow

/** HTTP enrichment against a real local fixture server (no egress needed):
  * template interpolation, POST bodies, bounded in-flight, failure-as-status,
  * and the Tuktu FQCN configs through the flow front-end. */
class HttpSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val hits = new java.util.concurrent.atomic.AtomicInteger(0)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes("UTF-8")
      // HEAD must not carry a body: -1 response length signals none
      val len = if (ex.getRequestMethod == "HEAD") -1 else bytes.length.toLong
      ex.sendResponseHeaders(status, len)
      if (ex.getRequestMethod != "HEAD") ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/echo/", (ex: HttpExchange) => {
      hits.incrementAndGet()
      reply(ex, 200, "hello-" + ex.getRequestURI.getPath.stripPrefix("/echo/"))
    })
    server.createContext("/post", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      reply(ex, 200, "got:" + body)
    })
    server.createContext("/missing", (ex: HttpExchange) => reply(ex, 404, "nope"))
    server.setExecutor(null)
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("restEnrich GET interpolates the URL per row and appends body + status") {
    val df = Seq(("a", 1), ("b", 2)).toDF("name", "id")
    val out = Http.restEnrich(df, s"http://127.0.0.1:$port/echo/$${name}", "resp")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("resp")).toSeq == Seq("hello-a", "hello-b"))
    assert(out.map(_.getAs[Int]("resp_status")).toSeq == Seq(200, 200))
  }

  test("restEnrich POST renders the body template") {
    val df = Seq(("x", 7)).toDF("k", "v")
    val out = Http.restEnrich(df, s"http://127.0.0.1:$port/post", "resp",
      method = "POST", bodyTemplate = Some("""{"k":"${k}","v":${v}}"""))
      .head
    assert(out.getAs[String]("resp") == """got:{"k":"x","v":7}""")
  }

  test("failures become negative status codes, not task failures") {
    // nothing listens on this port: connection refused → -1 per the
    // reference's URLChecker convention
    val df = Seq(("a", 1)).toDF("name", "id")
    val out = Http.restEnrich(df, "http://127.0.0.1:1/echo/x", "resp").head
    assert(out.getAs[Int]("resp_status") < 0)
  }

  test("urlChecker returns the code, or membership when codes are given") {
    val df = Seq(("ok", s"http://127.0.0.1:$port/echo/x"),
                 ("missing", s"http://127.0.0.1:$port/missing")).toDF("tag", "url")
    val codesOut = Http.urlChecker(df, "${url}", "valid", codes = Some(Seq(200)))
      .select("tag", "valid").as[(String, Boolean)].collect().toMap
    assert(codesOut == Map("ok" -> true, "missing" -> false))
    val rawOut = Http.urlChecker(df, "${url}", "code")
      .select("tag", "code").as[(String, Int)].collect().toMap
    assert(rawOut == Map("ok" -> 200, "missing" -> 404))
  }

  test("bounded in-flight window issues every request exactly once") {
    hits.set(0)
    val df = (1 to 40).map(i => (s"n$i", i)).toDF("name", "id").repartition(2)
    val out = Http.restEnrich(df, s"http://127.0.0.1:$port/echo/$${name}", "resp",
      maxInFlight = 4)
    assert(out.filter(col("resp_status") === 200).count() == 40)
    assert(hits.get() == 40)
  }

  test("RESTProcessor / FreeGeoIPProcessor FQCN configs run through the flow") {
    val flow = s"""
    { "generators": [
        {"id": "g", "name": "list", "config": {"rows": [{"ip": "1.2.3.4"}]},
         "next": ["geo"]} ],
      "processors": [
        {"id": "geo", "name": "tuktu.web.processors.FreeGeoIPProcessor",
         "result": "geo",
         "config": {"ip": "ip", "geoipurl": "http://127.0.0.1:$port/echo", "format": "json"},
         "next": []} ] }"""
    val r = Flow.runSingle(spark, flow).head
    assert(r.getAs[String]("geo") == "hello-json/1.2.3.4")
  }

  test("freeGeoIp ip config is a TuktuString: template, column name, or literal") {
    val df = Seq(("8.8.4.4", 1)).toDF("addr", "id")
    // "${addr}" template — reference configs pass evaluateTuktuString input
    val t = Http.freeGeoIp(df, "${addr}", "geo",
      geoipUrl = s"http://127.0.0.1:$port/echo", format = "json").head
    assert(t.getAs[String]("geo") == "hello-json/8.8.4.4")
    // bare column name shorthand
    val c = Http.freeGeoIp(df, "addr", "geo",
      geoipUrl = s"http://127.0.0.1:$port/echo", format = "json").head
    assert(c.getAs[String]("geo") == "hello-json/8.8.4.4")
    // literal IP, not a column: used verbatim for every row
    val l = Http.freeGeoIp(df, "9.9.9.9", "geo",
      geoipUrl = s"http://127.0.0.1:$port/echo", format = "json").head
    assert(l.getAs[String]("geo") == "hello-json/9.9.9.9")
    // a bare identifier that is neither a column nor address-shaped is a
    // typo'd column name: fail fast, naming the schema
    val typo = intercept[IllegalArgumentException] {
      Http.freeGeoIp(df, "adddr", "geo",
        geoipUrl = s"http://127.0.0.1:$port/echo", format = "json")
    }
    assert(typo.getMessage.contains("adddr") && typo.getMessage.contains("addr"))
  }

  test("templates resolve nested struct paths and reject bad ones at compile time") {
    val df = Seq(("a", "x", 1)).toDF("outer", "inner", "id")
      .select(struct(col("outer").as("o"), struct(col("inner").as("i")).as("mid")).as("s"), col("id"))
    val out = Http.restEnrich(df, s"http://127.0.0.1:$port/echo/$${s.o}-$${s.mid.i}", "resp").head
    assert(out.getAs[String]("resp") == "hello-a-x")
    // a top-level column whose name contains a dot wins over path-splitting
    val dotted = df.select(col("id"), lit("z").as("a.b"))
    val d = Http.restEnrich(dotted, s"http://127.0.0.1:$port/echo/$${a.b}", "resp").head
    assert(d.getAs[String]("resp") == "hello-z")
    // unresolvable path: clear error naming the path, raised when the task runs
    val err = intercept[Exception] {
      Http.restEnrich(df, s"http://127.0.0.1:$port/echo/$${s.nope}", "resp").head
    }
    assert(err.getMessage.contains("s.nope") || err.getCause.getMessage.contains("s.nope"))
    // a trailing dot is a malformed path, not a silent resolve of the prefix
    val trail = intercept[Exception] {
      Http.restEnrich(df, s"http://127.0.0.1:$port/echo/$${s.}", "resp").head
    }
    assert(trail.getMessage.contains("empty segment") ||
      trail.getCause.getMessage.contains("empty segment"))
  }
}
