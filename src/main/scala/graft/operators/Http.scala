package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * HTTP enrichment operators (ref: modules/web/app/tuktu/web/processors/
 * RESTProcessor.scala:20, FreeGeoIPProcessor.scala, URLCheckerProcessor.scala):
 * per-row REST calls as a `mapPartitions` stage — the per-row imperative I/O
 * the DataFrame API cannot express, kept OFF the driver.
 *
 * Scale design:
 *  - ONE `java.net.http.HttpClient` per executor JVM (`@transient lazy val`
 *    on the transport object): connection pooling / keep-alive across rows
 *    and partitions, no per-row socket churn.
 *  - A bounded in-flight window per partition (`maxInFlight`): requests are
 *    issued async ahead of the iterator cursor, so latency overlaps compute
 *    without the unbounded fan-out of the reference's Future.sequence-per-
 *    packet (which can open thousands of sockets on a wide packet).
 *  - Rows stream through; nothing is collected. Parallelism = partitions ×
 *    executors; repartition upstream to set the request concurrency budget.
 *  - Failures map to status codes (negative, per the reference's URLChecker
 *    convention) rather than task failures: a flaky endpoint must not kill a
 *    100 TB job; callers filter on the status column.
 *
 * The transport is pluggable (and serializable) so tests can stub it; specs
 * also run against a real local HTTP fixture server.
 */
object Http {

  /** (status, body); status < 0 encodes transport failure per the
    * reference's URLChecker convention (-1 connect, -2 timeout, -4 I/O). */
  final case class HttpResponse(status: Int, body: String)

  trait Transport extends Serializable {
    def request(method: String, url: String, body: Option[String],
                headers: Map[String, String]): java.util.concurrent.CompletableFuture[HttpResponse]
  }

  /** Default JDK transport: one shared client per JVM. */
  object JdkTransport extends Transport {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()

    def request(method: String, url: String, body: Option[String],
                headers: Map[String, String]): java.util.concurrent.CompletableFuture[HttpResponse] =
      try {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(10))
        headers.foreach { case (k, v) => b.header(k, v) }
        val pub = body.fold(java.net.http.HttpRequest.BodyPublishers.noBody())(
          java.net.http.HttpRequest.BodyPublishers.ofString(_))
        val req = b.method(method.toUpperCase, pub).build()
        client.sendAsync(req, java.net.http.HttpResponse.BodyHandlers.ofString())
          .thenApply[HttpResponse](r => HttpResponse(r.statusCode(), r.body()))
          .exceptionally(t => HttpResponse(statusOf(t), ""))
      } catch {
        case t: Throwable =>
          java.util.concurrent.CompletableFuture.completedFuture(HttpResponse(statusOf(t), ""))
      }

    private def statusOf(t: Throwable): Int = {
      val cause = if (t.getCause != null) t.getCause else t
      cause match {
        case _: java.net.ConnectException              => -1
        case _: java.net.http.HttpTimeoutException     => -2
        case _: IllegalArgumentException               => -3
        case _: java.io.IOException                    => -4
        case _                                         => -100
      }
    }
  }

  /** `${field}` template compiled against the schema: executor-side
    * per-row rendering with no reflection (same syntax as Expr.interpolate /
    * the reference's evaluateTuktuString). A dotted name resolves a nested
    * struct path (`${a.b}`) unless it matches a top-level column verbatim;
    * an unresolvable path fails at compile time naming the path. */
  private[operators] def compileTemplate(template: String, schema: StructType): Row => String = {
    // index chain: head into the row, tail into successively nested structs
    def resolve(name: String): List[Int] =
      if (schema.fieldNames.contains(name)) List(schema.fieldIndex(name))
      else {
        // -1 keeps trailing empty segments so "${host.}" is rejected, not
        // silently resolved to "host"
        val segs = name.split("\\.", -1).toList
        require(segs.forall(_.nonEmpty), s"template path $${$name}: empty segment")
        require(segs.nonEmpty && schema.fieldNames.contains(segs.head),
          s"template field not in schema: $${$name}")
        segs.tail.foldLeft((List(schema.fieldIndex(segs.head)), schema(segs.head).dataType)) {
          case ((idxs, st: StructType), seg) =>
            require(st.fieldNames.contains(seg), s"template path $${$name}: no field '$seg'")
            (idxs :+ st.fieldIndex(seg), st(seg).dataType)
          case ((_, dt), seg) =>
            throw new IllegalArgumentException(
              s"template path $${$name}: '$seg' reaches into non-struct type $dt")
        }._1
      }
    val parts = List.newBuilder[Either[String, List[Int]]]
    var i = 0
    val sb = new StringBuilder
    while (i < template.length) {
      if (template.charAt(i) == '$' && i + 1 < template.length && template.charAt(i + 1) == '{') {
        val end = template.indexOf('}', i + 2)
        require(end > 0, s"unterminated interpolation in: $template")
        if (sb.nonEmpty) { parts += Left(sb.toString); sb.clear() }
        parts += Right(resolve(template.substring(i + 2, end)))
        i = end + 1
      } else { sb.append(template.charAt(i)); i += 1 }
    }
    if (sb.nonEmpty) parts += Left(sb.toString)
    val compiled = parts.result()
    def walk(row: Row, idxs: List[Int]): String = idxs match {
      case idx :: rest =>
        if (row.isNullAt(idx)) ""
        else if (rest.isEmpty) String.valueOf(row.get(idx))
        else walk(row.getStruct(idx), rest)
      case Nil => ""
    }
    row => compiled.map {
      case Left(s)     => s
      case Right(idxs) => walk(row, idxs)
    }.mkString
  }

  /** RESTProcessor: per-row request to an interpolated URL; appends
    * `<result>` (body) and `<result>_status` columns. */
  def restEnrich(df: DataFrame, urlTemplate: String, result: String,
                 method: String = "GET", bodyTemplate: Option[String] = None,
                 headers: Map[String, String] = Map.empty,
                 maxInFlight: Int = 8,
                 transport: Transport = JdkTransport): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(result, StringType, nullable = true),
      StructField(result + "_status", IntegerType, nullable = false)))
    val inSchema = df.schema
    val rdd = df.rdd.mapPartitions { rows =>
      val renderUrl = compileTemplate(urlTemplate, inSchema)
      val renderBody = bodyTemplate.map(compileTemplate(_, inSchema))
      // sliding window: up to maxInFlight requests issued ahead of the cursor
      val inFlight = new scala.collection.mutable.ArrayDeque[(Row, java.util.concurrent.CompletableFuture[HttpResponse])]()
      def fill(): Unit =
        while (inFlight.size < maxInFlight && rows.hasNext) {
          val row = rows.next()
          inFlight.append((row,
            transport.request(method, renderUrl(row), renderBody.map(_.apply(row)), headers)))
        }
      new Iterator[Row] {
        override def hasNext: Boolean = { fill(); inFlight.nonEmpty }
        override def next(): Row = {
          fill()
          val (row, fut) = inFlight.removeHead()
          val resp = fut.join()
          Row.fromSeq(row.toSeq ++ Seq(resp.body, resp.status))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** URLCheckerProcessor: HEAD the interpolated URL; result is the status
    * code, or — when `codes` is given — whether the status is among them. */
  def urlChecker(df: DataFrame, urlTemplate: String, result: String,
                 codes: Option[Seq[Int]] = None, maxInFlight: Int = 8,
                 transport: Transport = JdkTransport): DataFrame = {
    // uniquified temp name: a fixed one would collide with (and then drop)
    // a same-named input column
    val tmp = "__chk_" + java.util.UUID.randomUUID.toString.take(8)
    val checked = restEnrich(df, urlTemplate, tmp, method = "HEAD",
      maxInFlight = maxInFlight, transport = transport)
    import org.apache.spark.sql.functions._
    val status = col(tmp + "_status")
    val out = codes.fold[org.apache.spark.sql.Column](status)(cs => status.isInCollection(cs))
    checked.withColumn(result, out).drop(tmp, tmp + "_status")
  }

  /** FreeGeoIPProcessor: GET `<geoipurl>/<format>/<ip>` per row. The `ip`
    * config is a TuktuString like the reference's (evaluateTuktuString):
    * `"${addr}"` interpolates, a bare column name is shorthand for that
    * column, and anything else (e.g. a literal `"8.8.8.8"`) is used
    * verbatim — so reference configs run unchanged. A bare identifier that
    * is neither a column nor shaped like an address (no '.' or ':') is
    * almost certainly a typo'd column name, so it fails fast instead of
    * issuing a garbage request per row. */
  def freeGeoIp(df: DataFrame, ip: String, result: String,
                geoipUrl: String = "http://freegeoip.net", format: String = "json",
                maxInFlight: Int = 8, transport: Transport = JdkTransport): DataFrame = {
    val ipSegment =
      if (ip.contains("${")) ip
      else if (df.schema.fieldNames.contains(ip)) s"$${$ip}"
      else {
        require(ip.exists(c => c == '.' || c == ':'),
          s"freeGeoIp: '$ip' is neither a column (have: " +
            s"${df.schema.fieldNames.mkString(", ")}) nor a literal address")
        ip
      }
    restEnrich(df, s"$geoipUrl/$format/$ipSegment", result,
      maxInFlight = maxInFlight, transport = transport)
  }
}
