package graft.schema

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HttpRegistryTransport]] against a REAL HTTP server — an in-JVM
  * loopback `com.sun.net.httpserver.HttpServer` implementing the two
  * Confluent REST endpoints over an [[InMemoryRegistryTransport]]
  * store (zero egress; production points `baseUrl` at a live
  * registry). Proves the wire layer end-to-end: URL shapes, JSON
  * escaping of schemas containing quotes/newlines/unicode, Basic
  * auth header, 404/40403 unknown-id failure, and the client cache
  * absorbing repeat calls — then a full Spark encode→decode through
  * a registry resolved over HTTP. */
class HttpRegistryTransportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper

  /** Loopback registry server; returns (baseUrl, store, seenAuth, stop). */
  private def startServer(): (String, InMemoryRegistryTransport,
      java.util.List[String], () => Unit) = {
    val store = new InMemoryRegistryTransport
    val seenAuth = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    server.createContext("/schemas/ids/", (ex: HttpExchange) => {
      seenAuth.add(ex.getRequestHeaders.getFirst("Authorization"))
      val id = ex.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
      try {
        val schema = store.fetchById(id)
        val node = mapper.createObjectNode()
        node.put("schema", schema)
        respond(ex, 200, mapper.writeValueAsString(node))
      } catch {
        case _: IllegalArgumentException =>
          respond(ex, 404,
            """{"error_code":40403,"message":"Schema not found"}""")
      }
    })
    server.createContext("/subjects/", (ex: HttpExchange) => {
      seenAuth.add(ex.getRequestHeaders.getFirst("Authorization"))
      val path = ex.getRequestURI.getPath.stripPrefix("/subjects/")
      if (ex.getRequestMethod == "GET" && path.endsWith("/versions/latest")) {
        val subject = path.stripSuffix("/versions/latest")
        try {
          val l = store.latestVersion(subject)
          val node = mapper.createObjectNode()
          node.put("subject", subject)
          node.put("version", l.version)
          node.put("id", l.id)
          node.put("schema", l.schemaJson)
          respond(ex, 200, mapper.writeValueAsString(node))
        } catch {
          case _: IllegalArgumentException =>
            respond(ex, 404,
              """{"error_code":40401,"message":"Subject not found"}""")
        }
      } else {
        val subject = path.stripSuffix("/versions")
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val schema = mapper.readTree(body).get("schema").asText()
        val node = mapper.createObjectNode()
        node.put("id", store.register(subject, schema))
        respond(ex, 200, mapper.writeValueAsString(node))
      }
    })
    server.createContext("/compatibility/subjects/", (ex: HttpExchange) => {
      seenAuth.add(ex.getRequestHeaders.getFirst("Authorization"))
      val subject = ex.getRequestURI.getPath
        .stripPrefix("/compatibility/subjects/")
        .stripSuffix("/versions/latest")
      val body = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      val schema = mapper.readTree(body).get("schema").asText()
      try {
        val node = mapper.createObjectNode()
        node.put("is_compatible", store.checkCompatibility(subject, schema))
        respond(ex, 200, mapper.writeValueAsString(node))
      } catch {
        case e: RegistryErrorException =>
          respond(ex, e.httpStatus,
            s"""{"error_code":${e.errorCode},"message":"${e.getMessage
              .replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
      }
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}", store, seenAuth,
      () => server.stop(0))
  }

  // quotes, newline-in-doc, unicode: the JSON-escaping gauntlet
  private val gnarlyJson =
    """{"type":"record","name":"E","doc":"line1\nlïne2 \"q\"","fields":[
      | {"name":"a","type":"long"}]}""".stripMargin

  test("register → fetch round-trips over real HTTP, escaping intact") {
    val (url, store, _, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url)
      val id = t.register("topic-value", gnarlyJson)
      assert(t.fetchById(id) === gnarlyJson)
      // idempotent per the registry contract, server-side
      assert(t.register("topic-value", gnarlyJson) === id)
      assert(t.register("other-value", gnarlyJson) === id)
      assert(store.registerCount === 3)
    } finally stop()
  }

  test("subject names percent-encode as a PATH segment (space != '+')") {
    val (url, store, _, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url)
      val id = t.register("odd subject/ü-value", gnarlyJson)
      assert(t.fetchById(id) === gnarlyJson)
      // the server saw the DECODED subject — a '+' in the path would
      // have arrived as a literal plus, not the original space
      assert(t.register("odd subject/ü-value", gnarlyJson) === id)
      assert(store.registerCount === 2)
    } finally stop()
  }

  test("unknown id fails loudly with the registry's 40403") {
    val (url, _, _, stop) = startServer()
    try {
      val e = intercept[IllegalArgumentException](
        new HttpRegistryTransport(url).fetchById(404))
      assert(e.getMessage.contains("HTTP 404"))
      assert(e.getMessage.contains("40403"))
    } finally stop()
  }

  test("basic auth header reaches the server on every call") {
    val (url, _, seenAuth, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url,
        basicAuth = Some(("user", "s3cret")))
      val id = t.register("topic-value", gnarlyJson)
      t.fetchById(id)
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("user:s3cret".getBytes(StandardCharsets.UTF_8))
      seenAuth.forEach(h => assert(h === expected))
      assert(seenAuth.size === 2)
    } finally stop()
  }

  test("bearer token header reaches the server on every call") {
    val (url, _, seenAuth, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url,
        bearerToken = Some("tok-abc.123"))
      val id = t.register("topic-value", gnarlyJson)
      t.fetchById(id)
      t.latestVersion("topic-value")
      seenAuth.forEach(h => assert(h === "Bearer tok-abc.123"))
      assert(seenAuth.size === 3)
    } finally stop()
  }

  test("basic auth and bearer token together are rejected at construction") {
    val e = intercept[IllegalArgumentException](
      new HttpRegistryTransport("http://x",
        basicAuth = Some(("u", "p")), bearerToken = Some("t")))
    assert(e.getMessage.contains("mutually"))
  }

  test("client cache over HTTP: repeat fetches never re-hit the wire") {
    val (url, store, _, stop) = startServer()
    try {
      val producer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      val id = producer.register("topic-value", gnarlyJson)
      val consumer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      (1 to 5).foreach(_ => assert(consumer.fetchById(id) === gnarlyJson))
      assert(store.fetchCount === 1)
    } finally stop()
  }

  /** Fault-injecting reverse proxy in front of a real registry server:
    * the first `failFirst` requests get `failCode`, the rest delegate
    * to the inner handler. Returns (baseUrl, requestCount, stop). */
  private def startFlaky(inner: String, failFirst: Int, failCode: Int)
      : (String, java.util.concurrent.atomic.AtomicInteger, () => Unit) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      if (n.incrementAndGet() <= failFirst) {
        val b = """{"error_code":50001,"message":"backend down"}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(failCode, b.length)
        ex.getResponseBody.write(b)
        ex.close()
      } else {
        // delegate verbatim (method, path, body) to the real server
        val uri = java.net.URI.create(inner + ex.getRequestURI.toString)
        val client = java.net.http.HttpClient.newHttpClient()
        val req0 = java.net.http.HttpRequest.newBuilder(uri)
        val req = (if (ex.getRequestMethod == "POST")
          req0.POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(
            ex.getRequestBody.readAllBytes()))
        else req0.GET()).build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        ex.sendResponseHeaders(resp.statusCode(), resp.body().length)
        ex.getResponseBody.write(resp.body())
        ex.close()
      }
    })
    server.start()
    (s"http://127.0.0.1:${server.getAddress.getPort}", n, () => server.stop(0))
  }

  /** Server answering every request with `code` and a Location header
    * built by `location` from (own base url, request path) — a
    * redirect front (point it at the real server) or a redirect loop
    * (point it at itself). */
  private def startRedirect(code: Int,
      location: (String, String) => String): (String, () => Unit) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val self = s"http://127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes() // drain (POST bodies)
      ex.getResponseHeaders.set("Location",
        location(self, ex.getRequestURI.toString))
      val b = "redirect".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    (self, () => server.stop(0))
  }

  test("an http redirect front is followed transparently (Redirect.NORMAL)") {
    val (inner, _, _, stopInner) = startServer()
    val (url, stopRedir) = startRedirect(302, (_, path) => inner + path)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      // register straight at the registry (a 302 front converts POST
      // to GET per RFC — fronts that redirect POSTs use 307/308); the
      // GET endpoints are the ones http→https fronts serve in practice
      val id = new HttpRegistryTransport(inner).register("topic-value",
        gnarlyJson)
      val t = new HttpRegistryTransport(url, sleeper = sleeps += _)
      assert(t.fetchById(id) === gnarlyJson)
      assert(t.latestVersion("topic-value").schemaJson === gnarlyJson)
      assert(sleeps.isEmpty, "a followable redirect must not burn retries")
    } finally { stopRedir(); stopInner() }
  }

  test("a redirect LOOP fails FAST as misconfiguration, not retried") {
    // 301 → itself: the NORMAL policy follows until its redirect
    // budget runs out, then the final 3xx reaches the classifier —
    // permanent misconfiguration, zero retries burned
    val (url, stopRedir) = startRedirect(301, (self, path) => self + path)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val t = new HttpRegistryTransport(url, maxRetries = 3,
        sleeper = sleeps += _)
      val e = intercept[IllegalArgumentException](t.fetchById(1))
      assert(e.getMessage.contains("misconfigured"))
      assert(sleeps.isEmpty, "3xx must not burn the retry budget")
    } finally stopRedir()
  }

  test("a 302 front rewriting register's POST to GET is reported as a redirect") {
    // the JDK client downgrades POST to GET on 301/302/303, so the
    // final request GETs /subjects/{s}/versions — the registry's
    // VERSION LIST endpoint, whose body has no id. The error must name
    // the rewrite, not claim a malformed registry response.
    val inner = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    inner.createContext("/subjects/", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val b = "[1,2]".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    inner.start()
    val innerUrl = s"http://127.0.0.1:${inner.getAddress.getPort}"
    val (url, stopRedir) = startRedirect(302, (_, path) => innerUrl + path)
    try {
      val t = new HttpRegistryTransport(url)
      val e = intercept[IllegalArgumentException](
        t.register("topic-value", gnarlyJson))
      assert(e.getMessage.contains("rewrote POST to GET"))
      assert(e.getMessage.contains("307/308"))
    } finally { stopRedir(); inner.stop(0) }
  }

  test("backoff cap is clamped: huge maxRetries neither overflows nor sleeps unbounded") {
    val (inner, _, _, stopInner) = startServer()
    val (url, hits, stopFlaky) = startFlaky(inner, failFirst = 9999, 503)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      // attempt 55+ would shift retryBaseMs into negative Long territory
      // without the clamp, making ThreadLocalRandom.nextLong throw —
      // the wrong exception class at exactly the wrong moment
      val t = new HttpRegistryTransport(url, maxRetries = 60,
        retryBaseMs = 200L, sleeper = sleeps += _)
      val e = intercept[RegistryUnavailableException](t.fetchById(1))
      assert(e.getMessage.contains("HTTP 503"))
      assert(hits.get() === 61)
      assert(sleeps.size === 60)
      assert(sleeps.forall(s => s >= 0 && s <= 60000L),
        s"all sleeps inside the 60s cap: ${sleeps.max}")
    } finally { stopFlaky(); stopInner() }
  }

  test("5xx is retried with backoff: 503,503,200 succeeds; sleeps recorded") {
    val (inner, _, _, stopInner) = startServer()
    val (url, hits, stopFlaky) = startFlaky(inner, failFirst = 2, 503)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val t = new HttpRegistryTransport(url, maxRetries = 3,
        retryBaseMs = 50L, sleeper = sleeps += _)
      val id = t.register("topic-value", gnarlyJson)
      assert(t.fetchById(id) === gnarlyJson)
      assert(hits.get() === 4) // 2 × 503 + retried register + fetch
      assert(sleeps.size === 2)
      // full jitter: uniform(0, 50·2^k) for attempt k
      assert(sleeps(0) >= 0 && sleeps(0) <= 50)
      assert(sleeps(1) >= 0 && sleeps(1) <= 100)
    } finally { stopFlaky(); stopInner() }
  }

  test("exhausted retries throw RegistryUnavailableException, not a caller error") {
    val (inner, _, _, stopInner) = startServer()
    val (url, hits, stopFlaky) = startFlaky(inner, failFirst = 99, 503)
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val t = new HttpRegistryTransport(url, maxRetries = 2,
        retryBaseMs = 10L, sleeper = sleeps += _)
      val e = intercept[RegistryUnavailableException](t.fetchById(1))
      assert(e.getMessage.contains("HTTP 503"))
      assert(hits.get() === 3) // 1 try + 2 retries
      assert(sleeps.size === 2)
    } finally { stopFlaky(); stopInner() }
  }

  test("4xx is NEVER retried: one request, immediate caller error") {
    val (url, _, _, stop) = startServer()
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      val t = new HttpRegistryTransport(url, maxRetries = 3,
        sleeper = sleeps += _)
      intercept[IllegalArgumentException](t.fetchById(404))
      assert(sleeps.isEmpty)
    } finally stop()
  }

  test("connection-level IOException becomes RegistryUnavailableException") {
    // a port nothing listens on: connect is refused at the socket layer
    val dead = {
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort
      s.close(); s"http://127.0.0.1:$p"
    }
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val t = new HttpRegistryTransport(dead, maxRetries = 1,
      retryBaseMs = 1L, sleeper = sleeps += _)
    val e = intercept[RegistryUnavailableException](t.fetchById(1))
    assert(e.getCause.isInstanceOf[java.io.IOException])
    assert(sleeps.size === 1)
  }

  test("latest-version plan path: consumer plans with NO pre-known writer ids") {
    val (url, _, _, stop) = startServer()
    try {
      val v1 =
        """{"type":"record","name":"E","fields":[
          | {"name":"a","type":"long"}]}""".stripMargin
      val v2 =
        """{"type":"record","name":"E","fields":[
          | {"name":"a","type":"long"},
          | {"name":"b","type":"string","default":"d"}]}""".stripMargin
      val producer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      producer.register("orders-value", v1)
      val w2 = producer.framedBackend("orders-value", v2)
      val frames = spark.range(3).select(
        w2.encodeExpr(struct(col("id").as("a"), lit("x").as("b"))).as("bin"))
      // the consumer knows ONLY the subject: latest resolves v2's id
      val consumer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      val l = consumer.latest("orders-value")
      assert(l.version === 2 && l.id === w2.schemaId)
      val reader = consumer.readerBackendLatest("orders-value")
      val got = frames.select(reader.decodeExpr(col("bin")).as("p"))
        .select("p.*").as[(Long, String)].collect().toSet
      assert(got === Set((0L, "x"), (1L, "x"), (2L, "x")))
      // still decode-only: encode refusal survives the latest path
      intercept[UnsupportedOperationException](
        reader.encodeExpr(struct(lit(1L).as("a"), lit("y").as("b"))))
      // unknown subject: loud 40401, a caller error
      val e = intercept[IllegalArgumentException](
        consumer.latest("ghost-value"))
      assert(e.getMessage.contains("40401"))
    } finally stop()
  }

  test("Spark encode→decode through a registry resolved over HTTP") {
    val (url, _, _, stop) = startServer()
    try {
      val writerJson =
        """{"type":"record","name":"E","fields":[
          | {"name":"a","type":"long"}]}""".stripMargin
      val readerJson =
        """{"type":"record","name":"E","fields":[
          | {"name":"a","type":"long"},
          | {"name":"b","type":"string","default":"d"}]}""".stripMargin
      val producer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      val w = producer.framedBackend("orders-value", writerJson)
      val frames = spark.range(3).select(
        w.encodeExpr(struct(col("id").as("a"))).as("bin"))
      val consumer = new SchemaRegistryClient(new HttpRegistryTransport(url))
      val reader = consumer.framedBackend("orders-value", readerJson,
        writerIds = Seq(w.schemaId))
      val got = frames.select(reader.decodeExpr(col("bin")).as("p"))
        .select("p.*").as[(Long, String)].collect().toSet
      assert(got === Set((0L, "d"), (1L, "d"), (2L, "d")))
    } finally stop()
  }

  // ---- round-16: compatibility endpoint + typed 4xx taxonomy -----------

  private val baseJson =
    """{"type":"record","name":"C","fields":[
      | {"name":"a","type":"long"}]}""".stripMargin
  private val compatibleJson = // adds a defaulted field: BACKWARD-ok
    """{"type":"record","name":"C","fields":[
      | {"name":"a","type":"long"},
      | {"name":"b","type":"string","default":"d"}]}""".stripMargin
  private val breakingJson = // retypes a: BACKWARD-incompatible
    """{"type":"record","name":"C","fields":[
      | {"name":"a","type":"string"}]}""".stripMargin

  test("compatibility endpoint over HTTP: compatible true, breaking false") {
    val (url, _, _, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url)
      t.register("c-value", baseJson)
      assert(t.checkCompatibility("c-value", compatibleJson))
      assert(!t.checkCompatibility("c-value", breakingJson))
    } finally stop()
  }

  test("typed 4xx taxonomy over HTTP: 404/40401 vs 404/40403 vs 422/42201") {
    val (url, _, _, stop) = startServer()
    try {
      val t = new HttpRegistryTransport(url)
      val ghost = intercept[RegistryErrorException](
        t.checkCompatibility("ghost-value", baseJson))
      assert(ghost.httpStatus === 404 && ghost.isSubjectNotFound, ghost)
      val noId = intercept[RegistryErrorException](t.fetchById(404))
      assert(noId.httpStatus === 404 && noId.isSchemaNotFound, noId)
      t.register("c-value", baseJson)
      val invalid = intercept[RegistryErrorException](
        t.checkCompatibility("c-value", "{not avro json"))
      assert(invalid.httpStatus === 422 && invalid.isInvalidSchema, invalid)
    } finally stop()
  }

  test("registerChecked over HTTP: breaking change refused with typed 409, compatible registers") {
    val (url, store, _, stop) = startServer()
    try {
      val client = new SchemaRegistryClient(new HttpRegistryTransport(url))
      // unknown subject: first version registers directly
      val id1 = client.registerChecked("c-value", baseJson)
      assert(store.registerCount === 1)
      // compatible evolution passes the gate and registers
      val id2 = client.registerChecked("c-value", compatibleJson)
      assert(id2 !== id1)
      // breaking change: refused BEFORE the registry sees a register
      val e = intercept[RegistryErrorException](
        client.registerChecked("c-value", breakingJson))
      assert(e.isIncompatible, e)
      assert(store.registerCount === 2) // no third register attempt
    } finally stop()
  }

  test("config-wired gate: checkCompatibilityOnRegister routes register through the check") {
    val (url, store, _, stop) = startServer()
    try {
      val cfg = graft.model.GraftConfigFile.parse(
        """schema.backend = avro_registry
          |schema.registry_check_compatibility = true""".stripMargin)
      assert(cfg.schema.registryCheckCompatibility)
      val client = new SchemaRegistryClient(new HttpRegistryTransport(url),
        checkCompatibilityOnRegister = cfg.schema.registryCheckCompatibility)
      client.register("c-value", baseJson)
      intercept[RegistryErrorException](
        client.register("c-value", breakingJson))
      assert(store.registerCount === 1)
    } finally stop()
  }
}
