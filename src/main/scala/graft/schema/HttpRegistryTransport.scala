package graft.schema

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** HTTP [[RegistryTransport]] speaking the public Confluent schema
  * registry REST protocol — the same two endpoints the reference's
  * backend reaches through its registry client
  * (`avro_schema_registry.rb:10-19`):
  *
  *   - `GET {base}/schemas/ids/{id}` → `{"schema": "<json>"}`
  *     (404 body carries `error_code` 40403 for unknown ids)
  *   - `POST {base}/subjects/{subject}/versions` with
  *     `{"schema": "<json>"}` → `{"id": N}` (idempotent: re-posting a
  *     registered schema returns its existing global id)
  *
  * Built on the JDK's `java.net.http.HttpClient` — no extra
  * dependency — with optional HTTP Basic auth (the registry's
  * standard auth mode). Any non-2xx response fails loudly with the
  * status and body: per the [[RegistryTransport]] contract an unknown
  * id must never decode as a guess.
  *
  * Scale contract: like every transport, this is DRIVER-side planning
  * only — [[SchemaRegistryClient]] caches each id/registration for
  * its lifetime and bakes resolved schemas into the codegen'd
  * expressions, so executors never hold a connection to the registry.
  */
class HttpRegistryTransport(baseUrl: String,
    basicAuth: Option[(String, String)] = None,
    timeoutMs: Long = 10000L) extends RegistryTransport {

  private val mapper = new ObjectMapper
  private val base = baseUrl.stripSuffix("/")
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  private val ContentType = "application/vnd.schemaregistry.v1+json"

  private def finish(b: HttpRequest.Builder): HttpRequest = {
    val withAuth = basicAuth.fold(b) { case (user, pass) =>
      val tok = java.util.Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(StandardCharsets.UTF_8))
      b.header("Authorization", s"Basic $tok")
    }
    withAuth.timeout(Duration.ofMillis(timeoutMs))
      .header("Accept", ContentType).build()
  }

  private def send(req: HttpRequest, what: String): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalArgumentException(
        s"schema registry $what failed: HTTP ${resp.statusCode()} " +
          s"${resp.body()}")
    resp.body()
  }

  override def fetchById(id: Int): String = {
    val body = send(finish(HttpRequest.newBuilder(
      URI.create(s"$base/schemas/ids/$id")).GET()), s"fetch id=$id")
    val node = mapper.readTree(body)
    require(node.hasNonNull("schema"),
      s"registry response for id=$id has no schema field: $body")
    node.get("schema").asText()
  }

  override def register(subject: String, schemaJson: String): Int = {
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    // URLEncoder is form-encoding: its '+' means space only in query
    // strings, not in a PATH segment — percent-encode the space
    val enc = java.net.URLEncoder.encode(subject, "UTF-8")
      .replace("+", "%20")
    val body = send(finish(HttpRequest.newBuilder(
        URI.create(s"$base/subjects/$enc/versions"))
      .header("Content-Type", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(payload), StandardCharsets.UTF_8))),
      s"register subject=$subject")
    val node = mapper.readTree(body)
    require(node.hasNonNull("id"),
      s"registry register response has no id field: $body")
    node.get("id").asInt()
  }
}
