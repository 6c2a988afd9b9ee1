package graft.schema

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** HTTP [[RegistryTransport]] speaking the public Confluent schema
  * registry REST protocol — the three endpoints the reference's
  * backend reaches through its registry client
  * (`avro_schema_registry.rb:10-19`):
  *
  *   - `GET {base}/schemas/ids/{id}` → `{"schema": "<json>"}`
  *     (404 body carries `error_code` 40403 for unknown ids)
  *   - `POST {base}/subjects/{subject}/versions` with
  *     `{"schema": "<json>"}` → `{"id": N}` (idempotent: re-posting a
  *     registered schema returns its existing global id)
  *   - `GET {base}/subjects/{subject}/versions/latest` →
  *     `{"subject":…,"version":N,"id":N,"schema":"<json>"}`
  *     (the consumer plan-time entry point when writer ids are
  *     unknown; 404 carries 40401 for unknown subjects)
  *
  * Built on the JDK's `java.net.http.HttpClient` — no extra
  * dependency — with optional HTTP Basic auth (the registry's
  * standard auth mode) or a static bearer token
  * (`Authorization: Bearer <token>` — the registry's other public
  * auth surface, e.g. Confluent Cloud's OAuth/STS-issued tokens;
  * token refresh is the caller's concern: pass a fresh transport or
  * front it with a proxy if tokens expire mid-lifetime). The two
  * modes are mutually exclusive — both set would silently shadow one
  * Authorization header with the other, so that's rejected at
  * construction.
  *
  * Failure taxonomy (round-10): a 4xx is a CALLER error (unknown id —
  * the 40403 case — bad schema, missing subject) and fails immediately
  * as `IllegalArgumentException`: retrying it would retry into a
  * guess. A 5xx or transport-level `IOException` is the REGISTRY
  * failing; both endpoints here are idempotent (GET by id / by
  * subject; POST of a schema returns the same id on re-post), so these
  * are retried up to `maxRetries` times with exponential backoff and
  * full jitter, then thrown as [[RegistryUnavailableException]] — an
  * `IOException`, so a briefly-down registry no longer surfaces as a
  * caller bug.
  *
  * Scale contract: like every transport, this is DRIVER-side planning
  * only — [[SchemaRegistryClient]] caches each id/registration for
  * its lifetime and bakes resolved schemas into the codegen'd
  * expressions, so executors never hold a connection to the registry.
  *
  * @param maxRetries   extra attempts after the first, for 5xx/IO only
  * @param retryBaseMs  backoff base: attempt k sleeps uniform(0,
  *                     retryBaseMs·2^k) ms ("full jitter" — decorrelates
  *                     a fleet of planners hammering a recovering
  *                     registry)
  * @param sleeper      injectable for tests (default `Thread.sleep`)
  */
class HttpRegistryTransport(baseUrl: String,
    basicAuth: Option[(String, String)] = None,
    timeoutMs: Long = 10000L,
    maxRetries: Int = 3,
    retryBaseMs: Long = 200L,
    sleeper: Long => Unit = Thread.sleep,
    bearerToken: Option[String] = None) extends RegistryTransport {

  require(basicAuth.isEmpty || bearerToken.isEmpty,
    "HttpRegistryTransport: basicAuth and bearerToken are mutually " +
      "exclusive — both would fight over the Authorization header")

  private val mapper = new ObjectMapper
  private val base = baseUrl.stripSuffix("/")
  // NORMAL redirect policy: a registry fronted by an http→https (or
  // load-balancer) redirect just works FOR THE IDEMPOTENT GETs
  // (fetchById / latestVersion) instead of burning the retry budget
  // on 301s — the JDK default is Redirect.NEVER. POST is NOT covered:
  // the JDK client rewrites POST to GET on 301/302/303 (307/308 are
  // the only POST-safe redirects), which register() detects and
  // reports specifically. Any 3xx that still reaches send() (redirect
  // loop, https→http downgrade the policy refuses) is a permanent
  // misconfiguration, failed fast below.
  private val http = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  private val ContentType = "application/vnd.schemaregistry.v1+json"

  private def finish(b: HttpRequest.Builder): HttpRequest = {
    val withBasic = basicAuth.fold(b) { case (user, pass) =>
      val tok = java.util.Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(StandardCharsets.UTF_8))
      b.header("Authorization", s"Basic $tok")
    }
    val withAuth = bearerToken.fold(withBasic)(t =>
      withBasic.header("Authorization", s"Bearer $t"))
    withAuth.timeout(Duration.ofMillis(timeoutMs))
      .header("Accept", ContentType).build()
  }

  private def send(req: HttpRequest, what: String): HttpResponse[String] = {
    var attempt = 0
    while (true) {
      val err: Throwable =
        try {
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          val code = resp.statusCode()
          if (code / 100 == 2) return resp
          if (code / 100 == 4) {
            // caller error (40403 unknown id, 40401 unknown subject,
            // 409 incompatible, 422 bad schema): NEVER retried — a
            // retry can't make a wrong question right. Typed (round-16)
            // with the body's registry error_code so callers branch on
            // WHAT was wrong instead of parsing the message.
            val errCode =
              try {
                val n = mapper.readTree(resp.body())
                if (n != null && n.hasNonNull("error_code"))
                  n.get("error_code").asInt() else 0
              } catch { case _: Exception => 0 }
            throw new RegistryErrorException(
              s"schema registry $what failed: HTTP $code ${resp.body()}",
              code, errCode)
          }
          if (code / 100 != 5)
            // 1xx/3xx after the NORMAL redirect policy already ran:
            // a redirect loop or an https→http downgrade — permanent
            // misconfiguration, not an outage; retrying would burn
            // the backoff budget and then misreport it as transient
            throw new IllegalArgumentException(
              s"schema registry $what misconfigured: unexpected HTTP " +
                s"$code (redirect loop or protocol downgrade?) " +
                resp.body())
          new RegistryUnavailableException(
            s"schema registry $what failed: HTTP $code ${resp.body()}")
        } catch {
          case e: java.io.IOException => e // connect/timeout/reset
        }
      if (attempt >= maxRetries) err match {
        case r: RegistryUnavailableException => throw r
        case e => throw new RegistryUnavailableException(
          s"schema registry $what failed after ${attempt + 1} attempts: " +
            s"${e.getMessage}", e)
      }
      // full jitter: uniform(0, base·2^attempt) — decorrelates
      // concurrent planners retrying against a recovering registry.
      // Shift clamped (a caller-set maxRetries ≥ ~55 would overflow
      // the Long shift to a negative bound and crash nextLong) and
      // the sleep bounded at 60 s — past that, longer waits add
      // nothing but planner stall.
      val cap = math.min(retryBaseMs << math.min(attempt, 20), 60000L)
      attempt += 1
      sleeper(java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(cap + 1))
    }
    throw new IllegalStateException("unreachable")
  }

  override def fetchById(id: Int): String = {
    val body = send(finish(HttpRequest.newBuilder(
      URI.create(s"$base/schemas/ids/$id")).GET()), s"fetch id=$id").body()
    val node = mapper.readTree(body)
    require(node.hasNonNull("schema"),
      s"registry response for id=$id has no schema field: $body")
    node.get("schema").asText()
  }

  // URLEncoder is form-encoding: its '+' means space only in query
  // strings, not in a PATH segment — percent-encode the space
  private def encSubject(subject: String): String =
    java.net.URLEncoder.encode(subject, "UTF-8").replace("+", "%20")

  /** `GET /subjects/{subject}/versions/latest` →
    * `{"subject":…,"version":N,"id":N,"schema":"<json>"}` — the
    * consumer plan-time entry point when writer ids are unknown. */
  override def latestVersion(subject: String): RegisteredSchema = {
    val body = send(finish(HttpRequest.newBuilder(URI.create(
      s"$base/subjects/${encSubject(subject)}/versions/latest")).GET()),
      s"latest subject=$subject").body()
    val node = mapper.readTree(body)
    require(node.hasNonNull("id") && node.hasNonNull("version") &&
      node.hasNonNull("schema"),
      s"registry latest-version response for subject=$subject is " +
        s"missing id/version/schema: $body")
    RegisteredSchema(node.get("id").asInt(), node.get("version").asInt(),
      node.get("schema").asText())
  }

  /** `POST /compatibility/subjects/{subject}/versions/latest` →
    * `{"is_compatible": bool}` — the pre-register gate. 404/40401
    * (unknown subject) and 422/42201 (unparseable schema) surface as
    * [[RegistryErrorException]]s via [[send]]'s typed 4xx path. */
  override def checkCompatibility(subject: String,
      schemaJson: String): Boolean = {
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    val body = send(finish(HttpRequest.newBuilder(URI.create(
        s"$base/compatibility/subjects/${encSubject(subject)}" +
          "/versions/latest"))
      .header("Content-Type", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(payload), StandardCharsets.UTF_8))),
      s"compatibility subject=$subject").body()
    val node = mapper.readTree(body)
    require(node.hasNonNull("is_compatible"),
      s"registry compatibility response for subject=$subject has no " +
        s"is_compatible field: $body")
    node.get("is_compatible").asBoolean()
  }

  override def register(subject: String, schemaJson: String): Int = {
    val payload = mapper.createObjectNode()
    payload.put("schema", schemaJson)
    val resp = send(finish(HttpRequest.newBuilder(
        URI.create(s"$base/subjects/${encSubject(subject)}/versions"))
      .header("Content-Type", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(payload), StandardCharsets.UTF_8))),
      s"register subject=$subject")
    val body = resp.body()
    val node = mapper.readTree(body)
    if (!node.hasNonNull("id")) {
      // The JDK client rewrites POST to GET on 301/302/303 (only
      // 307/308 are POST-safe), so a redirect-fronted registry makes
      // this call silently GET the subject's VERSION LIST — surface
      // the redirect instead of a misleading "no id field"
      val rewritten = resp.request().method() != "POST"
      require(!rewritten,
        s"registry register for subject=$subject was redirected and the " +
          s"redirect rewrote POST to ${resp.request().method()} " +
          s"(final URI ${resp.uri()}): the JDK client downgrades POST on " +
          "301/302/303 — front the registry with 307/308 or point " +
          s"baseUrl at the final scheme/host. Response: $body")
      throw new IllegalArgumentException(
        s"registry register response has no id field: $body")
    }
    node.get("id").asInt()
  }
}
