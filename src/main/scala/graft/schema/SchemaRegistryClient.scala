package graft.schema

import scala.collection.concurrent.TrieMap

/** Transport for a Confluent-style schema registry — the two wire
  * operations the reference's client performs against the public REST
  * API (`lib/deimos/schema_backends/avro_schema_registry.rb:10-19`
  * via its `SchemaRegistry::Client`): resolve a schema by its global
  * id (`GET /schemas/ids/{id}`) and register a schema under a subject
  * (`POST /subjects/{subject}/versions`). Implementations supply the
  * actual transport (HTTP in production); the engine ships
  * [[InMemoryRegistryTransport]] so every client behavior — caching,
  * id dispatch, unknown-id failure — is testable without a network.
  */
/** Transport-level registry failure: the registry was UNAVAILABLE
  * (5xx, connection refused, timeout), as opposed to WRONG input (4xx
  * — unknown id, malformed schema — which stays
  * `IllegalArgumentException`). An `IOException` subtype so callers'
  * standard transient-fault handling applies; [[HttpRegistryTransport]]
  * retries these internally with bounded jittered backoff before
  * throwing. */
class RegistryUnavailableException(msg: String, cause: Throwable = null)
  extends java.io.IOException(msg, cause)

/** Typed 4xx registry error (round-16): the HTTP status and the
  * registry's own `error_code` from the response body, so callers can
  * branch on WHAT was wrong — unknown subject (404/40401), unknown
  * version (404/40402), unknown schema id (404/40403), incompatible
  * schema (409), invalid schema (422/42201) — instead of parsing a
  * message string. Subtype of `IllegalArgumentException`, so every
  * existing caller-error handler still applies; `errorCode` is 0 when
  * the body carried none. */
class RegistryErrorException(msg: String, val httpStatus: Int,
    val errorCode: Int) extends IllegalArgumentException(msg) {
  def isSubjectNotFound: Boolean = errorCode == 40401
  def isVersionNotFound: Boolean = errorCode == 40402
  def isSchemaNotFound: Boolean = errorCode == 40403
  def isIncompatible: Boolean = httpStatus == 409
  def isInvalidSchema: Boolean = httpStatus == 422
}

/** A subject's latest registered schema version — what
  * `GET /subjects/{subject}/versions/latest` returns. */
final case class RegisteredSchema(id: Int, version: Int, schemaJson: String)

trait RegistryTransport {
  /** Schema json for a global id. Unknown ids must FAIL (the registry
    * 40403 case) — never return a guess; raw Avro binary mis-decodes
    * silently under the wrong writer schema. */
  def fetchById(id: Int): String

  /** Register (or look up) `schemaJson` under `subject`, returning the
    * schema's global id. Idempotent per the registry contract: the
    * same schema re-posted returns the same id. */
  def register(subject: String, schemaJson: String): Int

  /** The subject's latest registered version
    * (`GET /subjects/{subject}/versions/latest`) — what lets a pure
    * consumer plan WITHOUT pre-known writer ids (the reference
    * consumer's effective entry point: `avro_schema_registry.rb:10-19`
    * resolves whatever arrives, seeded by the subject's registered
    * schema). Unknown subjects must FAIL (registry 40401). */
  def latestVersion(subject: String): RegisteredSchema

  /** Whether `schemaJson` is compatible with the subject's LATEST
    * registered version under the subject's compatibility mode
    * (`POST /compatibility/subjects/{subject}/versions/latest` →
    * `{"is_compatible": bool}`) — the pre-register gate a real
    * pipeline runs before publishing a schema change (the reference
    * delegates it to its Ruby registry client,
    * `avro_schema_registry.rb:10-19`). Unknown subjects FAIL with
    * 40401 — first-version registration is the CALLER's decision
    * ([[SchemaRegistryClient.registerChecked]] makes it explicitly),
    * not something the transport should guess. */
  def checkCompatibility(subject: String, schemaJson: String): Boolean
}

/** In-memory registry transport with the public registry's observable
  * semantics: global ids are allocated per distinct schema text
  * (re-registering an identical schema — under the same or another
  * subject — returns the existing id), and fetching an unregistered id
  * fails loudly. `fetchCount`/`registerCount` expose transport traffic
  * so specs can prove the client's cache absorbs repeat calls. */
class InMemoryRegistryTransport extends RegistryTransport {
  private val byId = TrieMap.empty[Int, String]
  private val idBySchema = TrieMap.empty[String, Int]
  // per-subject version history: ids in registration order (the
  // registry's version numbers are 1-based positions in this list)
  private val bySubject = TrieMap.empty[String, Vector[Int]]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
  // AtomicInteger, not volatile var += (non-atomic read-modify-write
  // would undercount under concurrent planning threads)
  private val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
  private val registers = new java.util.concurrent.atomic.AtomicInteger(0)
  def fetchCount: Int = fetches.get()
  def registerCount: Int = registers.get()

  override def fetchById(id: Int): String = {
    fetches.incrementAndGet()
    byId.getOrElse(id, throw new IllegalArgumentException(
      s"schema id $id not found in registry (known: " +
        s"${byId.keys.toSeq.sorted.mkString(",")})"))
  }

  override def register(subject: String, schemaJson: String): Int = {
    registers.incrementAndGet()
    val id = idBySchema.getOrElseUpdate(schemaJson, {
      val id = nextId.incrementAndGet()
      byId.put(id, schemaJson)
      id
    })
    // subject version list gains the id once (re-registering the same
    // schema under the same subject does not create a new version —
    // the registry's idempotence contract)
    bySubject.updateWith(subject) {
      case Some(ids) if ids.contains(id) => Some(ids)
      case Some(ids) => Some(ids :+ id)
      case None => Some(Vector(id))
    }
    id
  }

  override def latestVersion(subject: String): RegisteredSchema = {
    val ids = bySubject.getOrElse(subject,
      throw new RegistryErrorException(
        s"subject $subject not found in registry (known: " +
          s"${bySubject.keys.toSeq.sorted.mkString(",")})", 404, 40401))
    RegisteredSchema(ids.last, ids.size, byId(ids.last))
  }

  /** Real BACKWARD-mode compatibility (the registry default): the NEW
    * schema as reader must read data written with the subject's
    * latest schema — evaluated with Avro's own public
    * `SchemaCompatibility`, so the in-memory double reproduces the
    * registry's actual verdicts, not a stub's. Unknown subject →
    * 404/40401 typed error; unparseable schema → 422/42201. */
  override def checkCompatibility(subject: String,
      schemaJson: String): Boolean = {
    val latest = latestVersion(subject)
    val reader =
      // bounded parse: a recursive/over-deep candidate is as invalid
      // as an unparseable one — same typed 422/42201
      try graft.schema.AvroConverters.parseSchema(schemaJson)
      catch { case e: Exception => throw new RegistryErrorException(
        s"invalid schema for compatibility check: ${e.getMessage}",
        422, 42201) }
    val writer = graft.schema.AvroConverters.parseSchema(latest.schemaJson)
    org.apache.avro.SchemaCompatibility
      .checkReaderWriterCompatibility(reader, writer)
      .getType == org.apache.avro.SchemaCompatibility
      .SchemaCompatibilityType.COMPATIBLE
  }
}

/** Caching schema-registry client — the engine analog of the client
  * the reference memoizes per backend
  * (`avro_schema_registry.rb:22-30`): every id is fetched from the
  * transport at most once and every (subject, schema) registered at
  * most once; afterwards encode/decode planning is cache-hits only.
  *
  * Scale contract: this is a DRIVER-side planning object. Schemas it
  * resolves are baked as string literals into the codegen'd
  * encode/decode expressions ([[RegistryFramedBackend]]), so executors
  * never talk to the registry — zero per-row (or even per-partition)
  * registry calls at any corpus size.
  */
class SchemaRegistryClient(transport: RegistryTransport,
    /** When true every [[register]] routes through
      * [[registerChecked]]'s compatibility gate — wire it from
      * `schema.registry_check_compatibility`
      * ([[graft.model.SchemaSettings.registryCheckCompatibility]]). */
    checkCompatibilityOnRegister: Boolean = false) {
  private val idCache = TrieMap.empty[Int, String]
  private val registerCache = TrieMap.empty[(String, String), Int]

  /** Schema json for a global id, cached for the client's lifetime
    * (registry schemas are immutable per id). Unknown ids propagate
    * the transport's failure. */
  def fetchById(id: Int): String =
    idCache.getOrElseUpdate(id, transport.fetchById(id))

  /** Register `schemaJson` under `subject`, cached: the id also
    * primes the id→schema cache so a subsequent decode of our own
    * frames needs no fetch. Routes through the compatibility gate
    * when the client was built with `checkCompatibilityOnRegister`. */
  def register(subject: String, schemaJson: String): Int =
    if (checkCompatibilityOnRegister) registerChecked(subject, schemaJson)
    else registerCache.getOrElseUpdate((subject, schemaJson), {
      val id = transport.register(subject, schemaJson)
      idCache.putIfAbsent(id, schemaJson)
      id
    })

  /** [[register]] gated by a compatibility pre-check (round-16): the
    * publish-side discipline for schema CHANGES — check the new
    * schema against the subject's latest version first and fail with
    * the typed 409 BEFORE the registry rejects (or worse, a laxly
    * configured registry accepts) a breaking change. A subject with
    * no versions yet (40401) registers directly: the first version
    * is compatible by definition. Cached like [[register]] — the
    * check runs at most once per (subject, schema). */
  def registerChecked(subject: String, schemaJson: String): Int =
    registerCache.getOrElseUpdate((subject, schemaJson), {
      val compatible =
        try transport.checkCompatibility(subject, schemaJson)
        catch {
          case e: RegistryErrorException if e.isSubjectNotFound => true
        }
      if (!compatible) throw new RegistryErrorException(
        s"schema is incompatible with the latest version of subject " +
          s"$subject — refusing to register a breaking change", 409, 409)
      val id = transport.register(subject, schemaJson)
      idCache.putIfAbsent(id, schemaJson)
      id
    })

  /** Decode-side writer map for the ids observed on a topic — the
    * registry semantics of `avro_schema_registry.rb:10-12` (resolve
    * the writer by the frame's embedded id) as one cached bulk
    * resolution. */
  def writerSchemas(ids: Seq[Int]): Map[Int, String] =
    ids.distinct.map(id => id -> fetchById(id)).toMap

  /** Build the registry-framed backend for a topic: registers the
    * reader/value schema under `subject` (subject naming per the
    * public TopicNameStrategy: callers pass e.g. `"<topic>-value"`),
    * and arms decode-side dispatch for `writerIds` — every id the
    * topic's history carries. With no writer ids the backend decodes
    * strict (its own id only). */
  def framedBackend(subject: String, schemaJson: String,
      writerIds: Seq[Int] = Nil): RegistryFramedBackend = {
    val id = register(subject, schemaJson)
    new RegistryFramedBackend(schemaJson, id,
      if (writerIds.isEmpty) Map.empty else writerSchemas(writerIds))
  }

  /** The subject's latest registered version. NOT cached — "latest" is
    * the one mutable query in the registry protocol (a producer may
    * register a new version between calls); the returned id→schema
    * binding IS immutable and primes the id cache. */
  def latest(subject: String): RegisteredSchema = {
    val l = transport.latestVersion(subject)
    idCache.putIfAbsent(l.id, l.schemaJson)
    l
  }

  /** Decode-only reader planned from the subject's LATEST registered
    * version — the consumer entry point when writer ids are NOT known
    * up front (round-9's [[readerBackend]] required them): the latest
    * schema becomes the reader, its id is armed for decode, plus any
    * `extraWriterIds` observed later. Frames carrying an id outside
    * that set still fail loudly (never guess); encode stays refused
    * like every decode-only reader. */
  def readerBackendLatest(subject: String,
      extraWriterIds: Seq[Int] = Nil): RegistryFramedBackend = {
    val l = latest(subject)
    readerBackend(l.schemaJson, l.id +: extraWriterIds.filterNot(_ == l.id))
  }

  /** Decode-only reader: resolves the observed writer ids and builds
    * the dispatching backend WITHOUT registering anything — the pure
    * consumer path (`avro_schema_registry.rb:10-12` only ever fetches
    * by id), so a principal with read-only registry ACLs can plan.
    * The reader schema needs no registry id of its own to decode (the
    * backend's nominal frame id is the first writer id, which decode
    * resolves to that writer's true schema). Encoding through this
    * backend FAILS at plan time: it would frame reader-schema bytes
    * under a writer's id — the silent cross-schema mis-decode the
    * registry wire format exists to prevent. Producers register via
    * [[framedBackend]]. */
  def readerBackend(readerSchemaJson: String,
      writerIds: Seq[Int]): RegistryFramedBackend = {
    require(writerIds.nonEmpty,
      "readerBackend needs the writer ids observed on the topic")
    new RegistryFramedBackend(readerSchemaJson, writerIds.head,
      writerSchemas(writerIds)) {
      override def encodeExpr(payload: org.apache.spark.sql.Column)
          : org.apache.spark.sql.Column =
        throw new UnsupportedOperationException(
          "decode-only reader backend: encoding here would frame " +
            "reader-schema bytes under writer id " + writerIds.head +
            " and every consumer would mis-decode them silently — " +
            "producers must register their schema via framedBackend")
    }
  }
}
