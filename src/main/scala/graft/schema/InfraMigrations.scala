package graft.schema

import graft.operators.JdbcMerger
import graft.operators.JdbcMerger.{Ansi, Dialect, MySql, Postgres, Sqlite}

/** Infrastructure DDL for the engine's database-backed features — the
  * analog of the reference's provisioning generators, which a user
  * runs once per app to create the framework's own tables:
  *
  *  - outbox staging + topic-lease tables
  *    (`lib/generators/deimos/outbox_backend/templates/migration`:
  *    `kafka_messages` with (topic, id) index, `kafka_topic_info` with
  *    unique topic / (locked_by, error) / locked_at indexes);
  *  - poller cursor table
  *    (`lib/generators/deimos/db_poller/templates/migration`:
  *    `deimos_poll_info` indexed by producer);
  *  - bulk-import surrogate column
  *    (`lib/generators/deimos/bulk_import_id_generator.rb`: add an
  *    indexed `bulk_import_id` column to a consumer target table).
  *
  * Statements are plain strings per [[JdbcMerger.Dialect]] (the same
  * four-dialect matrix the merge SQL ships), each list executable in
  * order; [[writeAll]] emits them as `V###__*.sql` files next to
  * [[SchemaClassGen.writeMigration]]'s schema-driven ones. The Ansi
  * variant is live-executed against embedded Derby in
  * `InfraMigrationsSpec` — including the unique-lease index the
  * reference's drain serialization depends on.
  *
  * Note the ENGINE does not need the lease table for ordering — the
  * drain's repartition-by-topic makes the job the single writer per
  * topic by construction (`operators/Outbox.scala`). It exists for
  * deployments that share the staging database with a reference app
  * mid-migration, where the lease row is the interop contract.
  */
object InfraMigrations {

  private def qq(ident: String, d: Dialect): String = JdbcMerger.q(ident, d)

  /** Auto-increment BIGINT primary-key column clause. */
  private def idPk(d: Dialect): String = d match {
    case MySql => "BIGINT NOT NULL AUTO_INCREMENT PRIMARY KEY"
    case Postgres => "BIGSERIAL PRIMARY KEY"
    // SQLite autoincrement requires the INTEGER alias for the rowid
    case Sqlite => "INTEGER PRIMARY KEY AUTOINCREMENT"
    case Ansi => "BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY"
  }

  /** Payload type sized for the reference's 10 MB message cap
    * (`templates/migration`: `t.binary :message, limit: 10.megabytes`).
    */
  private def blob(d: Dialect): String = d match {
    case MySql => "MEDIUMBLOB"
    case Postgres => "BYTEA"
    case Sqlite => "BLOB"
    case Ansi => "BLOB(10M)"
  }

  private def boolDefaultFalse(d: Dialect): String = d match {
    case Sqlite => "BOOLEAN NOT NULL DEFAULT 0"
    case _ => "BOOLEAN NOT NULL DEFAULT FALSE"
  }

  /** Outbox staging table (`kafka_messages`): one row per staged
    * message, drained in (topic, id) order — hence the composite
    * index the drain's ORDER BY walks. */
  def outboxTableSql(d: Dialect,
      table: String = "kafka_messages"): Seq[String] = {
    val t = qq(table, d)
    Seq(
      s"""CREATE TABLE $t (
         |  ${qq("id", d)} ${idPk(d)},
         |  ${qq("topic", d)} VARCHAR(255) NOT NULL,
         |  ${qq("message", d)} ${blob(d)},
         |  ${qq("key", d)} ${blob(d)},
         |  ${qq("partition_key", d)} VARCHAR(255),
         |  ${qq("created_at", d)} TIMESTAMP NOT NULL,
         |  ${qq("updated_at", d)} TIMESTAMP NOT NULL
         |)""".stripMargin,
      s"CREATE INDEX ${qq("index_" + table + "_on_topic_id", d)} " +
        s"ON $t (${qq("topic", d)}, ${qq("id", d)})")
  }

  /** Topic-lease table (`kafka_topic_info`): the reference's drain
    * serialization lock — unique per topic, with the recovery indexes
    * its sweeper queries ((locked_by, error) for orphan takeover,
    * locked_at for expiry). */
  def topicInfoTableSql(d: Dialect,
      table: String = "kafka_topic_info"): Seq[String] = {
    val t = qq(table, d)
    Seq(
      s"""CREATE TABLE $t (
         |  ${qq("id", d)} ${idPk(d)},
         |  ${qq("topic", d)} VARCHAR(255) NOT NULL,
         |  ${qq("locked_by", d)} VARCHAR(255),
         |  ${qq("locked_at", d)} TIMESTAMP,
         |  ${qq("error", d)} ${boolDefaultFalse(d)},
         |  ${qq("retries", d)} INTEGER NOT NULL DEFAULT 0,
         |  ${qq("last_processed_at", d)} TIMESTAMP
         |)""".stripMargin,
      s"CREATE UNIQUE INDEX ${qq("index_" + table + "_on_topic", d)} " +
        s"ON $t (${qq("topic", d)})",
      s"CREATE INDEX ${qq("index_" + table + "_on_locked_by_error", d)} " +
        s"ON $t (${qq("locked_by", d)}, ${qq("error", d)})",
      s"CREATE INDEX ${qq("index_" + table + "_on_locked_at", d)} " +
        s"ON $t (${qq("locked_at", d)})")
  }

  /** Poller cursor table (`deimos_poll_info`): (last_sent,
    * last_sent_id) per producer — the row `PollerRunner` persists its
    * time/id cursor into. */
  def pollInfoTableSql(d: Dialect,
      table: String = "deimos_poll_info"): Seq[String] = {
    val t = qq(table, d)
    Seq(
      s"""CREATE TABLE $t (
         |  ${qq("id", d)} ${idPk(d)},
         |  ${qq("producer", d)} VARCHAR(255) NOT NULL,
         |  ${qq("last_sent", d)} TIMESTAMP,
         |  ${qq("last_sent_id", d)} BIGINT
         |)""".stripMargin,
      s"CREATE INDEX ${qq("index_" + table + "_on_producer", d)} " +
        s"ON $t (${qq("producer", d)})")
  }

  /** Apply ledger for exactly-once additive accumulation
    * (`JdbcMerger.accumulateBatchIntoJdbc`): one row per applied
    * (job, batch, partition) — the PRIMARY KEY is the idempotence
    * guard, claimed in the same transaction as the merge. */
  def ledgerTableSql(d: Dialect,
      table: String = "graft_apply_ledger"): Seq[String] = {
    val t = qq(table, d)
    Seq(
      s"""CREATE TABLE $t (
         |  ${qq("job", d)} VARCHAR(255) NOT NULL,
         |  ${qq("batch_id", d)} BIGINT NOT NULL,
         |  ${qq("partition_id", d)} INTEGER NOT NULL,
         |  PRIMARY KEY (${qq("job", d)}, ${qq("batch_id", d)},
         |    ${qq("partition_id", d)})
         |)""".stripMargin)
  }

  /** Bulk-import surrogate column on a consumer target table
    * (`Materialize.assignSurrogate`'s join key): add + index. */
  def bulkImportIdSql(table: String, d: Dialect,
      column: String = "bulk_import_id"): Seq[String] = Seq(
    s"ALTER TABLE ${qq(table, d)} ADD COLUMN ${qq(column, d)} VARCHAR(255)",
    s"CREATE INDEX ${qq("index_" + table + "_on_" + column, d)} " +
      s"ON ${qq(table, d)} (${qq(column, d)})")

  /** Emit the infra DDL as ordered `V###__*.sql` files (outbox, topic
    * info, poll info), numbered after `startVersion` — composes with
    * [[SchemaClassGen.writeMigration]]'s per-schema files. */
  def writeAll(dir: java.nio.file.Path, d: Dialect,
      startVersion: Int = 1): Seq[java.nio.file.Path] = {
    java.nio.file.Files.createDirectories(dir)
    val parts = Seq(
      "create_kafka_messages" -> outboxTableSql(d),
      "create_kafka_topic_info" -> topicInfoTableSql(d),
      "create_deimos_poll_info" -> pollInfoTableSql(d),
      "create_graft_apply_ledger" -> ledgerTableSql(d))
    parts.zipWithIndex.map { case ((name, stmts), i) =>
      java.nio.file.Files.write(
        dir.resolve(f"V${startVersion + i}%03d__$name.sql"),
        stmts.mkString("", ";\n", ";\n").getBytes("UTF-8"))
    }
  }
}
