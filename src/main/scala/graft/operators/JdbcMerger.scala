package graft.operators

import org.apache.spark.sql.{DataFrame, Row}

/** Dialect-aware bulk upsert/delete SQL generation — the engine's version
  * of the reference's MassUpdater (`lib/deimos/active_record_consume/
  * mass_updater.rb:49-70`: MySQL `ON DUPLICATE KEY UPDATE`, Postgres
  * `ON CONFLICT DO UPDATE`, plain INSERT when keyless) and bulk delete
  * (`batch_consumption.rb:92-98,241-247`).
  *
  * In Spark this runs inside `foreachBatch`: each executor-side partition
  * opens one connection and issues batched statements, so merge
  * throughput scales with partitions rather than a single writer. The SQL
  * builders are pure functions (unit-testable without a database).
  */
object JdbcMerger {

  sealed trait Dialect
  case object MySql extends Dialect
  case object Postgres extends Dialect
  /** SQLite (3.24+): `ON CONFLICT … DO UPDATE` like Postgres, with the
    * version guard referencing the bare table name. Completes the
    * reference's 3-database test matrix (`spec/spec_helper.rb:102-142`
    * runs SQLite + Postgres + MySQL). */
  case object Sqlite extends Dialect
  /** ANSI/DB2-family engines (Derby, DB2): upsert is the SQL-standard
    * single-row `MERGE INTO … USING SYSIBM.SYSDUMMY1` (no multi-row
    * VALUES source, no `INSERT … ON CONFLICT`), and compound-key
    * delete is OR-of-ANDs (no row-constructor IN). This is the one
    * dialect the sandbox can execute against a REAL database — the
    * embedded Derby on Spark's own classpath — so it live-validates
    * the shared merge machinery (`JdbcMergerDerbySpec`) that the
    * MySQL/Postgres/SQLite strings share. */
  case object Ansi extends Dialect

  private[graft] def q(ident: String, d: Dialect): String = d match {
    case MySql => s"`$ident`"
    case Postgres | Sqlite | Ansi => "\"" + ident + "\""
  }

  /** Upsert statement for one batch of `rows` width-`cols`. Keyless →
    * plain INSERT (can duplicate on retry — same caveat as the
    * reference's plain-insert path, `mass_updater.rb:54-55`).
    *
    * @param versionCol when set, the upsert is version-guarded: an
    *   existing row is overwritten only by a strictly newer version.
    *   The reference never needs this (single-threaded in-order apply);
    *   a parallel engine does, whenever micro-batches can interleave
    *   (source rebalance, retried batch, backfill).
    */
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String],
      nRows: Int, dialect: Dialect,
      versionCol: Option[String] = None): String = {
    val colList = cols.map(q(_, dialect)).mkString(", ")
    val rowPh = cols.map(_ => "?").mkString("(", ", ", ")")
    val values = Seq.fill(nRows)(rowPh).mkString(", ")
    val base = s"INSERT INTO ${q(table, dialect)} ($colList) VALUES $values"
    if (keyCols.isEmpty) base
    else {
      val updatable = cols.filterNot(keyCols.contains)
      dialect match {
        case Ansi =>
          // Derby/DB2 have no upsert clause on INSERT and reject a
          // VALUES-derived MERGE source — the upsert is the standard
          // single-row MERGE against the one-row dummy table, version
          // guard as WHEN MATCHED AND. Parameter layout follows
          // [[upsertParamOrder]], not the per-row cols order.
          require(nRows == 1,
            "Ansi dialect merges row-at-a-time (no multi-row MERGE source)")
          val t = q(table, dialect)
          val on = keyCols.map(k => s"$t.${q(k, dialect)} = ?")
            .mkString(" AND ")
          val guard = versionCol
            .map(v => s" AND ? > $t.${q(v, dialect)}").getOrElse("")
          val set = updatable
            .map(c => s"${q(c, dialect)} = ?").mkString(", ")
          val matched =
            if (updatable.isEmpty) "" // keys-only table: insert-if-absent
            else s" WHEN MATCHED$guard THEN UPDATE SET $set"
          val insPh = cols.map(_ => "?").mkString(", ")
          s"MERGE INTO $t USING SYSIBM.SYSDUMMY1 ON $on$matched" +
            s" WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($insPh)"
        case MySql if updatable.isEmpty =>
          // keys-only table: insert-if-absent via a no-op assignment
          // (an empty UPDATE list is a syntax error)
          val k = q(keyCols.head, dialect)
          s"$base ON DUPLICATE KEY UPDATE $k = $k"
        case MySql =>
          val upd = versionCol match {
            case Some(v) =>
              val qv = q(v, dialect)
              // MySQL applies assignments left-to-right: the version
              // column must come LAST so earlier IF()s compare against
              // the OLD stored version
              val guarded = (updatable.filterNot(_ == v) :+ v).map { c =>
                val qc = q(c, dialect)
                s"$qc = IF(VALUES($qv) > $qv, VALUES($qc), $qc)"
              }
              guarded.mkString(", ")
            case None => updatable
              .map(c => s"${q(c, dialect)} = VALUES(${q(c, dialect)})")
              .mkString(", ")
          }
          s"$base ON DUPLICATE KEY UPDATE $upd"
        case Postgres | Sqlite if updatable.isEmpty =>
          // keys-only table: insert-if-absent (an empty SET list is a
          // syntax error — only the Ansi branch handled this shape)
          val conflict = keyCols.map(q(_, dialect)).mkString(", ")
          s"$base ON CONFLICT ($conflict) DO NOTHING"
        case Postgres | Sqlite =>
          val conflict = keyCols.map(q(_, dialect)).mkString(", ")
          val upd = updatable
            .map(c => s"${q(c, dialect)} = EXCLUDED.${q(c, dialect)}")
            .mkString(", ")
          // both dialects allow qualifying the stored row by table
          // name in the guard; EXCLUDED carries the proposed row
          val guard = versionCol.map(v =>
            s" WHERE EXCLUDED.${q(v, dialect)} > ${q(table, dialect)}.${q(v, dialect)}")
            .getOrElse("")
          s"$base ON CONFLICT ($conflict) DO UPDATE SET $upd$guard"
      }
    }
  }

  /** The column-name sequence (with repeats) a prepared [[upsertSql]]
    * statement binds, in `?` position order, for ONE row. The VALUES
    * dialects bind each row's `cols` in order; the Ansi MERGE binds
    * ON keys, then the version guard, then the UPDATE SET columns,
    * then the full INSERT row. Binding through this sequence keeps
    * the executor-side appliers dialect-agnostic.
    */
  def upsertParamOrder(cols: Seq[String], keyCols: Seq[String],
      dialect: Dialect, versionCol: Option[String] = None): Seq[String] =
    dialect match {
      case Ansi if keyCols.nonEmpty =>
        val updatable = cols.filterNot(keyCols.contains)
        if (updatable.isEmpty) keyCols ++ cols
        else keyCols ++ versionCol.toSeq ++ updatable ++ cols
      case _ => cols
    }

  /** Bulk delete by (possibly compound) key — compound keys use a row
    * constructor IN list, as the reference builds `WHERE (k1,k2) IN …`
    * (`batch_consumption.rb:241-247`); the Ansi dialect (Derby rejects
    * row constructors in IN) uses the equivalent OR-of-ANDs with the
    * same parameter order. */
  /** @param versionCol when set, each delete is version-guarded like
    *   the upserts: a row is removed only when its stored version is
    *   STRICTLY OLDER than the tombstone's (`stored < ?`) — without
    *   this, a replayed/stale tombstone would delete a newer live row
    *   while the same replay's stale upserts were correctly rejected.
    *   Tie semantics are DELIBERATELY symmetric with the upsert guard
    *   (`? > stored` there, `stored < ?` here): a version EQUAL to the
    *   stored row's is a no-op on BOTH sides — that is the
    *   at-least-once replay contract (re-applying the already-applied
    *   version must change nothing), and it means a pipeline must
    *   assign every tombstone a version strictly newer than the row it
    *   removes (the engine's compaction/ordering layers do: orderCol is
    *   a log offset, unique per key). A tombstone that ties the live
    *   row is treated as the replay case and leaves it standing —
    *   pinned live in JdbcMergerDerbySpec. */
  def deleteSql(table: String, keyCols: Seq[String], nRows: Int,
      dialect: Dialect, versionCol: Option[String] = None): String = {
    require(keyCols.nonEmpty,
      "deleteSql needs at least one key column: a keyless merge " +
        "cannot address rows to delete")
    versionCol match {
      case Some(v) =>
        val one = (keyCols.map(k => s"${q(k, dialect)} = ?") :+
          s"${q(v, dialect)} < ?").mkString("(", " AND ", ")")
        val all = Seq.fill(nRows)(one).mkString(" OR ")
        return s"DELETE FROM ${q(table, dialect)} WHERE $all"
      case None => ()
    }
    if (keyCols.size > 1 && dialect == Ansi) {
      val one = keyCols.map(k => s"${q(k, dialect)} = ?")
        .mkString("(", " AND ", ")")
      val all = Seq.fill(nRows)(one).mkString(" OR ")
      return s"DELETE FROM ${q(table, dialect)} WHERE $all"
    }
    val keyTuple =
      if (keyCols.size == 1) q(keyCols.head, dialect)
      else keyCols.map(q(_, dialect)).mkString("(", ", ", ")")
    val ph =
      if (keyCols.size == 1) Seq.fill(nRows)("?").mkString(", ")
      else Seq.fill(nRows)(keyCols.map(_ => "?").mkString("(", ", ", ")"))
        .mkString(", ")
    s"DELETE FROM ${q(table, dialect)} WHERE $keyTuple IN ($ph)"
  }

  /** Deadlock retry policy (reference: `lib/deimos/utils/
    * deadlock_retry.rb:11-43` — ≤2 retries, jittered sleep). The sleep is
    * injectable for tests.
    */
  def withDeadlockRetry[T](maxRetries: Int = 2,
      sleepMs: Int => Long = attempt => 500L + attempt * 1000L,
      isDeadlock: Throwable => Boolean = defaultIsDeadlock,
      sleeper: Long => Unit = Thread.sleep)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: Throwable if isDeadlock(e) && attempt < maxRetries =>
          sleeper(sleepMs(attempt)); attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def defaultIsDeadlock(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("").toLowerCase
    m.contains("deadlock") || m.contains("lock wait timeout") ||
      // SQLite's contention signal — multiple writer partitions hit
      // SQLITE_BUSY, which is retryable exactly like a deadlock
      m.contains("database is locked") || m.contains("sqlite_busy")
  }

  /** M3 + T2 — per-row ordered apply for UNCOMPACTED hot-key topics:
    * the executor-side partner of `Streams.mergeSinkOrdered` /
    * `Compaction.orderedByKey`. The partition iterator arrives with
    * every key's versions consecutive and in order; each row becomes a
    * single-row upsert or delete (the reference's M3 single-record
    * path) applied sequentially on one connection, so the database
    * sees same-key versions in exactly the batch order — BatchSlicer
    * semantics without one Spark job per wave.
    *
    * Single-row statements are prepared once per partition and reused.
    */
  def applyOrderedRows(rows: Iterator[Row], url: String, table: String,
      cols: Seq[String], keyCols: Seq[String], isTombstone: Row => Boolean,
      dialect: Dialect, props: java.util.Properties,
      versionCol: Option[String] = None,
      retrySleeper: Long => Unit = Thread.sleep): Unit = {
    if (rows.isEmpty) return
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val upSt = conn.prepareStatement(
        upsertSql(table, cols, keyCols, 1, dialect, versionCol))
      val delSt = conn.prepareStatement(
        deleteSql(table, keyCols, 1, dialect, versionCol))
      val paramOrder = upsertParamOrder(cols, keyCols, dialect, versionCol)
      try rows.foreach { r =>
        withDeadlockRetry(sleeper = retrySleeper) {
          if (isTombstone(r)) {
            keyCols.zipWithIndex.foreach { case (k, i) =>
              delSt.setObject(i + 1, r.getAs[Any](k))
            }
            // version-guarded tombstone: same stale-replay protection
            // as the upsert guard
            versionCol.foreach(v =>
              delSt.setObject(keyCols.size + 1, r.getAs[Any](v)))
            delSt.executeUpdate()
          } else {
            paramOrder.zipWithIndex.foreach { case (c, i) =>
              upSt.setObject(i + 1, r.getAs[Any](c))
            }
            upSt.executeUpdate()
          }
        }
      } finally { upSt.close(); delSt.close() }
    } finally conn.close()
  }

  /** Execute a keyed merge of `batch` into a JDBC table inside
    * `foreachBatch`: tombstone split → per-partition batched upsert +
    * delete with deadlock retry. Sub-batches capped at `maxBatchSize`
    * rows per statement (reference `max_db_batch_size`,
    * `batch_consumption.rb:148-163`).
    *
    * PRECONDITION — at most one action per key per batch: compact
    * first ([[Compaction.lastWins]] — `Streams.mergeSink` does). With
    * duplicate keys in one statement the dialects diverge (Postgres
    * errors with "cannot affect row a second time", MySQL applies in
    * VALUES order), and because all upserts run before all deletes, a
    * delete-then-reinsert sequence for one key would end wrongly
    * deleted. Uncompacted hot-key topics belong on
    * [[applyOrderedRows]], which applies per row in order. */
  def mergeIntoJdbc(batch: DataFrame, url: String, table: String,
      keyCols: Seq[String], tombstone: org.apache.spark.sql.Column,
      dialect: Dialect, props: java.util.Properties,
      maxBatchSize: Int = 1000, versionCol: Option[String] = None,
      retrySleeper: Long => Unit = Thread.sleep): Unit = {
    val (upserts, deletes) = Materialize.splitTombstones(batch, tombstone)
    val cols = upserts.columns.toSeq
    // the Ansi MERGE has no multi-row source: one row per statement,
    // prepared once per partition and reused
    val effBatch =
      if (dialect == Ansi && keyCols.nonEmpty) 1 else maxBatchSize
    val paramOrder = upsertParamOrder(cols, keyCols, dialect, versionCol)
    val colIdx = cols.zipWithIndex.toMap
    val paramIdx = paramOrder.map(colIdx)
    upserts.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        if (effBatch == 1) {
          // row-at-a-time (Ansi MERGE): the statement text never
          // changes, so prepare ONCE per partition and reuse — a
          // per-row prepare would pay a statement-compile round trip
          // on the hot merge path
          val st = conn.prepareStatement(
            upsertSql(table, cols, keyCols, 1, dialect, versionCol))
          try rows.foreach { r =>
            withDeadlockRetry(sleeper = retrySleeper) {
              var i = 1
              paramIdx.foreach { c => st.setObject(i, r.get(c)); i += 1 }
              st.executeUpdate()
            }
          } finally st.close()
        } else rows.grouped(effBatch).foreach { group =>
          val sql = upsertSql(table, cols, keyCols, group.size, dialect,
            versionCol)
          withDeadlockRetry(sleeper = retrySleeper) {
            // close in finally: a deadlock retry or terminal failure
            // would otherwise leak a statement per attempt
            val st = conn.prepareStatement(sql)
            try {
              var i = 1
              group.foreach(r => paramIdx.foreach { c =>
                st.setObject(i, r.get(c)); i += 1
              })
              st.executeUpdate()
            } finally st.close()
          }
        }
      } finally conn.close()
      }
    }
    if (keyCols.isEmpty) {
      // a keyless merge has no way to ADDRESS rows to delete; a
      // tombstone reaching this path is a caller bug — fail loudly
      // instead of emitting malformed SQL
      require(deletes.isEmpty,
        "keyless merge cannot delete: tombstone rows present but no " +
          "key columns to address them")
      return
    }
    val delFields = keyCols ++ versionCol.toSeq
    val delKeys = deletes.select(
      delFields.map(org.apache.spark.sql.functions.col): _*)
    delKeys.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try rows.grouped(maxBatchSize).foreach { group =>
        val sql = deleteSql(table, keyCols, group.size, dialect, versionCol)
        withDeadlockRetry(sleeper = retrySleeper) {
          val st = conn.prepareStatement(sql)
          try {
            var i = 1
            group.foreach(r => delFields.indices.foreach { c =>
              st.setObject(i, r.get(c)); i += 1
            })
            st.executeUpdate()
          } finally st.close()
        }
      } finally conn.close()
      }
    }
  }

  // ---- additive (monoid) accumulation ---------------------------------

  /** Per-column merge rule for [[accumulateSql]]: how an incoming
    * partial folds into the stored row when the key already exists.
    * Exactly the monoid column set `Profile.momentPartials` emits —
    * counters add, extrema take min/max. Merge columns are treated as
    * NOT NULL (a NULL poisons an Add visibly; don't feed one). */
  sealed trait MergeOp
  case object Add extends MergeOp
  case object TakeMin extends MergeOp
  case object TakeMax extends MergeOp

  /** Accumulating upsert: INSERT new keys, FOLD existing ones with the
    * per-column [[MergeOp]] — the statement that lets a streaming job
    * maintain mergeable partials (x100's moment monoid, x103's bins)
    * in a real database without read-modify-write. Extrema use CASE
    * (portable — Derby has no LEAST/GREATEST; SQLite's min/max
    * scalars shadow the aggregates). Every non-key column must have
    * an op: an accumulator table is keys + monoid state, nothing
    * else. NOT idempotent under replay by construction — pair it with
    * the [[accumulateBatchIntoJdbc]] ledger for exactly-once.
    */
  def accumulateSql(table: String, cols: Seq[String], keyCols: Seq[String],
      ops: Map[String, MergeOp], nRows: Int, dialect: Dialect): String = {
    require(keyCols.nonEmpty, "accumulate requires key columns")
    val mergeCols = cols.filterNot(keyCols.contains)
    require(mergeCols.nonEmpty, "accumulate requires merge columns")
    require(mergeCols.forall(ops.contains),
      s"every merge column needs a MergeOp; missing: " +
        s"${mergeCols.filterNot(ops.contains).mkString(", ")}")
    val colList = cols.map(q(_, dialect)).mkString(", ")
    val rowPh = cols.map(_ => "?").mkString("(", ", ", ")")
    val t = q(table, dialect)
    def fold(c: String, stored: String, incoming: String): String =
      ops(c) match {
        case Add => s"$stored + $incoming"
        case TakeMin =>
          s"CASE WHEN $incoming < $stored THEN $incoming ELSE $stored END"
        case TakeMax =>
          s"CASE WHEN $incoming > $stored THEN $incoming ELSE $stored END"
      }
    dialect match {
      case Ansi =>
        require(nRows == 1,
          "Ansi dialect merges row-at-a-time (no multi-row MERGE source)")
        val on = keyCols.map(k => s"$t.${q(k, dialect)} = ?")
          .mkString(" AND ")
        val set = mergeCols.map { c =>
          s"${q(c, dialect)} = ${fold(c, s"$t.${q(c, dialect)}", "?")}"
        }.mkString(", ")
        val insPh = cols.map(_ => "?").mkString(", ")
        s"MERGE INTO $t USING SYSIBM.SYSDUMMY1 ON $on" +
          s" WHEN MATCHED THEN UPDATE SET $set" +
          s" WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($insPh)"
      case MySql =>
        val base = s"INSERT INTO $t ($colList) VALUES " +
          Seq.fill(nRows)(rowPh).mkString(", ")
        val upd = mergeCols.map { c =>
          val qc = q(c, dialect)
          s"$qc = ${fold(c, qc, s"VALUES($qc)")}"
        }.mkString(", ")
        s"$base ON DUPLICATE KEY UPDATE $upd"
      case Postgres | Sqlite =>
        val base = s"INSERT INTO $t ($colList) VALUES " +
          Seq.fill(nRows)(rowPh).mkString(", ")
        val conflict = keyCols.map(q(_, dialect)).mkString(", ")
        val upd = mergeCols.map { c =>
          val qc = q(c, dialect)
          s"$qc = ${fold(c, s"$t.$qc", s"EXCLUDED.$qc")}"
        }.mkString(", ")
        s"$base ON CONFLICT ($conflict) DO UPDATE SET $upd"
    }
  }

  /** `?`-position column sequence (with repeats) for one
    * [[accumulateSql]] row — the Ansi CASE folds bind the incoming
    * value twice for extrema. */
  def accumulateParamOrder(cols: Seq[String], keyCols: Seq[String],
      ops: Map[String, MergeOp], dialect: Dialect): Seq[String] =
    dialect match {
      case Ansi =>
        val mergeCols = cols.filterNot(keyCols.contains)
        keyCols ++ mergeCols.flatMap { c =>
          ops(c) match {
            case Add => Seq(c)
            case TakeMin | TakeMax => Seq(c, c)
          }
        } ++ cols
      case _ => cols
    }

  /** Exactly-once accumulation of one micro-batch into a JDBC
    * accumulator table, for `foreachBatch((df, id) => ...)`: additive
    * merges are NOT replay-idempotent (a redelivered batch would
    * double-count — the failure mode `mergeIntoJdbc`'s overwrite
    * semantics don't have), so each partition applies inside ONE
    * transaction that first claims its `(job, batch_id, partition_id)`
    * row in the ledger table (PRIMARY KEY — see
    * `InfraMigrations.ledgerTableSql`). A replayed partition hits the
    * key violation, rolls back, and skips: at-least-once delivery in,
    * exactly-once accumulation out, per partition.
    *
    * The batch must carry ONE row per key per partition (aggregate
    * before calling — `momentPartials` output already does), and the
    * frame's partitioning must be DETERMINISTIC across replays of the
    * same batch id (a groupBy output is — same key lands in the same
    * partition).
    */
  /** A key/unique violation, portably: the dedicated subclass (Derby,
    * MySQL Connector/J) OR SQLState class 23 (integrity constraint —
    * what the PostgreSQL and SQLite drivers report without subclassing).
    */
  private[operators] def isIntegrityViolation(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23"))

  def accumulateBatchIntoJdbc(batch: DataFrame, batchId: Long,
      job: String, url: String, table: String, keyCols: Seq[String],
      ops: Map[String, MergeOp], dialect: Dialect,
      props: java.util.Properties,
      ledgerTable: String = "graft_apply_ledger",
      maxBatchSize: Int = 1000): Unit = {
    val cols = batch.columns.toSeq
    val colIdx = cols.zipWithIndex.toMap
    val paramIdx = accumulateParamOrder(cols, keyCols, ops, dialect)
      .map(colIdx)
    val ledgerSql = s"INSERT INTO ${q(ledgerTable, dialect)} " +
      s"(${Seq("job", "batch_id", "partition_id").map(q(_, dialect)).mkString(", ")}) " +
      "VALUES (?, ?, ?)"
    // the Ansi MERGE has no multi-row source; the VALUES dialects
    // batch up to maxBatchSize rows per statement (the mergeIntoJdbc
    // discipline — per-row round trips would dominate a large partial
    // frame)
    val effBatch = if (dialect == Ansi) 1 else maxBatchSize
    batch.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val claimed =
            try {
              val lg = conn.prepareStatement(ledgerSql)
              try {
                // setObject throughout — the binding style the whole
                // merge path uses (and the statement recorder sees)
                lg.setObject(1, job)
                lg.setObject(2, java.lang.Long.valueOf(batchId))
                lg.setObject(3, java.lang.Integer.valueOf(pid))
                lg.executeUpdate(); true
              } finally lg.close()
            } catch {
              case e: java.sql.SQLException if isIntegrityViolation(e) =>
                conn.rollback(); false // replayed partition: skip whole
            }
          if (claimed) {
            if (effBatch == 1) {
              val st = conn.prepareStatement(
                accumulateSql(table, cols, keyCols, ops, 1, dialect))
              try rows.foreach { r =>
                var i = 1
                paramIdx.foreach { c => st.setObject(i, r.get(c)); i += 1 }
                st.executeUpdate()
              } finally st.close()
            } else rows.grouped(effBatch).foreach { group =>
              val st = conn.prepareStatement(accumulateSql(
                table, cols, keyCols, ops, group.size, dialect))
              try {
                var i = 1
                group.foreach(r => paramIdx.foreach { c =>
                  st.setObject(i, r.get(c)); i += 1
                })
                st.executeUpdate()
              } finally st.close()
            }
            conn.commit()
          }
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: java.sql.SQLException => () }
            throw e
        } finally conn.close()
      }
    }
  }
}
