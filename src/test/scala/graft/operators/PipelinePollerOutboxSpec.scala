package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("schemaProject keeps declared∩present minus bookkeeping, in declared order") {
    val df = Seq((1L, "x", "now", 2.0)).toDF("id", "name", "created_at", "v")
    val got = Pipeline.schemaProject(df, Seq("v", "id", "created_at", "ghost"))
    assert(got.columns.toSeq === Seq("v", "id"))
  }

  test("coercions follow the reference rules") {
    val df = Seq(("42", "3.5x", "")).toDF("i", "d", "e")
    val r = df.select(
      Pipeline.coerceIntString(col("i")).as("i"),
      Pipeline.coerceDoubleString(col("d")).as("d"),
      Pipeline.coerceIntString(col("e")).as("e"))
      .as[(Option[Long], Option[Double], Option[Long])].collect()(0)
    assert(r === ((Some(42L), Some(3.5), None)))
  }

  test("coerceNumericPair is value-identical to the single-column coercions") {
    // the adversarial shapes: ints, decimals, negatives, embedded text,
    // doubled minus, dot-led fraction, multiple numbers, empty, null
    val inputs = Seq("42", "3.5x", "", "a-12.7b", "--5", ".5", "1.2.3",
      "x9 8.1", "-0.0", "no digits", null)
    val df = inputs.toDF("s")
    val (fi, fd) = Pipeline.coerceNumericPair(col("s"))
    val got = df.select(
      Pipeline.coerceIntString(col("s")).as("ri"),
      Pipeline.coerceDoubleString(col("s")).as("rd"),
      fi.as("fi"), fd.as("fd"))
      .as[(Option[Long], Option[Double], Option[Long], Option[Double])]
      .collect()
    got.zip(inputs).foreach { case ((ri, rd, fiV, fdV), in) =>
      assert(fiV === ri, s"int mismatch on '$in'")
      assert(fdV === rd, s"double mismatch on '$in'")
    }
  }

  test("autoFields fills only missing values; deterministic surrogate is stable") {
    val df = Seq((1L, Some("keep")), (2L, None))
      .toDF("id", "message_id")
    val got = Pipeline.autoFields(df,
      surrogate = _ => Pipeline.deterministicSurrogate("t", Seq(col("id"))),
      now = lit(Timestamp.valueOf("2024-01-01 00:00:00")))
    val rows = got.select("id", "message_id").as[(Long, String)]
      .collect().toMap
    assert(rows(1L) === "keep")
    assert(rows(2L).matches("[0-9a-f]{32}"))
    assert(got.columns.contains("timestamp"))
  }

  test("extractKey resolves nested dot-paths") {
    val df = Seq((("inner1", 5L), "top")).toDF("payload", "other")
      .withColumn("k", Pipeline.extractKey("payload._2"))
    assert(df.select("k").as[Long].collect()(0) === 5L)
  }

  test("truncateColumns respects limits and ignores absent columns") {
    val df = Seq(("abcdef", "xy")).toDF("a", "b")
    val got = Pipeline.truncateColumns(df, Map("a" -> 3, "zz" -> 1))
      .select("a", "b").as[(String, String)].collect()(0)
    assert(got === (("abc", "xy")))
  }
}

class PollerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tbl = Seq(
    (1L, ts("2024-01-01 00:00:00")), // = from, id ≤ minId → excluded
    (3L, ts("2024-01-01 00:00:00")), // = from, id > minId → included
    (4L, ts("2024-01-02 00:00:00")), // > from → included
    (5L, ts("2024-01-05 00:00:00")), // > to → excluded
    (6L, ts("2023-12-30 00:00:00"))) // < from → excluded
    .toDF("id", "ts")

  test("timeBasedScan reproduces the reference poll predicate and ordering") {
    val got = Poller.timeBasedScan(tbl, col("ts"), col("id"),
      lit(ts("2024-01-01 00:00:00")), lit(2L), lit(ts("2024-01-04 00:00:00")))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(3L, 4L))
  }

  test("timeBasedScan caps at batchSize in (ts,id) order") {
    val got = Poller.timeBasedScan(tbl, col("ts"), col("id"),
      lit(ts("2023-01-01 00:00:00")), lit(0L), lit(ts("2025-01-01 00:00:00")),
      batchSize = 2)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(6L, 1L))
  }

  test("advanceCursor returns max(ts,id); None on empty batch") {
    val c = Poller.advanceCursor(tbl, "ts", "id")
    assert(c.contains(Poller.Cursor(ts("2024-01-05 00:00:00"), 5L)))
    assert(Poller.advanceCursor(tbl.filter(col("id") < 0), "ts", "id").isEmpty)
  }

  test("finalizeBatch flips published/failed state") {
    val batch = Seq((1L, "pending"), (2L, "pending")).toDF("id", "state")
      .withColumn("updated_at", lit(ts("2024-01-01 00:00:00")))
    val ok = Seq(Tuple1(1L)).toDF("id")
    val got = Poller.finalizeBatch(batch, "id", ok, "state",
      "published", "failed", "updated_at")
      .select("id", "state").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "published", 2L -> "failed"))
  }
}

class OutboxSpec extends SparkSpec {
  import spark.implicits._

  private def staged = Seq(
    (1L, "t1", "A"), (2L, "t1", "A"), (3L, "t1", "B"),
    (4L, "t2", "A"), (5L, "t2", "A"))
    .toDF("id", "topic", "key")

  test("pendingMetrics counts per topic") {
    val got = Outbox.pendingMetrics(staged.withColumn("created_at", col("id")))
      .select("topic", "pending_count").as[(String, Long)].collect().toMap
    assert(got === Map("t1" -> 3L, "t2" -> 2L))
  }

  test("drainBatch compacts per (topic,key) when compactAll") {
    val got = Outbox.drainBatch(staged, "topic", "id", "key",
      compactAll = true)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 5L))
  }

  test("drainBatch compacts only listed topics otherwise") {
    val got = Outbox.drainBatch(staged, "topic", "id", "key",
      compactTopics = Set("t2"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 5L))
  }

  test("drainBatch respects per-topic batch size in id order") {
    val got = Outbox.drainBatch(staged, "topic", "id", "key", batchSize = 1)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 4L))
  }

  test("deleteDrained anti-joins drained ids") {
    val drained = Seq(Tuple1(1L), Tuple1(4L)).toDF("id")
    val got = Outbox.deleteDrained(staged, drained, "id")
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L, 3L, 5L))
  }
}

class JdbcMergerSpec extends SparkSpec {
  import JdbcMerger._

  test("mysql upsert uses ON DUPLICATE KEY UPDATE over non-key cols") {
    val sql = upsertSql("w", Seq("id", "a", "b"), Seq("id"), 2, MySql)
    assert(sql === "INSERT INTO `w` (`id`, `a`, `b`) VALUES (?, ?, ?), (?, ?, ?)" +
      " ON DUPLICATE KEY UPDATE `a` = VALUES(`a`), `b` = VALUES(`b`)")
  }

  test("postgres upsert uses ON CONFLICT ... EXCLUDED") {
    val sql = upsertSql("w", Seq("id", "a"), Seq("id"), 1, Postgres)
    assert(sql === "INSERT INTO \"w\" (\"id\", \"a\") VALUES (?, ?)" +
      " ON CONFLICT (\"id\") DO UPDATE SET \"a\" = EXCLUDED.\"a\"")
  }

  test("version-guarded upsert: PG WHERE clause, MySQL IF with version last") {
    val pg = upsertSql("w", Seq("id", "a", "ver"), Seq("id"), 1, Postgres,
      versionCol = Some("ver"))
    assert(pg.endsWith(
      "ON CONFLICT (\"id\") DO UPDATE SET \"a\" = EXCLUDED.\"a\", " +
        "\"ver\" = EXCLUDED.\"ver\" WHERE EXCLUDED.\"ver\" > \"w\".\"ver\""))
    val my = upsertSql("w", Seq("id", "a", "ver"), Seq("id"), 1, MySql,
      versionCol = Some("ver"))
    assert(my.endsWith(
      "ON DUPLICATE KEY UPDATE `a` = IF(VALUES(`ver`) > `ver`, VALUES(`a`), `a`), " +
        "`ver` = IF(VALUES(`ver`) > `ver`, VALUES(`ver`), `ver`)"))
  }

  test("sqlite upsert: ON CONFLICT like PG, version guard on bare table name") {
    // completes the reference's 3-DB matrix (spec_helper.rb:102-142)
    val sql = upsertSql("w", Seq("id", "a"), Seq("id"), 2, Sqlite)
    assert(sql === "INSERT INTO \"w\" (\"id\", \"a\") VALUES (?, ?), (?, ?)" +
      " ON CONFLICT (\"id\") DO UPDATE SET \"a\" = EXCLUDED.\"a\"")
    val guarded = upsertSql("w", Seq("id", "a", "ver"), Seq("id"), 1, Sqlite,
      versionCol = Some("ver"))
    assert(guarded.endsWith(
      "ON CONFLICT (\"id\") DO UPDATE SET \"a\" = EXCLUDED.\"a\", " +
        "\"ver\" = EXCLUDED.\"ver\" WHERE EXCLUDED.\"ver\" > \"w\".\"ver\""))
    // row-constructor IN delete (SQLite supports row values since 3.15)
    assert(deleteSql("w", Seq("k1", "k2"), 1, Sqlite) ===
      "DELETE FROM \"w\" WHERE (\"k1\", \"k2\") IN ((?, ?))")
  }

  test("keyless upsert degrades to plain INSERT (reference mass_updater.rb:54-55)") {
    assert(upsertSql("w", Seq("a"), Nil, 1, MySql) ===
      "INSERT INTO `w` (`a`) VALUES (?)")
  }

  test("compound-key delete uses row constructors") {
    assert(deleteSql("w", Seq("k1", "k2"), 2, Postgres) ===
      "DELETE FROM \"w\" WHERE (\"k1\", \"k2\") IN ((?, ?), (?, ?))")
  }

  test("keys-only tables upsert as insert-if-absent on every dialect") {
    // every column is a key: an empty UPDATE/SET list is a syntax
    // error — each dialect needs its no-op form
    assert(upsertSql("w", Seq("k1", "k2"), Seq("k1", "k2"), 1, MySql) ===
      "INSERT INTO `w` (`k1`, `k2`) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE `k1` = `k1`")
    assert(upsertSql("w", Seq("k1", "k2"), Seq("k1", "k2"), 1, Postgres) ===
      "INSERT INTO \"w\" (\"k1\", \"k2\") VALUES (?, ?) " +
        "ON CONFLICT (\"k1\", \"k2\") DO NOTHING")
    assert(upsertSql("w", Seq("k1", "k2"), Seq("k1", "k2"), 1, Sqlite) ===
      "INSERT INTO \"w\" (\"k1\", \"k2\") VALUES (?, ?) " +
        "ON CONFLICT (\"k1\", \"k2\") DO NOTHING")
  }

  test("version-guarded delete: OR-of-ANDs with the stored < tombstone rule") {
    assert(deleteSql("w", Seq("k"), 2, Postgres,
        versionCol = Some("ver")) ===
      "DELETE FROM \"w\" WHERE (\"k\" = ? AND \"ver\" < ?) OR " +
        "(\"k\" = ? AND \"ver\" < ?)")
  }

  test("keyless deleteSql fails loudly instead of emitting malformed SQL") {
    val e = intercept[IllegalArgumentException](
      deleteSql("w", Nil, 1, Postgres))
    assert(e.getMessage.contains("key column"))
  }

  test("SQLITE_BUSY contention is retried like a deadlock") {
    var calls = 0
    intercept[RuntimeException] {
      withDeadlockRetry(sleeper = _ => ()) {
        calls += 1
        throw new RuntimeException("[SQLITE_BUSY] database is locked")
      }
    }
    assert(calls === 3)
  }

  test("deadlock retry retries at most twice with injected sleeper") {
    var calls = 0
    var sleeps = 0
    intercept[RuntimeException] {
      withDeadlockRetry(sleeper = _ => sleeps += 1) {
        calls += 1; throw new RuntimeException("Deadlock found when trying")
      }
    }
    assert(calls === 3 && sleeps === 2)
    // non-deadlock errors are not retried
    calls = 0
    intercept[RuntimeException] {
      withDeadlockRetry(sleeper = _ => ()) {
        calls += 1; throw new RuntimeException("syntax error")
      }
    }
    assert(calls === 1)
  }
}
