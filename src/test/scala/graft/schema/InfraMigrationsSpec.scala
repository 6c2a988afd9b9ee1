package graft.schema

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.JdbcMerger.{Ansi, MySql, Postgres, Sqlite}

/** The reference provisions its own tables via generators (outbox
  * backend, db poller, bulk-import column); these pin the engine's
  * dialect DDL text and EXECUTE the Ansi variant end-to-end on
  * embedded Derby — tables, every index, the identity column, the
  * unique topic lease, and the bulk-import ALTER.
  */
class InfraMigrationsSpec extends AnyFunSuite {

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft-derby-infra").toString)

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name"
    try java.sql.DriverManager.getConnection(s"$url;drop=true")
    catch { case _: java.sql.SQLException => () }
    s"$url;create=true"
  }

  private def withConn[T](url: String)(body: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try body(c) finally c.close()
  }

  test("Ansi DDL executes on Derby: stage, drain order, lease, cursor") {
    val url = freshDb("infra")
    withConn(url) { c =>
      val st = c.createStatement()
      (InfraMigrations.outboxTableSql(Ansi) ++
        InfraMigrations.topicInfoTableSql(Ansi) ++
        InfraMigrations.pollInfoTableSql(Ansi)).foreach(st.execute)

      // stage two messages; ids are engine-assigned in insert order
      val ins = c.prepareStatement(
        """INSERT INTO "kafka_messages" ("topic", "message", "key",
          |"partition_key", "created_at", "updated_at")
          |VALUES (?, ?, ?, ?, ?, ?)""".stripMargin)
      Seq("t-a", "t-b").zipWithIndex.foreach { case (t, i) =>
        ins.setString(1, t)
        ins.setBytes(2, Array[Byte](1, 2, (3 + i).toByte))
        ins.setBytes(3, Array[Byte](9))
        ins.setString(4, s"pk$i")
        val now = new java.sql.Timestamp(1700000000000L + i)
        ins.setTimestamp(5, now); ins.setTimestamp(6, now)
        ins.executeUpdate()
      }
      val rs = st.executeQuery(
        """SELECT "id", "topic" FROM "kafka_messages"
          |ORDER BY "topic", "id"""".stripMargin)
      assert(rs.next() && rs.getLong(1) === 1L && rs.getString(2) === "t-a")
      assert(rs.next() && rs.getLong(1) === 2L && rs.getString(2) === "t-b")
      assert(!rs.next())

      // the topic lease is UNIQUE — the serialization the reference's
      // drain depends on
      st.executeUpdate(
        """INSERT INTO "kafka_topic_info" ("topic") VALUES ('t-a')""")
      intercept[java.sql.SQLIntegrityConstraintViolationException] {
        st.executeUpdate(
          """INSERT INTO "kafka_topic_info" ("topic") VALUES ('t-a')""")
      }
      // defaults: error=false, retries=0
      val lease = st.executeQuery(
        """SELECT "error", "retries" FROM "kafka_topic_info"""")
      assert(lease.next() && !lease.getBoolean(1) && lease.getInt(2) === 0)

      // poller cursor row
      st.executeUpdate(
        """INSERT INTO "deimos_poll_info" ("producer", "last_sent_id")
          |VALUES ('orders', 42)""".stripMargin)
      val cur = st.executeQuery(
        """SELECT "last_sent_id" FROM "deimos_poll_info"
          |WHERE "producer" = 'orders'""".stripMargin)
      assert(cur.next() && cur.getLong(1) === 42L)
    }
  }

  test("bulk-import column ALTER executes and is queryable") {
    val url = freshDb("infra_bulk")
    withConn(url) { c =>
      val st = c.createStatement()
      st.execute("""CREATE TABLE "widgets" ("id" BIGINT PRIMARY KEY)""")
      InfraMigrations.bulkImportIdSql("widgets", Ansi).foreach(st.execute)
      st.executeUpdate(
        """INSERT INTO "widgets" ("id", "bulk_import_id")
          |VALUES (1, 'uuid-1')""".stripMargin)
      val rs = st.executeQuery(
        """SELECT "id" FROM "widgets" WHERE "bulk_import_id" = 'uuid-1'""")
      assert(rs.next() && rs.getLong(1) === 1L)
    }
  }

  test("dialect text: identity, payload and quoting per engine") {
    val my = InfraMigrations.outboxTableSql(MySql).mkString(";")
    assert(my.contains("AUTO_INCREMENT") && my.contains("MEDIUMBLOB")
      && my.contains("`kafka_messages`"))
    val pg = InfraMigrations.outboxTableSql(Postgres).mkString(";")
    assert(pg.contains("BIGSERIAL") && pg.contains("BYTEA"))
    val lite = InfraMigrations.topicInfoTableSql(Sqlite).mkString(";")
    assert(lite.contains("INTEGER PRIMARY KEY AUTOINCREMENT")
      && lite.contains("DEFAULT 0"))
    // every dialect emits the same statement COUNT per feature
    Seq(MySql, Postgres, Sqlite, Ansi).foreach { d =>
      assert(InfraMigrations.outboxTableSql(d).size === 2)
      assert(InfraMigrations.topicInfoTableSql(d).size === 4)
      assert(InfraMigrations.pollInfoTableSql(d).size === 2)
      assert(InfraMigrations.bulkImportIdSql("t", d).size === 2)
      assert(InfraMigrations.ledgerTableSql(d).size === 1)
      assert(InfraMigrations.ledgerTableSql(d).head
        .contains("PRIMARY KEY"))
    }
  }

  test("writeAll emits ordered flyway-style files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-infra-sql")
    val files = InfraMigrations.writeAll(dir, Postgres, startVersion = 4)
    assert(files.map(_.getFileName.toString) === Seq(
      "V004__create_kafka_messages.sql",
      "V005__create_kafka_topic_info.sql",
      "V006__create_deimos_poll_info.sql",
      "V007__create_graft_apply_ledger.sql"))
    val body = new String(
      java.nio.file.Files.readAllBytes(files.head), "UTF-8")
    assert(body.contains("CREATE TABLE") && body.trim.endsWith(";"))
  }
}
