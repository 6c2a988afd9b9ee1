package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.JdbcMerger.{Add, Ansi, MySql, Postgres, Sqlite,
  TakeMax, TakeMin}

/** Additive (monoid) accumulation into a real database: statement
  * text per dialect, the Ansi parameter layout, and the headline —
  * a Structured Streaming job maintaining `Profile.momentPartials`
  * in embedded Derby across micro-batches, with the (job, batch,
  * partition) ledger making replays exactly-once.
  */
class AdditiveMergeSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("graft-derby-acc").toString)

  private val ops = Map("n_rows" -> Add, "n_nulls" -> Add, "s1" -> Add,
    "s2" -> Add, "min_val" -> TakeMin, "max_val" -> TakeMax)
  private val cols = Seq("slice", "n_rows", "n_nulls", "s1", "s2",
    "min_val", "max_val")

  test("accumulate SQL folds adds and extrema per dialect") {
    val my = JdbcMerger.accumulateSql("acc", Seq("k", "n", "mn"),
      Seq("k"), Map("n" -> Add, "mn" -> TakeMin), 2, MySql)
    assert(my.contains("`n` = `n` + VALUES(`n`)"), my)
    assert(my.contains(
      "`mn` = CASE WHEN VALUES(`mn`) < `mn` THEN VALUES(`mn`) ELSE `mn` END"),
      my)
    assert(my.contains("VALUES (?, ?, ?), (?, ?, ?)"), my)
    val pg = JdbcMerger.accumulateSql("acc", Seq("k", "n", "mx"),
      Seq("k"), Map("n" -> Add, "mx" -> TakeMax), 1, Postgres)
    assert(pg.contains("""ON CONFLICT ("k") DO UPDATE SET"""), pg)
    assert(pg.contains(""""n" = "acc"."n" + EXCLUDED."n""""), pg)
    assert(pg.contains(
      """CASE WHEN EXCLUDED."mx" > "acc"."mx" THEN EXCLUDED."mx""""), pg)
    val lite = JdbcMerger.accumulateSql("acc", Seq("k", "n"), Seq("k"),
      Map("n" -> Add), 1, Sqlite)
    assert(lite.contains("""ON CONFLICT ("k") DO UPDATE SET"""), lite)
    val ansi = JdbcMerger.accumulateSql("acc", Seq("k", "n", "mn"),
      Seq("k"), Map("n" -> Add, "mn" -> TakeMin), 1, Ansi)
    assert(ansi.contains("MERGE INTO \"acc\" USING SYSIBM.SYSDUMMY1"), ansi)
    assert(ansi.contains("\"n\" = \"acc\".\"n\" + ?"), ansi)
    intercept[IllegalArgumentException] { // missing op for a column
      JdbcMerger.accumulateSql("acc", Seq("k", "n"), Seq("k"),
        Map.empty, 1, Ansi)
    }
  }

  test("Ansi param order binds extrema twice (the CASE reads it twice)") {
    val order = JdbcMerger.accumulateParamOrder(
      Seq("k", "n", "mn"), Seq("k"), Map("n" -> Add, "mn" -> TakeMin),
      Ansi)
    assert(order === Seq("k", "n", "mn", "mn", "k", "n", "mn"))
    assert(JdbcMerger.accumulateParamOrder(
      Seq("k", "n"), Seq("k"), Map("n" -> Add), Postgres)
      === Seq("k", "n"))
  }

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name"
    try java.sql.DriverManager.getConnection(s"$url;drop=true")
    catch { case _: java.sql.SQLException => () }
    s"$url;create=true"
  }

  private def setupTables(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("""CREATE TABLE "acc" ("slice" VARCHAR(64) NOT NULL,
        "n_rows" BIGINT, "n_nulls" BIGINT, "s1" BIGINT, "s2" BIGINT,
        "min_val" BIGINT, "max_val" BIGINT, PRIMARY KEY ("slice"))""")
      graft.schema.InfraMigrations.ledgerTableSql(Ansi).foreach(st.execute)
    } finally c.close()
  }

  private def readAcc(url: String): Map[String, (Long, Long, Long, Long, Long)] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        """SELECT "slice", "n_rows", "s1", "s2", "min_val", "max_val"
          |FROM "acc"""".stripMargin)
      val out = scala.collection.mutable.Map[String, (Long, Long, Long, Long, Long)]()
      while (rs.next()) out(rs.getString(1)) = (rs.getLong(2),
        rs.getLong(3), rs.getLong(4), rs.getLong(5), rs.getLong(6))
      out.toMap
    } finally c.close()
  }

  test("streaming momentPartials accumulate exactly into Derby") {
    val url = freshDb("accstream")
    setupTables(url)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = input.toDS().toDF("slice", "v").writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val partials = Profile.momentPartials(df, col("slice"), col("v"))
          .select(cols.map(col): _*)
        JdbcMerger.accumulateBatchIntoJdbc(partials, id, "acc-job", url,
          "acc", Seq("slice"), ops, Ansi, new java.util.Properties)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-accs").toString)
      .start()
    val fed = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    try {
      val batches = Seq(
        Seq(("a", 10L), ("a", 20L), ("b", 5L)),
        Seq(("a", 1L), ("c", 7L)),
        Seq(("b", 100L), ("a", 30L)))
      batches.foreach { b =>
        fed ++= b; input.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // stored accumulator equals a one-shot batch recompute
    val want = fed.groupBy(_._1).map { case (s, rows) =>
      val vs = rows.map(_._2)
      s -> ((vs.size.toLong, vs.sum, vs.map(v => v * v).sum,
        vs.min, vs.max))
    }
    assert(readAcc(url) === want)
  }

  test("VALUES dialects batch multi-row accumulate statements") {
    graft.testkit.MockJdbc.install()
    val d = graft.testkit.MockJdbc.reset("accbatch")
    val partials = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "n")
      .repartition(1).sortWithinPartitions("k")
    JdbcMerger.accumulateBatchIntoJdbc(partials, 7L, "mb",
      "jdbc:graftmock:accbatch", "acc", Seq("k"), Map("n" -> Add),
      Postgres, new java.util.Properties)
    val execs = d.execList
    val ledger = execs.filter(_.sql.contains("graft_apply_ledger"))
    assert(ledger.map(_.params) === Seq(Seq("mb", 7L, 0)))
    val accs = execs.filter(_.sql.contains("ON CONFLICT"))
    assert(accs.size === 1, accs.map(_.sql)) // ONE statement, not 3
    assert(accs.head.sql.contains("VALUES (?, ?), (?, ?), (?, ?)"),
      accs.head.sql)
    assert(accs.head.params === Seq("a", 1L, "b", 2L, "c", 3L))
  }

  test("integrity violations are recognized portably (SQLState class 23)") {
    // PostgreSQL/SQLite drivers report 23xxx WITHOUT subclassing
    assert(JdbcMerger.isIntegrityViolation(
      new java.sql.SQLException("duplicate key", "23505")))
    assert(JdbcMerger.isIntegrityViolation(
      new java.sql.SQLIntegrityConstraintViolationException("dup")))
    assert(!JdbcMerger.isIntegrityViolation(
      new java.sql.SQLException("syntax error", "42601")))
    assert(!JdbcMerger.isIntegrityViolation(
      new java.sql.SQLException("no state", null.asInstanceOf[String])))
  }

  test("streaming CMS cells accumulate exactly-once into Derby") {
    // the frequency sketch joins the momentPartials story: per
    // micro-batch cells Add-merge into the (row_i, bucket) table, and
    // the accumulated sketch estimates EXACTLY like a one-shot build
    // over everything fed — the cell-level monoid survives batching,
    // the ledger survives replay
    val url = freshDb("cmsstream")
    val c0 = java.sql.DriverManager.getConnection(url)
    try {
      val st = c0.createStatement()
      st.execute("""CREATE TABLE "cms" ("row_i" INT NOT NULL,
        "bucket" BIGINT NOT NULL, "cnt" BIGINT,
        PRIMARY KEY ("row_i", "bucket"))""")
      graft.schema.InfraMigrations.ledgerTableSql(Ansi).foreach(st.execute)
    } finally c0.close()
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    var lastBatch = -1L
    val q = input.toDS().toDF("k").writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        lastBatch = id
        val cells = Profile.cmsCombine(Profile.cmsPartials(
          df, lit("mb"), col("k"), depth = 2, width = 8))
          .select(col("row_i"), col("bucket"), col("cnt"))
        JdbcMerger.accumulateBatchIntoJdbc(cells, id, "cms-job", url,
          "cms", Seq("row_i", "bucket"), Map("cnt" -> Add), Ansi,
          new java.util.Properties)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cmss").toString)
      .start()
    val fed = scala.collection.mutable.ArrayBuffer[Long]()
    try {
      Seq(Seq(1L, 2L, 2L, 9L), Seq(2L, 3L, 17L), Seq(1L, 1L, 42L))
        .foreach { b => fed ++= b; input.addData(b: _*)
          q.processAllAvailable() }
    } finally q.stop()
    def readCells(): Seq[(Int, Long, Long)] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          """SELECT "row_i", "bucket", "cnt" FROM "cms"""")
        val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
        while (rs.next())
          out += ((rs.getInt(1), rs.getLong(2), rs.getLong(3)))
        out.toSeq.sorted
      } finally c.close()
    }
    val accumulated = readCells()
    // accumulated table ≡ one-shot sketch over everything fed
    val oneShot = Profile.cmsCombine(Profile.cmsPartials(
      fed.toSeq.toDF("k"), lit("all"), col("k"), depth = 2, width = 8))
      .select(col("row_i"), col("bucket"), col("cnt"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    assert(accumulated === oneShot)
    // estimates off the DATABASE sketch are never below truth
    val sketchDf = accumulated.toDF("row_i", "bucket", "cnt")
      .withColumn("slice", lit("db"))
    val est = Profile.cmsEstimate(sketchDf,
      fed.toSeq.distinct.toDF("k"), "k", depth = 2, width = 8)
      .as[(Long, Long)].collect().toMap
    val truth = fed.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    truth.foreach { case (k, t) => assert(est(k) >= t, s"key $k") }
    // replaying the final micro-batch is a ledger no-op
    val replayCells = Profile.cmsCombine(Profile.cmsPartials(
      Seq(1L, 1L, 42L).toDF("k"), lit("mb"), col("k"), depth = 2,
      width = 8)).select(col("row_i"), col("bucket"), col("cnt"))
    JdbcMerger.accumulateBatchIntoJdbc(replayCells, lastBatch, "cms-job",
      url, "cms", Seq("row_i", "bucket"), Map("cnt" -> Add), Ansi,
      new java.util.Properties)
    assert(readCells() === accumulated, "replay must not double-count")
  }

  test("a replayed batch id is a no-op (ledger exactly-once)") {
    val url = freshDb("accreplay")
    setupTables(url)
    val partials = Profile.momentPartials(
      Seq(("a", 10L), ("b", 4L)).toDF("slice", "v"),
      col("slice"), col("v")).select(cols.map(col): _*)
    def apply(id: Long): Unit =
      JdbcMerger.accumulateBatchIntoJdbc(partials, id, "rj", url, "acc",
        Seq("slice"), ops, Ansi, new java.util.Properties)
    apply(0L)
    val first = readAcc(url)
    apply(0L) // replay: every partition hits the ledger PK and skips
    assert(readAcc(url) === first, "replayed batch must not double-count")
    apply(1L) // a NEW batch id applies
    assert(readAcc(url)("a")._1 === 2L)
    assert(readAcc(url)("a")._2 === 20L)
  }
}
