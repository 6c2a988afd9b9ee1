package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("a b c a", 1)).toDF("text", "one").createOrReplaceTempView("docs")
    val row = spark.sql(
      """SELECT
        |  graft_simhash64(transform(split(text, ' '), t -> xxhash64(t))) AS sh,
        |  size(graft_minhash(transform(split(text, ' '), t -> xxhash64(t)), 8)) AS mh_k,
        |  size(graft_ngram_hashes(transform(split(text, ' '), t -> xxhash64(t)), 2)) AS grams,
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos
        |FROM docs""".stripMargin).collect()(0)
    assert(row.getAs[Long]("mh_k") === 8)
    // "a b","b c","c a" distinct 2-grams
    assert(row.getAs[Int]("grams") === 3)
    assert(row.getAs[Double]("cos") === 1.0)
  }

  test("avro encode/decode round-trips through SQL") {
    GraftExtensions.register(spark)
    val schema =
      """{"type":"record","name":"R","fields":[{"name":"x","type":"long"}]}"""
    val got = spark.sql(
      s"""SELECT graft_avro_decode(
         |  graft_avro_encode(named_struct('x', 42L), '$schema'),
         |  '$schema').x AS x""".stripMargin)
      .as[Long].collect()(0)
    assert(got === 42L)
  }

  test("media probes are callable from SQL") {
    GraftExtensions.register(spark)
    Seq((graft.ext.MediaProbe.pngBytes(12, 7),
      graft.ext.MediaProbe.wavBytes(2, 8000, 16, 800)))
      .toDF("png", "wav").createOrReplaceTempView("media")
    val row = spark.sql(
      """SELECT graft_probe_media(png).width AS w,
        |  graft_probe_media(png).media_type AS mt,
        |  graft_probe_wav(wav).n_channels AS ch,
        |  graft_probe_wav(wav).duration_ms AS ms,
        |  graft_nfc('café') AS nfc,
        |  size(graft_winnow(CAST('hello winnowing' AS BINARY), 3, 2)) AS wn
        |FROM media""".stripMargin).collect()(0)
    assert(row.getAs[Long]("w") === 12L)
    assert(row.getAs[String]("mt") === "image/png")
    assert(row.getAs[Int]("ch") === 2)
    assert(row.getAs[Long]("ms") === 100L)
    assert(row.getAs[String]("nfc") === "café")
    assert(row.getAs[Int]("wn") > 0)
  }

  test("session built with spark.sql.extensions resolves graft functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // same context, new session state with extensions applied
    val fresh = s2.newSession()
    assert(spark.sparkContext eq s2.sparkContext)
    GraftExtensions.register(fresh) // temp-function path always works
    assert(fresh.sql("SELECT graft_schema_id(CAST(x'000000002A99' AS BINARY)) AS id")
      .collect()(0).getAs[Int]("id") === 42)
  }

  test("full-decode stats are callable from SQL") {
    GraftExtensions.register(spark)
    Seq((graft.ext.PixelDecode.pngPixelBytes(9, 4, 7),
      graft.ext.GifDecode.gifPixelBytes(9, 4, 7)))
      .toDF("png", "gif").createOrReplaceTempView("blobs")
    val row = spark.sql(
      """SELECT graft_png_stats(png).n_samples AS pn,
        |  graft_gif_stats(gif).n_samples AS gn,
        |  graft_gif_stats(gif).width AS gw FROM blobs""".stripMargin)
      .collect().head
    assert(row.getLong(0) === 36L)
    assert(row.getLong(1) === 108L) // 9*4*3 rgb samples
    assert(row.getLong(2) === 9L)
  }

  test("text stack from SQL equals the DataFrame API") {
    GraftExtensions.register(spark)
    import graft.functions.{TextFunctions => T}
    val docs = Seq(
      (1L, "the cat and the hat, le chat!"),
      (2L, "der die und das ist"),
      (3L, "   "),
      (4L, "x1 y2 z3")).toDF("id", "text")
    docs.createOrReplaceTempView("sql_text_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_ws_tokens(text) AS n,
        |  graft_bpeish_tokens(text) AS b, graft_langid(text) AS l,
        |  graft_stop_hits(text) AS s, graft_punct_count(text) AS p,
        |  graft_quality_gate(text).n_words AS qn
        |FROM sql_text_docs""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val viaDf = docs.select(col("id"), T.wsTokenCount(col("text")),
      T.bpeishTokenCount(col("text")), T.langId(col("text")),
      T.stopwordHits(col("text"), T.StopwordLists.head._2),
      T.punctCount(col("text")),
      T.qualityGate(col("text"), T.StopwordLists.head._2)
        .getField("n_words")).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(viaSql === viaDf)
    // spot-check absolute values so both paths can't be wrong together
    assert(viaSql(1L).take(4) === Seq(7L, 9L, "en", 3L))
    assert(viaSql(2L)(2) === "de")
    assert(viaSql(3L).head === 0L)
  }
}
