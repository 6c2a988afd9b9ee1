package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve harness: measure the heavy-tail queries at 1× and K×
  * the sf0.1 corpus and assert growth stays ~linear — the guard for
  * the 100 TB design claim that sf0.1 (17 MB) alone cannot give.
  * A super-linear term (an uncapped quadratic candidate stage, a
  * window that degenerates to one partition, a driver-side
  * accumulation) shows up as growth ≫ K here long before it would
  * kill a 1000-executor job.
  *
  * K× corpus construction (deterministic, id-offset discipline):
  *
  *  - TPC-H tables (orders/lineitem/supplier/customer): replica r
  *    shifts every join key by r·10⁸ — referential integrity holds
  *    WITHIN a replica, keys are disjoint ACROSS replicas, so the
  *    trade graph becomes K disjoint copies and graph/join work
  *    scales exactly K×.
  *  - documents: doc_id + r·10⁷ (clears the x124 mutant band at
  *    +10⁶), and for r>0 every 4th token is REPLACED by a
  *    position+replica-keyed marker `zq<r>x<i>`. Replacement (not
  *    insertion) keeps token counts exactly linear; markers keyed by
  *    (r, i) but NOT doc_id preserve intra-replica duplicate
  *    structure while pushing cross-replica 3-shingle Jaccard to
  *    ~1/7 — below the 0.2 LSH verification threshold — so dedup
  *    workloads see K× the corpus, not K² the candidate pairs. The
  *    marker swap keeps stopword hits (≥1 survives easily) and mean
  *    token length inside the x74 gate envelope, so the x81 pipeline
  *    processes replicas, not drops them.
  *
  * Output: one JSON line {"metric":"scale_curve","factor":K,
  * "queries":{name:{"t1":s,"tk":s,"growth":g}},"max_growth":g,
  * "pass":bool}; pass = every growth ≤ SPARK_GRAFT_SCALE_MAX
  * (default 12 — K plus scheduling/sort log-factor headroom).
  * Timing is Bench's discipline: untimed warmup per dir, min-of-3.
  */
object ScaleCurve {

  val DefaultQueries: Seq[String] = Seq(
    "x94_pagerank", "x102_ppr", "x124_prefix_jaccard", "x81_pipeline",
    "x13_dedup_groups", "q18_dead_letter", "x7_ann_lsh",
    "x134_image_dhash", "x136_video_fingerprint",
    "x140_curation_increment", "x146_radius7_near_dup",
    // the GOVERNED radius-7 path: the hot-bucket cap fires at every
    // scale (x146 measures the ungoverned exact search; this row
    // proves the governor actually bounds growth)
    "x149_radius7_capped")

  private val TpchOffset = 100000000L
  /** Replica id stride for documents/embeddings — also the band width
    * of the media gates' scale-invariant seed formula (ExtQueries
    * mediaSeed), which is what keeps their dup-rate constant under
    * replication. */
  private[graft] val DocOffset = 10000000L

  /** Replicate the five input tables K× from baseDir into outDir.
    * Layout discipline: each replica lands in its own range partition
    * (ordered by the table's id within it), so the K× directory has
    * ~K× the files of the base — the scan parallelism a genuinely
    * K×-sized corpus would have, not one K×-fatter file. */
  val AllTables: Seq[String] = Seq("orders", "lineitem", "supplier",
    "customer", "documents", "embeddings", "events")

  /** @param tables subset of [[AllTables]] to materialize — third-decade
    *   probes on a single query family don't need the 11 GB of 1000×
    *   lineitem that a full-table build would write. The recipe marker
    *   records the subset, so a later broader run rebuilds. */
  def buildScaledDir(spark: SparkSession, baseDir: String, outDir: String,
      k: Int, tables: Seq[String] = AllTables): Unit = {
    require(k >= 1, s"factor must be >= 1: $k")
    val unknown = tables.filterNot(AllTables.contains)
    require(unknown.isEmpty, s"unknown scale tables: ${unknown.mkString(",")}")
    def base(name: String): DataFrame =
      spark.read.parquet(s"$baseDir/$name.parquet")
    // The base tables are single-split files; without a pre-explode
    // spread the k× replication (and the per-replica text/vector
    // rewrites below) runs as ONE task. Spreading the small base
    // across the cluster first makes the build scale with cores —
    // at k=1000 this is the difference between minutes and hours.
    val buildParallelism = spark.sparkContext.defaultParallelism
    def explodeReplicas(df: DataFrame): DataFrame =
      df.repartition(buildParallelism)
        .withColumn("__r", explode(sequence(lit(0L), lit(k - 1L))))

    def shiftKeys(name: String, keys: Seq[String], idKey: String): Unit = {
      if (!tables.contains(name)) return
      val src = explodeReplicas(base(name))
      val out = src.columns.filter(_ != "__r").map { c =>
        if (keys.contains(c)) (col(c) + col("__r") * TpchOffset).as(c)
        else col(c)
      }
      src.select(col("__r") +: out.toSeq: _*)
        .repartitionByRange(k, col("__r"), col(idKey))
        .drop("__r")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

    shiftKeys("orders", Seq("o_orderkey", "o_custkey"), "o_orderkey")
    shiftKeys("lineitem", Seq("l_orderkey", "l_suppkey"), "l_orderkey")
    shiftKeys("supplier", Seq("s_suppkey", "s_nationkey"), "s_suppkey")
    shiftKeys("customer", Seq("c_custkey"), "c_custkey")
    // events (round-16: x123's curve leg previously failed — event-time
    // queries had NO scaled table): ids/users shift per replica; ts is
    // kept VERBATIM, so the event-time span is constant and the corpus
    // densifies K× within it — the realistic stream-growth shape
    // (cusum buckets stay |days| with K× the mass; sessions/funnels
    // gain K× disjoint users, not a K×-longer history).
    shiftKeys("events", Seq("event_id", "user_id"), "event_id")

    if (tables.contains("documents")) {
    val docs = explodeReplicas(base("documents"))
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    val marked = array_join(
      transform(toks, (tok, i) =>
        when(i % 4 === 0,
          concat(lit("zq"), col("__r"), lit("x"), i)).otherwise(tok)),
      " ")
    val outCols = docs.columns.filter(_ != "__r").map {
      case "doc_id" => (col("doc_id") + col("__r") * DocOffset).as("doc_id")
      case "text" => when(col("__r") === 0, col("text"))
        .otherwise(marked).as("text")
      case c => col(c)
    }
    docs.select(col("__r") +: outCols.toSeq: _*)
      .repartitionByRange(k, col("__r"), col("doc_id"))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    if (tables.contains("embeddings")) {
    // embeddings: vec_id shifted per replica; each replica's vectors
    // ROTATED by r positions. Rotation applies the same permutation
    // to every vector in the replica, so every intra-replica dot
    // product — hence every cosine, neighbor ranking, and duplicate
    // relation — is preserved exactly (same terms, reordered), while
    // cross-replica vectors decorrelate: the ANN corpus grows K×
    // without inflating the duplicate rate the way verbatim copies
    // would. Queries (vec_id < 20) stay replica-0-only, so query-side
    // work is constant and candidate work scales with bucket size.
    val emb = explodeReplicas(base("embeddings"))
    val e = col("embedding")
    // rotate by r MOD dim: a factor above the embedding dimension (64)
    // would otherwise drive slice() lengths non-positive and fail the
    // build with an opaque slice error.
    val r = (col("__r") % size(e)).cast("int")
    val rotated = when(r === 0, e)
      .otherwise(concat(slice(e, r + 1, size(e) - r), slice(e, lit(1), r)))
    // per-replica sign pattern on top of the rotation: s(r,i) ∈ {±1}
    // multiplies element i, so every INTRA-replica dot product — hence
    // every cosine, ranking, and duplicate relation — is preserved
    // exactly (Σ s_i² a_i b_i = Σ a_i b_i), while replicas r and r+dim
    // (same rotation, different signs) decorrelate — without this the
    // r % dim wrap would hand K > 64 curves bit-identical cross-replica
    // vectors and silently re-inflate the duplicate rate quadratically.
    // xxhash64(r, i) keyed by replica AND position (never the vector
    // values), murmur-finalized by construction — no linear-hash
    // collapse across nearby replicas.
    val signed = when(col("__r") === 0, e).otherwise(
      transform(rotated, (v, i) =>
        when(pmod(xxhash64(col("__r"), i), lit(2)) === 0, v).otherwise(-v)))
    val embCols = emb.columns.filter(_ != "__r").map {
      case "vec_id" => (col("vec_id") + col("__r") * DocOffset).as("vec_id")
      case "embedding" => signed.as("embedding")
      case c => col(c)
    }
    emb.select(col("__r") +: embCols.toSeq: _*)
      .repartitionByRange(k, col("__r"), col("vec_id"))
      .drop("__r")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
  }

  private def timeQuery(spark: SparkSession, name: String, dir: String,
      reps: Int): Double = {
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    try once() catch { case e: Throwable =>  // warmup
      System.err.println(s"[scale] warmup $name FAILED: ${e.getClass.getName}")
    }
    val walls = (1 to reps).map { i =>
      val w = try once() catch { case e: Throwable =>
        System.err.println(s"[scale] $name run$i FAILED: " +
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        -1.0
      }
      System.err.println(f"[scale] $name @$dir run$i ${w}%.3fs")
      w
    }.filter(_ >= 0)
    if (walls.isEmpty) -1.0 else walls.min
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale10")
    val maxGrowth = sys.env.getOrElse("SPARK_GRAFT_SCALE_MAX", "12.0").toDouble
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val tables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(AllTables)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The scaled dir is deterministic in (baseDir, k); a marker file
    // records the recipe so repeat runs skip the build. Round-16
    // ADVICE hazard closed: the header (base/k/v) and the table set
    // are compared SEPARATELY — a subset build into a dir whose
    // header matches only builds the missing tables (union recorded),
    // while a header MISMATCH rebuilds the requested tables and
    // DELETES every other table parquet in the dir, so a stale
    // wrong-recipe table can never be silently read (it fails loudly
    // as a missing path instead).
    // v4: + events replication (a v3 dir lacks events.parquet — reusing
    // it would re-break every event-time curve leg); table subset
    // appended only when narrowed.
    val marker = java.nio.file.Paths.get(outDir, "_SCALE_RECIPE")
    val header = s"base=$baseDir k=$k v=4"
    def writeMarker(recorded: Seq[String]): Unit = {
      val recipe = header + (if (recorded.sorted == AllTables.sorted) ""
        else s" tables=${recorded.sorted.mkString(",")}")
      java.nio.file.Files.createDirectories(marker.getParent)
      java.nio.file.Files.write(marker, recipe.getBytes("UTF-8"))
    }
    val prior: Option[(String, Seq[String])] =
      if (!java.nio.file.Files.exists(marker)) None
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(marker), "UTF-8")
        val (h, ts) = txt.indexOf(" tables=") match {
          case -1 => (txt, AllTables)
          case i => (txt.substring(0, i),
            txt.substring(i + " tables=".length).split(",").toSeq)
        }
        Some((h, ts))
      }
    prior match {
      case Some((h, recorded)) if h == header
          && tables.forall(recorded.contains) =>
        System.err.println(s"[scale] reusing ${k}x corpus at $outDir " +
          s"(tables: ${recorded.sorted.mkString(",")})")
      case Some((h, recorded)) if h == header =>
        val missing = tables.filterNot(recorded.contains)
        System.err.println(s"[scale] extending ${k}x corpus at $outDir " +
          s"with ${missing.mkString(",")}")
        val t0 = System.nanoTime()
        buildScaledDir(spark, baseDir, outDir, k, missing)
        writeMarker((recorded ++ missing).distinct)
        System.err.println(f"[scale] built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      case other =>
        other.foreach { case (h, _) => System.err.println(
          s"[scale] recipe changed ('$h' -> '$header'): rebuilding " +
            s"${tables.mkString(",")} and removing stale tables") }
        if (other.isEmpty)
          System.err.println(s"[scale] building ${k}x corpus at $outDir")
        val t0 = System.nanoTime()
        buildScaledDir(spark, baseDir, outDir, k, tables)
        // stale-recipe tables outside the rebuilt set: delete, so any
        // query needing them fails loudly instead of reading old data
        AllTables.filterNot(tables.contains).foreach { t =>
          val p = java.nio.file.Paths.get(outDir, s"$t.parquet")
          if (java.nio.file.Files.exists(p)) {
            System.err.println(s"[scale] removing stale $t.parquet")
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(p).iterator().asScala.toSeq
              .reverse.foreach(java.nio.file.Files.delete)
          }
        }
        writeMarker(tables)
        System.err.println(f"[scale] built in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    // COUNTS mode: instead of timing, report result-set cardinality at
    // 1× and K× — the direct silent-cap-saturation check (a capped or
    // quietly-dropping stage shows up as rows_k ≪ k·rows_1 long before
    // it shows in wall time).
    if (sys.env.get("SPARK_GRAFT_SCALE_COUNTS").contains("1")) {
      val counted = queries.map { name =>
        val fn = SparkEntry.queries(name)
        val r1 = fn(spark, baseDir).count()
        val rk = fn(spark, outDir).count()
        System.err.println(s"[scale] $name rows 1x=$r1 ${k}x=$rk " +
          f"ratio=${if (r1 > 0) rk.toDouble / r1 else -1.0}%.1f")
        s""""$name":{"rows1":$r1,"rowsK":$rk}"""
      }
      println(s"""{"metric":"scale_counts","factor":$k,""" +
        s""""queries":${counted.mkString("{", ",", "}")}}""")
      spark.stop()
      return
    }

    val rows = queries.map { name =>
      val t1 = timeQuery(spark, name, baseDir, reps)
      val tk = timeQuery(spark, name, outDir, reps)
      val growth = if (t1 > 0 && tk > 0) tk / t1 else -1.0
      System.err.println(f"[scale] $name 1x=${t1}%.3fs ${k}x=${tk}%.3fs growth=${growth}%.2f")
      (name, t1, tk, growth)
    }
    val growths = rows.map(_._4).filter(_ > 0)
    val maxG = if (growths.isEmpty) -1.0 else growths.max
    val pass = growths.nonEmpty && growths.size == rows.size && maxG <= maxGrowth
    val qs = rows.map { case (n, t1, tk, g) =>
      s""""$n":{"t1":${Bench.secStr(t1)},"tk":${Bench.secStr(tk)},"growth":${Bench.secStr(g)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_curve","factor":$k,"base":"$baseDir",""" +
      s""""queries":$qs,"max_growth":${Bench.secStr(maxG)},""" +
      s""""max_allowed":${Bench.secStr(maxGrowth)},"pass":$pass}""")
    spark.stop()
  }
}
