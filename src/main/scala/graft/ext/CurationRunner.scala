package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] The DEPLOYMENT shape of incremental curation: a versioned
  * survivor store updated once per micro-batch through
  * [[Dedup.curateIncrementCapped]] — "each crawl increment screens
  * against the current corpus, merges, re-elects, and the survivor
  * table rolls forward".
  *
  * Store layout under `dir`:
  *  - `v<N>/` — one immutable parquet snapshot per applied increment
  *    (schema: idCol, hashCol, qualityCol, n_copies);
  *  - `overflow_v<N>/` — that increment's drop-and-report frame;
  *  - `_CURRENT` — tiny pointer file `"<N> <batchId>"`, replaced with
  *    an ATOMIC move. Readers resolve `_CURRENT` then read an
  *    immutable snapshot, so a concurrent reader never sees a
  *    half-written table; the previous snapshot stays valid until the
  *    pointer flips.
  *
  * Exactly-once under at-least-once `foreachBatch` (the T1 merge
  * discipline applied to curation): the pointer records the LAST
  * APPLIED batchId, and a redelivered micro-batch (same batchId —
  * Spark replays the same id after a crash between sink success and
  * checkpoint commit) is SKIPPED, so a replayed increment can neither
  * double-count n_copies nor re-drop documents. Out-of-order ids
  * (batchId < last applied) are likewise ignored.
  *
  * 100 TB shape: the store holds only (id, 64-bit hash, quality,
  * count) — ~32 B per surviving doc; each increment reads ONE
  * snapshot and the batch, runs the capped screens (never quadratic
  * in a hot hash), and writes one snapshot. Snapshot GC is left to
  * the deployment's retention job (old versions are what make
  * time-travel reads and crash recovery trivial).
  */
object CurationRunner {

  final case class Pointer(version: Long, batchId: Long)

  private def pointerPath(dir: String) = Paths.get(dir, "_CURRENT")

  /** The current pointer, or None for an empty store. */
  def current(dir: String): Option[Pointer] = {
    val p = pointerPath(dir)
    if (!Files.exists(p)) None
    else {
      val parts = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\\s+")
      Some(Pointer(parts(0).toLong, parts(1).toLong))
    }
  }

  /** The current survivor table. On an EMPTY store this read helper
    * returns an all-LongType empty frame (it has no batch to borrow
    * types from — [[applyIncrement]]'s bootstrap does); callers that
    * need exact types on an empty store should supply their own empty
    * frame. */
  def survivors(spark: SparkSession, dir: String, idCol: String,
      hashCol: String, qualityCol: String): DataFrame = current(dir) match {
    case Some(ptr) => spark.read.parquet(s"$dir/v${ptr.version}")
    case None => emptySurvivors(spark, idCol, hashCol, qualityCol)
  }

  private def emptySurvivors(spark: SparkSession, idCol: String,
      hashCol: String, qualityCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(idCol, LongType), StructField(hashCol, LongType),
        StructField(qualityCol, LongType), StructField("n_copies", LongType))))
  }

  /** Apply one increment; returns true when applied, false when the
    * batchId was already applied (idempotent replay skip). */
  def applyIncrement(dir: String, batch: DataFrame, batchId: Long,
      idCol: String, hashCol: String, qualityCol: String,
      maxHamming: Int = 3,
      maxBucket: Option[Int] = Some(1 << 12)): Boolean = {
    val spark = batch.sparkSession
    val cur = current(dir)
    if (cur.exists(_.batchId >= batchId)) return false
    val surv = cur match {
      case Some(ptr) => spark.read.parquet(s"$dir/v${ptr.version}")
      // bootstrap: empty survivors with the BATCH's exact column types
      // (a LongType assumption would break an int quality column)
      case None => batch.select(col(idCol), col(hashCol), col(qualityCol))
        .limit(0).withColumn("n_copies", lit(0L))
    }
    val next = cur.map(_.version + 1).getOrElse(0L)
    val (out, overflow) = Dedup.curateIncrementCapped(surv, batch,
      idCol, hashCol, qualityCol, maxHamming = maxHamming,
      maxBucket = maxBucket)
    out.write.mode("overwrite").parquet(s"$dir/v$next")
    overflow.write.mode("overwrite").parquet(s"$dir/overflow_v$next")
    // write-then-atomic-move: a crash before the move leaves the old
    // pointer (and the old snapshot) fully intact; the replayed batch
    // simply re-applies onto the old version
    val tmp = Paths.get(dir, s"_CURRENT.tmp$next")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, s"$next $batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    true
  }

  /** Retention: delete snapshot (and overflow) directories older than
    * the `keep` most recent versions. The CURRENT version is never
    * deleted regardless of `keep`; the pointer is untouched, so a
    * concurrent reader that already resolved `_CURRENT` keeps a valid
    * snapshot. Returns the pruned version numbers. */
  def prune(dir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1: $keep")
    current(dir) match {
      case None => Seq.empty
      case Some(ptr) =>
        val cutoff = ptr.version - keep + 1
        val pruned = (0L until cutoff).filter(v =>
          Files.exists(Paths.get(dir, s"v$v")))
        pruned.foreach { v =>
          for (name <- Seq(s"v$v", s"overflow_v$v")) {
            val root = Paths.get(dir, name)
            if (Files.exists(root)) {
              val walk = Files.walk(root)
              try walk.sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.delete(p))
              finally walk.close()
            }
          }
        }
        pruned
    }
  }

  /** `foreachBatch` sink maintaining the store:
    * {{{
    * stream.writeStream.foreachBatch(
    *   CurationRunner.sink(dir, "doc_id", "ph", "quality")).start()
    * }}} */
  def sink(dir: String, idCol: String, hashCol: String, qualityCol: String,
      maxHamming: Int = 3, maxBucket: Option[Int] = Some(1 << 12)):
      (DataFrame, Long) => Unit = (batch, batchId) => {
    applyIncrement(dir, batch, batchId, idCol, hashCol, qualityCol,
      maxHamming, maxBucket)
    ()
  }
}
