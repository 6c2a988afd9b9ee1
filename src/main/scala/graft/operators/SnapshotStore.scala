package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Versioned parquet snapshot table — the materialization target when
  * there is no JDBC/Delta store: each commit merges a keyed batch into
  * the current snapshot and writes a new immutable version directory,
  * then flips a pointer file. Readers only ever see a committed
  * version; a crashed commit leaves the pointer (and therefore the
  * table) on the previous version. Old versions remain for time
  * travel until vacuumed.
  *
  * This is the copy-on-write pattern (same family as Delta/Iceberg
  * without the manifest layer); at 100 TB the merge is one keyed
  * shuffle and the write is partition-parallel.
  */
class SnapshotStore(spark: SparkSession, root: String,
    keyCols: Seq[String]) {

  private val pointer = Paths.get(root, "_LATEST")

  def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong)
    else None

  private def versionDir(v: Long): String = s"$root/v=$v"

  /** Latest committed snapshot; empty when uninitialized. */
  def read(): Option[DataFrame] =
    currentVersion.map(v => spark.read.parquet(versionDir(v)))

  /** Snapshot as of a specific committed version (time travel). */
  def readVersion(v: Long): DataFrame = spark.read.parquet(versionDir(v))

  /** Merge a keyed batch (last-wins on orderCol, tombstone deletes)
    * into the snapshot and commit a new version. First commit
    * bootstraps from the batch alone. Returns the new version. */
  def commit(batch: DataFrame, orderCol: Column, tombstone: Column): Long = {
    val next = currentVersion.map(_ + 1).getOrElse(0L)
    val merged = read() match {
      case Some(current) =>
        Materialize.mergeSnapshot(current, batch, keyCols, orderCol, tombstone)
      case None =>
        Materialize.applyEvents(batch, keyCols, orderCol, tombstone)
          .drop("__graft_rn")
    }
    merged.write.mode("overwrite").parquet(versionDir(next))
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_LATEST.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Drop version directories older than `keep` versions back. */
  def vacuum(keep: Int = 1): Unit = currentVersion.foreach { v =>
    val cutoff = v - keep
    (0L to cutoff).foreach { old =>
      val d = Paths.get(versionDir(old))
      if (Files.exists(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }
  }
}
