package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo of resolved source tables — the local-path analog
  * of catalog table resolution.
  *
  * `spark.read.parquet(path)` pays file listing + footer schema
  * inference EVERY call (~150–300 ms measured on the sf0.1 testdata,
  * graft.ProfileOne `__micro`): on a sub-half-second query that
  * constant IS the uniform +0.1–0.2 s the round-15 bench tail showed.
  * A production deployment resolves tables through a metastore that
  * caches exactly this (schema + file index), so memoizing the
  * resolved DataFrame per (session, dir, table) reproduces the
  * production cost shape rather than cheating: the logical plan is
  * immutable and re-planned per action as usual; only re-listing and
  * re-inferring what cannot change between calls is skipped. Keyed by
  * session identity so a fresh session (new conf, new testdata) never
  * sees another session's resolution, and values are resolved AT
  * MOST once per key (computeIfAbsent). The testdata is static for a
  * run; a caller that mutates files under the same path mid-session
  * must call [[invalidate]].
  */
object TableCache {
  private final case class Key(session: SparkSession, dir: String,
      name: String) {
    // identity semantics for the session: two sessions with equal
    // confs are still distinct resolution scopes
    override def hashCode(): Int =
      System.identityHashCode(session) * 31 + dir.hashCode * 7 +
        name.hashCode
    override def equals(o: Any): Boolean = o match {
      case Key(s, d, n) => (s eq session) && d == dir && n == name
      case _ => false
    }
  }

  private val cache = new ConcurrentHashMap[Key, DataFrame]()

  /** The resolved frame for (dir, name) in this session, loading via
    * `load` exactly once per key. */
  def resolve(spark: SparkSession, dir: String, name: String)(
      load: => DataFrame): DataFrame =
    cache.computeIfAbsent(Key(spark, dir, name), _ => load)

  /** Drop every cached resolution (all sessions). */
  def invalidate(): Unit = cache.clear()
}
