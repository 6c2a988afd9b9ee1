package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT]/T5 — custom keyed state in Structured Streaming:
  * first-seen streaming dedup via mapGroupsWithState. At scale the
  * state store is per-key RocksDB-backed; the fingerprint key is the
  * shuffle key, so dedup state never concentrates.
  */
object StreamDedup {

  /** Emit only the first occurrence of each key; later occurrences are
    * dropped. State is one boolean per key (plus optional TTL via
    * processing-time timeout at deployment).
    */
  def firstSeen[K, V](grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V])(
      implicit e: Encoder[Option[V]], ev: Encoder[V]): Dataset[V] = {
    implicit val boolEnc: Encoder[Boolean] =
      org.apache.spark.sql.Encoders.scalaBoolean
    grouped.mapGroupsWithState[Boolean, Option[V]](
      GroupStateTimeout.NoTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[Boolean]) =>
        if (state.exists) None
        else {
          state.update(true)
          values.nextOption()
        }
    }.flatMap(_.iterator)(ev)
  }

  /** Bounded-state first-seen dedup: like [[firstSeen]], but a key idle
    * past `idleTimeoutMs` of event time (watermark passes its last
    * occurrence + timeout) has its state REMOVED. At 100 TB key
    * cardinality one state row per ever-seen fingerprint grows without
    * bound — this is the eviction knob, same design as
    * [[StreamCdc.scd2UpdatesFrom]]. The documented trade: a duplicate
    * arriving AFTER its key was evicted re-emits (the store no longer
    * remembers it) — size the timeout above the plausible duplicate
    * horizon, exactly the contract of dropDuplicatesWithinWatermark.
    *
    * Requires a watermark on the input stream, and the watermarked
    * event-time column must survive into the grouped values (group the
    * watermarked row type; `tsOf` extracts event time here). Within a
    * batch the earliest (by `tsOf`) occurrence is the one emitted, so
    * intra-batch disorder picks a deterministic representative.
    */
  def firstSeenTtl[K, V](grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V],
      tsOf: V => Long, idleTimeoutMs: Long)(
      implicit e: Encoder[Option[V]], ev: Encoder[V]): Dataset[V] = {
    require(idleTimeoutMs > 0, s"idleTimeoutMs must be positive, got $idleTimeoutMs")
    implicit val lastTsEnc: Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    grouped.mapGroupsWithState[Long, Option[V]](
      GroupStateTimeout.EventTimeTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove()
          None
        } else {
          val vs = values.toVector
          val maxTs = vs.iterator.map(tsOf).max
          val out = if (state.exists) None
            else Some(vs.minBy(tsOf))
          val last = math.max(state.getOption.getOrElse(Long.MinValue), maxTs)
          state.update(last)
          // deadline must sit ahead of the current watermark or Spark
          // rejects it (same clamp as StreamCdc)
          state.setTimeoutTimestamp(
            math.max(last + idleTimeoutMs, state.getCurrentWatermarkMs() + 1))
          out
        }
    }.flatMap(_.iterator)(ev)
  }

  /** Watermark-TTL'd streaming dedup over key columns: duplicate rows
    * arriving within the watermark horizon are dropped and state for
    * old keys is evicted automatically — the bounded-state variant for
    * unbounded streams (Spark's dropDuplicatesWithinWatermark). */
  def withinWatermark(df: org.apache.spark.sql.DataFrame, tsCol: String,
      watermark: String, keyCols: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
