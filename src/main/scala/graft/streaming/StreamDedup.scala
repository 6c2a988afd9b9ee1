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

  /** Watermark-TTL'd streaming dedup over key columns: duplicate rows
    * arriving within the watermark horizon are dropped and state for
    * old keys is evicted automatically — the bounded-state variant for
    * unbounded streams (Spark's dropDuplicatesWithinWatermark). */
  def withinWatermark(df: org.apache.spark.sql.DataFrame, tsCol: String,
      watermark: String, keyCols: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
