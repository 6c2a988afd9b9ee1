package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState}

/** [EXT]/T5 — streaming SCD2 maintenance: the incremental counterpart
  * of `Cdc.scd2History`. Each key's current (state, eff_from, version)
  * lives in the streaming state store; an arriving event that CHANGES
  * the state closes the open interval (emitting it with its eff_to)
  * and opens a new one. Every batch also (re-)emits the key's open
  * interval with eff_to = None, so a downstream upsert sink keyed on
  * (key, version) always converges to exactly the batch operator's
  * output.
  *
  * Ordering: per-key arrival order must respect event order — the
  * Kafka guarantee when the key is the partition key (P13); within a
  * micro-batch the group iterator is sorted by (ts, tieBreak) before
  * folding, so intra-batch disorder is repaired for free. At scale the
  * key is the shuffle key and per-key state is one small case class in
  * the RocksDB-backed store.
  *
  * Bounded state: at 100 TB key cardinality, one state row per
  * ever-seen key grows without bound. `idleTimeoutMs` turns on
  * event-time eviction: a key idle past the timeout (watermark passes
  * its last event + idleTimeoutMs) has its state REMOVED, emitting
  * nothing — the key's open interval (eff_to = None) was already
  * upserted downstream, which is exactly what the batch operator says
  * for a key with no further events, so histories of evicted keys
  * that never return stay converged. The documented trade: a key that
  * RETURNS after eviction restarts at version 1 (the store no longer
  * knows its past) — size the timeout above any plausible revival
  * gap. Requires a watermark on the input stream.
  */
object StreamCdc {

  /** One SCD2 interval: eff_to None = still open. */
  final case class ScdRow(key: Long, version: Long, state: String,
      eff_from: Long, eff_to: Option[Long])

  /** Open-interval state carried between micro-batches. `last_ts`
    * drives idle-timeout eviction (same-state events refresh it
    * without touching eff_from). */
  final case class ScdOpen(state: String, eff_from: Long, version: Long,
      last_ts: Long)

  /** events: (ts, tieBreak, state) grouped by key. Emits closed
    * intervals as they close, plus the current open interval per key
    * touched in the batch (update-mode upsert semantics on
    * (key, version)).
    *
    * @param idleTimeoutMs event-time idle eviction window; None (the
    *        default) keeps state forever (NoTimeout)
    */
  def scd2Updates(grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      Long, (Long, Long, String)],
      idleTimeoutMs: Option[Long] = None): Dataset[ScdRow] =
    scd2UpdatesFrom(grouped, identity[(Long, Long, String)], idleTimeoutMs)

  /** Value-shape-generic form: `extract` pulls (ts, tieBreak, state)
    * out of each grouped value. Needed for idle-timeout queries —
    * Spark requires the watermarked event-time column to SURVIVE into
    * the stateful operator's child plan, and a `mapValues` that
    * projects it away (as the tuple-3 convenience shape does) fails
    * analysis; group the watermarked row type directly and extract
    * here instead. */
  def scd2UpdatesFrom[V](grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      Long, V], extract: V => (Long, Long, String),
      idleTimeoutMs: Option[Long] = None): Dataset[ScdRow] = {
    implicit val stateEnc = Encoders.product[ScdOpen]
    implicit val rowEnc = Encoders.product[ScdRow]
    val timeoutConf = idleTimeoutMs match {
      case Some(ms) =>
        require(ms > 0, s"idleTimeoutMs must be positive, got $ms")
        GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    grouped.flatMapGroupsWithState[ScdOpen, ScdRow](
      org.apache.spark.sql.streaming.OutputMode.Update(), timeoutConf) {
      (key: Long, rawValues: Iterator[V], gs: GroupState[ScdOpen]) =>
        if (gs.hasTimedOut) {
          // idle past the window: evict. The open interval was already
          // emitted (eff_to = None) the last time this key was touched,
          // so downstream history is final-as-of-now without a new row.
          gs.remove()
          Iterator.empty
        } else {
          val sorted = rawValues.map(extract).toVector.sortBy(v => (v._1, v._2))
          val out = Vector.newBuilder[ScdRow]
          var open = gs.getOption
          sorted.foreach { case (ts, _, state) =>
            open match {
              case None =>
                open = Some(ScdOpen(state, ts, 1L, ts))
              case Some(o) if o.state != state =>
                out += ScdRow(key, o.version, o.state, o.eff_from, Some(ts))
                open = Some(ScdOpen(state, ts, o.version + 1, ts))
              case Some(o) => // same-state run: collapse, refresh idle clock
                open = Some(o.copy(last_ts = math.max(o.last_ts, ts)))
            }
          }
          open.foreach { o =>
            gs.update(o)
            idleTimeoutMs.foreach { ms =>
              // the deadline must sit ahead of the current watermark or
              // Spark rejects it — a key whose last event is already
              // far behind the watermark gets the minimum legal grace
              gs.setTimeoutTimestamp(
                math.max(o.last_ts + ms, gs.getCurrentWatermarkMs() + 1))
            }
            out += ScdRow(key, o.version, o.state, o.eff_from, None)
          }
          out.result().iterator
        }
    }
  }
}
