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
  */
object StreamCdc {

  /** One SCD2 interval: eff_to None = still open. */
  final case class ScdRow(key: Long, version: Long, state: String,
      eff_from: Long, eff_to: Option[Long])

  /** Open-interval state carried between micro-batches. */
  final case class ScdOpen(state: String, eff_from: Long, version: Long)

  /** events: (ts, tieBreak, state) grouped by key. Emits closed
    * intervals as they close, plus the current open interval per key
    * touched in the batch (update-mode upsert semantics on
    * (key, version)). */
  def scd2Updates(grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      Long, (Long, Long, String)]): Dataset[ScdRow] = {
    implicit val stateEnc = Encoders.product[ScdOpen]
    implicit val rowEnc = Encoders.product[ScdRow]
    grouped.flatMapGroupsWithState[ScdOpen, ScdRow](
      org.apache.spark.sql.streaming.OutputMode.Update(),
      GroupStateTimeout.NoTimeout()) {
      (key: Long, values: Iterator[(Long, Long, String)],
          gs: GroupState[ScdOpen]) =>
        val sorted = values.toVector.sortBy(v => (v._1, v._2))
        val out = Vector.newBuilder[ScdRow]
        var open = gs.getOption
        sorted.foreach { case (ts, _, state) =>
          open match {
            case None =>
              open = Some(ScdOpen(state, ts, 1L))
            case Some(o) if o.state != state =>
              out += ScdRow(key, o.version, o.state, o.eff_from, Some(ts))
              open = Some(ScdOpen(state, ts, o.version + 1))
            case Some(_) => () // same-state run: collapse
          }
        }
        open.foreach { o =>
          gs.update(o)
          out += ScdRow(key, o.version, o.state, o.eff_from, None)
        }
        out.result().iterator
    }
  }
}
