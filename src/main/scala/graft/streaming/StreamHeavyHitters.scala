package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [EXT]/T5 — streaming frequent items: an incrementally-maintained
  * Misra-Gries summary per group, the unbounded-stream counterpart of
  * [[graft.functions.MisraGriesAgg]] / `Scale.heavyHittersExact`.
  *
  * Each group's state is O(capacity) — `capacity` (item, counter)
  * pairs plus the exact stream length — however long the stream runs:
  * the state store never grows with item cardinality, which is the
  * whole point at crawl scale (per-domain trending URLs, per-topic hot
  * keys). The MG invariant holds incrementally: after ANY prefix of
  * the stream, every item whose frequency in that prefix exceeds
  * `n/(capacity+1)` is present in the summary, and each surviving
  * counter undercounts its item's true frequency by at most
  * `n/(capacity+1)`.
  *
  * Batch-parity contract: which BELOW-threshold items also survive
  * (and the exact residual counters) depends on arrival order — same
  * caveat as the batch aggregate, whose merge order is partition-
  * dependent. Exactness, when needed, is restored the same way: treat
  * the emitted items as candidates and re-count them exactly over the
  * retained raw stream.
  */
object StreamHeavyHitters {

  /** One emitted summary row: the group, a surviving item with its
    * lower-bound counter, and the group's exact stream length. */
  final case class HitRow(group: String, item: String, count_lb: Long,
      n_total: Long)

  /** O(capacity) per-group summary state. PUBLIC: Catalyst's encoder
    * codegen cannot reach a private case class's accessors (the
    * StreamCdc/StreamDecay trap — fails at RUNTIME, not compile). */
  final case class MgState(n: Long, items: Map[String, Long])

  /** @param grouped item stream grouped by a STRING group key (values
    *                are the items); each micro-batch folds into the
    *                group's summary and re-emits the full current
    *                summary (update-mode upsert on (group, item) —
    *                delete downstream rows absent from the newest
    *                emission, or filter by n_total)
    */
  def misraGries(grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      String, (String, String)], capacity: Int): Dataset[HitRow] = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    implicit val stateEnc = Encoders.product[MgState]
    implicit val rowEnc = Encoders.product[HitRow]
    grouped.flatMapGroupsWithState[MgState, HitRow](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (key: String, values: Iterator[(String, String)],
          gs: GroupState[MgState]) =>
        var n = gs.getOption.map(_.n).getOrElse(0L)
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        gs.getOption.foreach(_.items.foreach { case (k, v) => m(k) = v })
        values.foreach { case (_, item) =>
          n += 1
          m.get(item) match {
            case Some(c) => m(item) = c + 1
            case None if m.size < capacity => m(item) = 1L
            case None =>
              // decrement-all step: every counter drops by one; zeros
              // evict. The arriving item is NOT inserted (classic MG).
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              m.keysIterator.foreach { k =>
                val c = m(k) - 1
                if (c == 0L) dead += k else m(k) = c
              }
              dead.foreach(m.remove)
          }
        }
        gs.update(MgState(n, m.toMap))
        m.toSeq.sortBy(_._1).iterator
          .map { case (item, c) => HitRow(key, item, c, n) }
    }
  }
}
