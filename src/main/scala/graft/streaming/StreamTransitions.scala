package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming first-order transitions: the incremental counterpart of
  * `Paths.transitions` — each arriving event pairs with its user's
  * most recent prior event, across batch boundaries, holding exactly
  * ONE row of state per user (the last-seen event). Downstream
  * counting/normalizing is an ordinary streaming aggregation over the
  * emitted pairs.
  *
  * Ordering contract: within a trigger the group's events are sorted
  * by (ts, tie); ACROSS triggers arrival order must respect event
  * order (the append-log contract shared with [[StreamCdc]] — a
  * replayed or late batch would pair against a newer last-seen).
  *
  * State boundedness: one `LastSeen` per user forever under
  * `NoTimeout`; pass `idleTimeoutMs` to evict idle users via
  * EventTimeTimeout — an evicted user's next event starts a fresh
  * chain and emits NO pair (exactly the batch semantics for a user
  * whose history was dropped). The watermarked column must survive
  * into the grouped child plan (the StreamCdc trap) — group the
  * watermarked row type and extract inside.
  */
object StreamTransitions {

  /** Emitted pair: one row per (prev → next) step of `user`. */
  final case class Transition(user: Long, prev: String, next: String,
      ts: Long)

  /** Cross-batch state: the user's most recent event. (Public:
    * Catalyst's state encoder generates constructor calls.) */
  final case class LastSeen(ts: Long, tie: Long, typ: String)

  /** @param extractTs  event time in the same unit as `tsUnitPerMs`
    * @param extractTie unique tie-break for equal timestamps
    * @param tsUnitPerMs event-time units per millisecond (1 for ms,
    *        1e6 for ns) — only consulted for eviction arithmetic
    */
  def transitionsFrom[V](grouped: KeyValueGroupedDataset[Long, V],
      extractTs: V => Long, extractTie: V => Long,
      extractType: V => String,
      idleTimeoutMs: Option[Long] = None,
      tsUnitPerMs: Long = 1L): Dataset[Transition] = {
    require(tsUnitPerMs > 0, s"tsUnitPerMs must be positive, got $tsUnitPerMs")
    implicit val stateEnc = Encoders.product[LastSeen]
    implicit val rowEnc = Encoders.product[Transition]
    val timeoutConf = idleTimeoutMs match {
      case Some(ms) =>
        require(ms > 0, s"idleTimeoutMs must be positive, got $ms")
        GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    grouped.flatMapGroupsWithState[LastSeen, Transition](
      org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
      (user: Long, values: Iterator[V], gs: GroupState[LastSeen]) =>
        if (gs.hasTimedOut) {
          gs.remove()
          Iterator.empty
        } else {
          // per-trigger, per-key volume bounds this sort — never a
          // corpus-scale collect
          val sorted = values.toSeq
            .sortBy(v => (extractTs(v), extractTie(v)))
          val out = Seq.newBuilder[Transition]
          var st = gs.getOption
          sorted.foreach { v =>
            st.foreach(p =>
              out += Transition(user, p.typ, extractType(v), extractTs(v)))
            st = Some(LastSeen(extractTs(v), extractTie(v), extractType(v)))
          }
          st.foreach { s =>
            gs.update(s)
            idleTimeoutMs.foreach { ms =>
              gs.setTimeoutTimestamp(math.max(s.ts / tsUnitPerMs + ms,
                gs.getCurrentWatermarkMs() + 1))
            }
          }
          out.result().iterator
        }
    }
  }

  /** Tuple convenience shape: (user, ts, tie, type) grouped by user. */
  def transitions(grouped: KeyValueGroupedDataset[Long,
      (Long, Long, Long, String)]): Dataset[Transition] =
    transitionsFrom[(Long, Long, Long, String)](grouped, _._2, _._3, _._4)
}
