package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** [EXT]/T5 — streaming recency-decayed activity counters: the live
  * counterpart of [[graft.operators.Decay]]. Per key the state store
  * carries `(t_ref, score, n)` with
  * `score = Σ exp((ts_i - t_ref) / tau)` and `t_ref` the max event
  * time seen — every micro-batch re-emits the key's updated counter,
  * so a downstream upsert sink always holds each key's current
  * decayed engagement.
  *
  * ORDER-INSENSITIVE by construction: the represented sum is
  * reference-shifted, never truncated, so a LATE event just adds
  * `exp((ts - t_ref)/tau) < 1` while a newer event rescales the
  * accumulated sum once (`exp(a+b) = exp(a)·exp(b)`) — no per-key
  * sorting, no reliance on arrival order across batches. Floating
  * error vs the batch operator is a few ulps of reassociation, the
  * same noise any distributed sum carries.
  *
  * Bounded state: 16 bytes + a long per key; at 100 TB key
  * cardinality `idleTimeoutMs` turns on event-time eviction (same
  * discipline as [[StreamCdc]]): a key idle past the timeout is
  * REMOVED, emitting nothing — its last emitted counter remains
  * correct downstream forever under its own `t_ref` (scores are
  * reference-relative; a consumer comparing keys at wall-clock T
  * rescales by `exp((t_ref - T)/tau)`, which only needs the emitted
  * row). A key that returns after eviction restarts from zero — size
  * the timeout so a revived key's forgotten contribution
  * (`≤ n · exp(-timeout/tau)`) is below reporting precision.
  * Requires a watermark on the input stream.
  */
object StreamDecay {

  /** Emitted counter: score is relative to the key's own t_ref. */
  final case class DecayRow(key: Long, n_events: Long, t_ref: Long,
      score: Double)

  /** Cross-batch state: the running reference-shifted sum. (Public:
    * Catalyst's state encoder generates constructor calls.) */
  final case class DecayState(t_ref: Long, score: Double, n: Long)

  /** events grouped by key; `extract` pulls the event time (in the
    * same unit as `tau`) out of each value. Use the value-generic form
    * for idle-timeout queries — Spark requires the watermarked column
    * to survive into the stateful operator's child plan, so group the
    * watermarked row type and extract here (the [[StreamCdc]] trap).
    *
    * @param tau decay constant in the event-time unit
    * @param tsUnitPerMs event-time units per millisecond (1 for ms
    *        timestamps, 1e6 for ns) — only consulted for eviction
    *        deadline arithmetic
    */
  def decayedCountsFrom[V](grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      Long, V], extract: V => Long, tau: Double,
      idleTimeoutMs: Option[Long] = None,
      tsUnitPerMs: Long = 1L): Dataset[DecayRow] = {
    require(tau > 0, s"tau must be positive, got $tau")
    require(tsUnitPerMs > 0, s"tsUnitPerMs must be positive, got $tsUnitPerMs")
    implicit val stateEnc = Encoders.product[DecayState]
    implicit val rowEnc = Encoders.product[DecayRow]
    val timeoutConf = idleTimeoutMs match {
      case Some(ms) =>
        require(ms > 0, s"idleTimeoutMs must be positive, got $ms")
        GroupStateTimeout.EventTimeTimeout()
      case None => GroupStateTimeout.NoTimeout()
    }
    grouped.flatMapGroupsWithState[DecayState, DecayRow](
      org.apache.spark.sql.streaming.OutputMode.Update(), timeoutConf) {
      (key: Long, values: Iterator[V], gs: GroupState[DecayState]) =>
        if (gs.hasTimedOut) {
          gs.remove()
          Iterator.empty
        } else {
          var s = gs.getOption.getOrElse(DecayState(Long.MinValue, 0.0, 0L))
          values.map(extract).foreach { ts =>
            s = if (s.n == 0L) DecayState(ts, 1.0, 1L)
            else if (ts > s.t_ref)
              DecayState(ts,
                s.score * math.exp((s.t_ref - ts).toDouble / tau) + 1.0,
                s.n + 1L)
            else
              s.copy(score =
                s.score + math.exp((ts - s.t_ref).toDouble / tau),
                n = s.n + 1L)
          }
          gs.update(s)
          idleTimeoutMs.foreach { ms =>
            gs.setTimeoutTimestamp(math.max(s.t_ref / tsUnitPerMs + ms,
              gs.getCurrentWatermarkMs() + 1))
          }
          Iterator.single(DecayRow(key, s.n, s.t_ref, s.score))
        }
    }
  }

  /** Tuple convenience shape: (key, ts) pairs grouped by key. */
  def decayedCounts(grouped: org.apache.spark.sql.KeyValueGroupedDataset[
      Long, (Long, Long)], tau: Double): Dataset[DecayRow] =
    decayedCountsFrom[(Long, Long)](grouped, _._2, tau)
}
