package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming k-per-group sampling with the SAME membership rule as the
  * batch sampler (`Sampling.kPerGroup`): keep the k smallest
  * `md5(salt ‖ key)` values per group. Because membership is a pure
  * function of the SET of keys seen — not of arrival order, batching,
  * or partitioning — the streaming sample CONVERGES to exactly what
  * one batch pass over the same rows would pick; the spec proves the
  * equality. That is the property `df.sample`-style RNG reservoirs
  * cannot offer a differential for.
  *
  * State per group is a bounded k-element membership (hash → key),
  * evicting the largest hash on overflow — O(k) per live group, the
  * mapGroupsWithState discipline of [[StreamDedup]]. Each micro-batch
  * emits ONE row per touched group carrying the group's CURRENT
  * members (update semantics: the latest row per group is the sample;
  * earlier emissions are superseded, never retracted row-by-row).
  *
  * Duplicate keys re-offered to the sampler are no-ops (same hash —
  * the monotone membership rule), so at-least-once delivery upstream
  * cannot distort inclusion.
  */
object StreamSample {

  /** One emitted row: the group and its current sample membership
    * (keys ordered by hash — the selection order, truncation-stable
    * like the batch rule). */
  final case class GroupSample(group: String, members: Seq[String])

  def kPerGroupStream(
      grouped: KeyValueGroupedDataset[String, (String, String)],
      k: Int, salt: String = ""): Dataset[GroupSample] = {
    require(k >= 1, s"k must be positive, got $k")
    implicit val stateEnc: Encoder[Map[String, String]] =
      Encoders.kryo[Map[String, String]]
    implicit val outEnc: Encoder[GroupSample] =
      Encoders.product[GroupSample]
    def hash(key: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + key).getBytes("UTF-8"))
      d.map(b => f"${b & 0xff}%02x").mkString
    }
    grouped.mapGroupsWithState[Map[String, String], GroupSample](
      GroupStateTimeout.NoTimeout()) {
      (group: String, rows: Iterator[(String, String)],
          state: GroupState[Map[String, String]]) =>
        var members = state.getOption.getOrElse(Map.empty) // hash → key
        rows.foreach { case (_, key) =>
          val h = hash(key)
          if (!members.contains(h)) {
            members += (h -> key)
            if (members.size > k) members -= members.keysIterator.max
          }
        }
        state.update(members)
        GroupSample(group, members.toSeq.sortBy(_._1).map(_._2))
    }
  }
}
