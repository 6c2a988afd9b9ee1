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
  * State per group is a bounded k-element membership (hash → key)
  * plus an update counter, evicting the largest hash on overflow —
  * O(k) per live group, the mapGroupsWithState discipline of
  * [[StreamDedup]]. Each micro-batch emits ONE row per touched group
  * carrying the group's CURRENT members and a monotone `version`
  * (update semantics: the max-version row per group is the sample;
  * earlier emissions are superseded, never retracted row-by-row).
  *
  * Membership is over the key SET: duplicate keys re-offered to the
  * sampler are no-ops (same hash), so at-least-once delivery cannot
  * distort inclusion. That is also the one divergence from the batch
  * sibling, which samples ROWS (duplicate keys fill multiple ranks) —
  * the streaming ≡ batch equivalence holds for inputs whose keys are
  * unique per group, or against `kPerGroup` over DISTINCT keys.
  *
  * Restarting a checkpoint with a SMALLER k trims restored state down
  * to the new bound before processing (the emitted sample never
  * exceeds the configured k).
  */
object StreamSample {

  /** One emitted row: the group, its current sample membership (keys
    * ordered by hash — the selection order, truncation-stable like
    * the batch rule), and a per-group monotone version. */
  final case class GroupSample(group: String, members: Seq[String],
      version: Long)

  def kPerGroupStream(
      grouped: KeyValueGroupedDataset[String, (String, String)],
      k: Int, salt: String = ""): Dataset[GroupSample] = {
    require(k >= 1, s"k must be positive, got $k")
    implicit val stateEnc: Encoder[(Long, Map[String, String])] =
      Encoders.kryo[(Long, Map[String, String])]
    implicit val outEnc: Encoder[GroupSample] =
      Encoders.product[GroupSample]
    grouped.mapGroupsWithState[(Long, Map[String, String]), GroupSample](
      GroupStateTimeout.NoTimeout()) {
      (group: String, rows: Iterator[(String, String)],
          state: GroupState[(Long, Map[String, String])]) =>
        val (version, restored) =
          state.getOption.getOrElse((0L, Map.empty[String, String]))
        val members = foldMembers(restored, rows.map(_._2), k, salt)
        state.update((version + 1, members))
        GroupSample(group, members.toSeq.sortBy(_._1).map(_._2),
          version + 1)
    }
  }

  /** One invocation's membership fold, pure so the restart paths
    * (oversized restored state after a k shrink, duplicate-key
    * no-ops) are unit-testable — a MemoryStream harness cannot
    * recover a checkpoint to exercise them end-to-end. */
  private[streaming] def foldMembers(restored: Map[String, String],
      keys: Iterator[String], k: Int, salt: String): Map[String, String] = {
    // one digest per invocation — digest() resets it; a per-row
    // getInstance + format() would dominate the hot path
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash(key: String): String = {
      val d = md.digest((salt + key).getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(32)
      d.foreach { b =>
        sb.append(Character.forDigit((b >> 4) & 0xf, 16))
        sb.append(Character.forDigit(b & 0xf, 16))
      }
      sb.toString
    }
    var members = restored // hash → key
    // a checkpoint restarted with a smaller k restores > k members
    while (members.size > k) members -= members.keysIterator.max
    keys.foreach { key =>
      val h = hash(key)
      if (!members.contains(h)) {
        members += (h -> key)
        if (members.size > k) members -= members.keysIterator.max
      }
    }
    members
  }
}
