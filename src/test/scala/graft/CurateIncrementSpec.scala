package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** `Dedup.curateIncrement` semantics on hand-built hashes: weight
  * accumulation, batch-bridged survivor merges, ungrouped
  * pass-through, and batch-only groups. Hamming geometry used
  * throughout: H1 = 0, H3 = 0x7 (hamming 3 from H1), H2 = 0x3F
  * (hamming 6 from H1 — NOT pairable; hamming 3 from H3 — pairable),
  * so H3 bridges H1 and H2. */
class CurateIncrementSpec extends SparkSpec {
  import spark.implicits._

  private val (h1, h2, h3) = (0L, 0x3FL, 0x7L)

  private def run(surv: Seq[(Long, Long, Long, Long)],
      batch: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.curateIncrement(
        surv.toDF("doc_id", "ph", "quality", "n_copies"),
        batch.toDF("doc_id", "ph", "quality"),
        "doc_id", "ph", "quality")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("batch member outscoring the prior survivor takes over; weights accumulate") {
    // survivor 1 already absorbed 3 copies; two batch docs join its
    // group, the better one wins, n_copies = 3 + 2
    val out = run(surv = Seq((1L, h1, 5L, 3L)),
      batch = Seq((10L, h1, 2L), (11L, h1, 9L)))
    assert(out === Map(11L -> (9L, 5L)))
  }

  test("prior survivor outscoring the batch keeps its seat, weight still grows") {
    val out = run(surv = Seq((1L, h1, 9L, 3L)), batch = Seq((10L, h1, 2L)))
    assert(out === Map(1L -> (9L, 4L)))
  }

  test("a batch doc BRIDGES two prior survivors: groups merge, weights fold") {
    // ham(H1,H2)=6 — the previous update rightly kept both; the
    // arrival at H3 pairs with each (ham 3), merging the components
    val out = run(surv = Seq((1L, h1, 5L, 2L), (2L, h2, 7L, 4L)),
      batch = Seq((10L, h3, 1L)))
    assert(out === Map(2L -> (7L, 7L)))
  }

  test("unmatched rows pass through: survivors keep prior weight, batch gets 1") {
    val far = 0xFFFFFFFFFFFFFFFL // no chunk shared with h1
    val out = run(surv = Seq((3L, h1, 2L, 5L)), batch = Seq((12L, far, 8L)))
    assert(out === Map(3L -> (2L, 5L), 12L -> (8L, 1L)))
  }

  test("batch-only duplicate group with no survivor involvement") {
    val far = 0xFFFFFFFFFFFFFFFL
    val out = run(surv = Seq((3L, far, 2L, 5L)),
      batch = Seq((10L, h1, 4L), (11L, h1, 6L), (12L, h1, 6L)))
    // quality tie 6 between 11 and 12 -> min id
    assert(out === Map(3L -> (2L, 5L), 11L -> (6L, 3L)))
  }

  test("chained updates accumulate across rounds (output feeds back in)") {
    val r1 = run(surv = Seq((1L, h1, 5L, 1L)), batch = Seq((10L, h1, 6L)))
    assert(r1 === Map(10L -> (6L, 2L)))
    val r2 = run(surv = Seq((10L, h1, 6L, 2L)), batch = Seq((20L, h1, 9L)))
    assert(r2 === Map(20L -> (9L, 3L)))
  }
}
