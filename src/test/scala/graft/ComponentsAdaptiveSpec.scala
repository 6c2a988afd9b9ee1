package graft

import graft.ext.Dedup

class ComponentsAdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L), (4L, 9L))
    .toDF("doc_a", "doc_b")
  private val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
    4L -> 4L, 8L -> 4L, 9L -> 4L)

  test("driver-side union-find path matches distributed propagation") {
    val fast = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.components(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === want)
    assert(dist === want)
  }
}
