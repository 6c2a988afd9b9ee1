package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store() = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft-snap").toString,
    keyCols = Seq("key"))

  test("incremental commits equal a single full replay; time travel works") {
    val s = store()
    val b1 = Seq((1L, "A", "a1"), (2L, "B", "b1")).toDF("id", "key", "v")
    val b2 = Seq((3L, "A", "a2"), (4L, "C", "c1"), (5L, "B", null))
      .toDF("id", "key", "v")
    val v0 = s.commit(b1, col("id"), col("v").isNull)
    val v1 = s.commit(b2, col("id"), col("v").isNull)
    assert(v0 === 0L && v1 === 1L)
    val got = s.read().get.select("key", "v").as[(String, String)]
      .collect().toMap
    val replay = Materialize.applyEvents(b1.unionByName(b2), Seq("key"),
      col("id"), col("v").isNull)
      .select("key", "v").as[(String, String)].collect().toMap
    assert(got === replay)
    assert(got === Map("A" -> "a2", "C" -> "c1"))
    // time travel to v0
    val old = s.readVersion(0L).select("key", "v").as[(String, String)]
      .collect().toMap
    assert(old === Map("A" -> "a1", "B" -> "b1"))
  }

  test("vacuum removes old versions, keeps the current one readable") {
    val s = store()
    val b = Seq((1L, "A", "a")).toDF("id", "key", "v")
    s.commit(b, col("id"), col("v").isNull)
    s.commit(Seq((2L, "A", "a2")).toDF("id", "key", "v"),
      col("id"), col("v").isNull)
    s.vacuum(keep = 1)
    assert(s.read().get.count() === 1)
    intercept[Exception] { s.readVersion(0L).collect() }
  }
}
