package graft

import org.apache.spark.sql.functions._

/** CUBE lattice semantics: all four grouping planes, gid bitmask
  * convention (first cube column = most significant bit), and subtotal
  * consistency. */
class CubeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 1L, 30.0))
    .toDF("k", "d", "v")

  private lazy val cube = df.cube(col("k"), col("d"))
    .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
      sum(col("v")).as("s"))
    .collect()
    .map(r => (Option(r.getString(0)), Option(r.get(1)), r.getLong(2),
      r.getLong(3), r.getDouble(4)))

  test("gid 0 rows are the full detail") {
    assert(cube.count(_._3 == 0L) === 3)
  }

  test("gid bitmask: second column rolled up -> 1, first -> 2, both -> 3") {
    // (k, null) plane: d rolled up => least-significant bit set
    val kPlane = cube.filter(r => r._3 == 1L).map(r => (r._1, r._4)).toSet
    assert(kPlane === Set((Some("a"), 2L), (Some("b"), 1L)))
    val dPlane = cube.filter(r => r._3 == 2L).map(r => (r._2, r._4)).toSet
    assert(dPlane === Set((Some(1L), 2L), (Some(2L), 1L)))
    val total = cube.filter(r => r._3 == 3L)
    assert(total.length === 1 && total.head._4 === 3L
      && total.head._5 === 60.0)
  }
}
