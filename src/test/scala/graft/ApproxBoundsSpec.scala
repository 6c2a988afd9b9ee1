package graft

import org.apache.spark.sql.functions._

/** b4's sketch-aggregate surface, checked TIGHTER than the oracle's
  * slack bands (round-9 upgrade of the ex rows-only row): the query
  * output pins approx-count-distinct at ±15% and the approx
  * percentiles inside ±5% rank; this spec asserts the raw sketch
  * errors on the driver testdata are far inside that — HLL with rsd
  * 0.05 lands within ±10% here, and percentile_approx (accuracy 1000
  * → rank error 1e-3) lands between the exact 0.49/0.51 (and
  * 0.98/1.0) rank values. A sketch regression trips this spec before
  * the slack band ever moves. */
class ApproxBoundsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("b4 bounded-error booleans are all TRUE on driver testdata") {
    val rows = SparkEntry.queries("b4_approx_agg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("approx_parts_ok")),
        s"HLL outside ±15% for flag ${r.get(0)}")
      assert(r.getBoolean(r.fieldIndex("p50_in_bounds")),
        s"approx p50 outside ±5% rank for flag ${r.get(0)}")
      assert(r.getBoolean(r.fieldIndex("p99_in_bounds")),
        s"approx p99 outside [p95, max] for flag ${r.get(0)}")
    }
  }

  test("raw sketch errors sit far inside the query's slack bands") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val agg = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
        .as("p50a"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
        .as("p99a"),
      expr("percentile(l_extendedprice, 0.49)").as("p49"),
      expr("percentile(l_extendedprice, 0.51)").as("p51"),
      expr("percentile(l_extendedprice, 0.98)").as("p98"),
      max(col("l_extendedprice")).as("pmax"))
    agg.collect().foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact")).toDouble
      val approx = r.getLong(r.fieldIndex("approx")).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.10,
        s"HLL rel err $relErr > 0.10 for flag ${r.get(0)}")
      def d(n: String) = r.getDouble(r.fieldIndex(n))
      assert(d("p50a") >= d("p49") && d("p50a") <= d("p51"),
        s"p50 sketch outside ±1% rank for flag ${r.get(0)}")
      assert(d("p99a") >= d("p98") && d("p99a") <= d("pmax"),
        s"p99 sketch outside [p98, max] for flag ${r.get(0)}")
    }
  }
}
