package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** The ANN guarantee surfaces (x7/x16/x89 gates) must have TEETH:
  * each boolean flips FALSE under the corruption it claims to catch,
  * and the identical-vector recall-floor anchor actually counts
  * planted duplicates. A gate whose booleans cannot fail would be
  * decorative — this suite plants duplicates and tampers with the
  * result frame to prove every check fires.
  */
class AnnGateTeethSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** 50 deterministic vectors; 3≡30 and 5≡31 planted identical so the
    * recall floor has something real to guard (queries are vec_id<20,
    * matching the gate's fixed predicate). */
  private def emb: DataFrame = {
    def vec(i: Int): Seq[Float] =
      (0 until dim).map(d => (((i * 31 + d * 17) % 97) - 48) / 48.0f)
    val rows = (0 until 50).map { i =>
      val src = if (i == 30) 3 else if (i == 31) 5 else i
      (i.toLong, vec(src))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def res: DataFrame =
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", dim = dim, nBits = 4, k = 3)

  private def surface(r: DataFrame): (Long, Long, Long, Boolean, Boolean) =
    ExtQueries.annSurface(emb, r, k = 3)
      .as[(Long, Long, Long, Boolean, Boolean)].head()

  test("clean result: anchors exact, both booleans TRUE") {
    val (nq, nc, nid, floor, verified) = surface(res)
    assert(nq === 20L)
    assert(nc === 50L)
    // planted pairs: (3,30) and (5,31) — queries 3 and 5 each see one
    // identical corpus vector (30/31 are not queries, so no reverse rows)
    assert(nid === 2L)
    assert(floor)
    assert(verified)
  }

  test("dropping a query's ENTIRE result set trips the recall floor") {
    // the review-caught three-valued-logic hole: with no res rows for
    // query 3, the left-joined cnt/extreme are NULL; before the
    // coalesce(..., false) fix the NULL predicate slid past when() and
    // the dropout passed the floor silently
    val tampered = res.filter(col("query_id") =!= 3L)
    val (_, _, nid, floor, _) = surface(tampered)
    assert(nid === 2L)
    assert(!floor)
  }

  test("dropping a planted identical pair trips the recall floor") {
    val tampered = res.filter(
      !(col("query_id") === 3L && col("neighbor_id") === 30L))
    val (_, _, nid, floor, _) = surface(tampered)
    assert(nid === 2L) // anchor is computed from emb, not the result
    assert(!floor)
  }

  test("perturbing one emitted cosine trips score verification") {
    val tampered = res.withColumn("cos",
      when(col("query_id") === 0L && col("rank") === 1L,
        col("cos") - 0.01).otherwise(col("cos")))
    assert(!surface(tampered)._5)
  }

  test("swapping a neighbor id (wrong pair association) is caught") {
    // point query 0's rank-1 row at an unrelated corpus vector while
    // keeping the old cosine — exactly the wiring corruption the
    // fresh recompute is for
    val tampered = res.withColumn("neighbor_id",
      when(col("query_id") === 0L && col("rank") === 1L, lit(47L))
        .otherwise(col("neighbor_id")))
    assert(!surface(tampered)._5)
  }

  test("a rank gap (dropped row mid-list) is caught") {
    // pick a query that really emitted a rank-2 row, so the filter
    // genuinely opens a gap instead of being a no-op
    val q = res.filter(col("rank") === 2L)
      .select(col("query_id")).as[Long].head()
    val tampered = res.filter(
      !(col("query_id") === q && col("rank") === 2L))
    assert(!surface(tampered)._5)
  }

  test("rank past k is caught") {
    val tampered = res.withColumn("rank",
      when(col("query_id") === 2L && col("rank") === 3L, lit(4L))
        .otherwise(col("rank")))
    assert(!surface(tampered)._5)
  }

  test("a self-pair smuggled in is caught") {
    val extra = Seq((7L, 7L, 4L, 1.0)).toDF(
      "query_id", "neighbor_id", "rank", "cos")
    assert(!surface(res.unionByName(extra))._5)
  }

  test("a neighbor outside the corpus is caught") {
    val extra = Seq((7L, 999L, 4L, 0.5)).toDF(
      "query_id", "neighbor_id", "rank", "cos")
    assert(!surface(res.unionByName(extra))._5)
  }

  test("non-monotone cosine order is caught") {
    // lift a rank-3 cosine above its rank-1 sibling
    val tampered = res.withColumn("cos",
      when(col("query_id") === 0L && col("rank") === 3L, lit(1.5))
        .otherwise(col("cos")))
    assert(!surface(tampered)._5)
  }

  test("cosSql matches the operator's cosine on the emitted pairs") {
    val joined = res
      .join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qe")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne")), "neighbor_id")
      .select(col("cos"),
        ExtQueries.cosSql(col("qe"), col("ne")).as("re"))
      .as[(Double, Double)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (c, r) => assert(math.abs(c - r) <= 6e-5) }
  }

  test("cosSql zero-norm rule matches SketchOps (0.0, not NaN)") {
    val z = Seq((Seq.fill(dim)(0.0f), Seq.fill(dim)(1.0f)))
      .toDF("a", "b")
      .select(ExtQueries.cosSql(col("a"), col("b")).as("c"))
      .as[Double].head()
    assert(z === 0.0)
  }
}
