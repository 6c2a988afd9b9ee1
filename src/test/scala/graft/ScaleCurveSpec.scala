package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** The K× corpus the scaling-curve harness builds must scale the WORK
  * linearly, not the workload's combinatorics — these pins are what
  * make a measured growth ≤ ~K a statement about the operators rather
  * than about a quadratically-inflated fixture.
  *
  *  - row counts exactly ×K, ids disjoint across replicas, TPC-H
  *    referential integrity intact within each replica;
  *  - token counts exactly ×K (marker REPLACEMENT, not insertion);
  *  - intra-replica duplicate structure preserved: two docs that were
  *    exact duplicates in the base are still exact duplicates inside
  *    every replica (markers keyed by position+replica, not doc_id);
  *  - cross-replica 3-shingle Jaccard of the SAME base doc sits below
  *    the 0.2 LSH verification threshold, so minhash dedup on the K×
  *    corpus finds K× the base pairs, never K²-inflated cross-replica
  *    pairs.
  */
class ScaleCurveSpec extends SparkSpec {
  import spark.implicits._

  private val baseDir = "/root/testdata/sf0.001"
  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-scale").toString
    ScaleCurve.buildScaledDir(spark, baseDir, d, k = 3)
    d
  }
  private def base(name: String) =
    spark.read.parquet(s"$baseDir/$name.parquet")
  private def scaled(name: String) =
    spark.read.parquet(s"$outDir/$name.parquet")

  test("row counts are exactly xK and ids are disjoint across replicas") {
    for ((tbl, id) <- Seq("orders" -> "o_orderkey", "lineitem" -> null,
        "supplier" -> "s_suppkey", "customer" -> "c_custkey",
        "documents" -> "doc_id", "events" -> "event_id")) {
      assert(scaled(tbl).count() === 3 * base(tbl).count(), tbl)
      if (id != null)
        assert(scaled(tbl).select(id).distinct.count() ===
          3 * base(tbl).select(id).distinct.count(), s"$tbl.$id disjoint")
    }
  }

  test("TPC-H referential integrity holds within every replica") {
    val o = scaled("orders").select(col("o_orderkey"))
    val li = scaled("lineitem").select(col("l_orderkey")).distinct
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() === 0, "every lineitem order key resolves in its replica")
    val s = scaled("supplier").select(col("s_suppkey"))
    val ls = scaled("lineitem").select(col("l_suppkey")).distinct
    assert(ls.join(s, ls("l_suppkey") === s("s_suppkey"), "left_anti")
      .count() === 0, "every lineitem supp key resolves in its replica")
  }

  test("token counts scale exactly xK (replacement, not insertion)") {
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(
      sum(size(filter(split(col("text"), "\\s+"), t => t =!= ""))))
      .as[Long].head()
    assert(toks(scaled("documents")) === 3 * toks(base("documents")))
  }

  test("intra-replica exact-duplicate structure is preserved") {
    // base exact-dup pairs (by full text) must reappear in EVERY
    // replica: markers are position-keyed, so identical base texts
    // stay identical after the swap
    val baseDups = base("documents").groupBy(col("text"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    val scaledDups = scaled("documents").groupBy(col("text"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(scaledDups === 3 * baseDups,
      s"dup groups must triple: base=$baseDups scaled=$scaledDups")
  }

  test("cross-replica copies of one base doc sit below the LSH threshold") {
    // replicas of the same base doc must NOT read as near-dups: their
    // verified 3-shingle Jaccard stays under the 0.2 minhashLsh
    // threshold (the marker swap hits ~3 of every 4 shingles)
    val reps = scaled("documents")
      .withColumn("base_id", col("doc_id") % 10000000L)
    val ids = reps.groupBy(col("base_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") === 3).select(col("base_id"))
      .orderBy(col("base_id")).limit(5).as[Long].collect()
    assert(ids.nonEmpty, "need at least one base doc present in all replicas")
    val sample = reps.filter(col("base_id").isInCollection(ids))
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.minhashLsh(sample, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.2)
      .select(col("doc_a") % 10000000L, col("doc_b") % 10000000L)
      .as[(Long, Long)].collect()
    assert(!pairs.exists(p => p._1 == p._2),
      s"cross-replica self-pairs must not verify at 0.2: $pairs")
  }

  test("media fixture seed bands keep the dup-rate scale-invariant") {
    // the x134/x136 gates synthesize identical media for equal seeds;
    // with the banded seed (doc_id mod 251 + 251 per DocOffset band)
    // every replica owns a DISJOINT seed space, so the identical-pair
    // count — the quadratic driver of near-dup work — grows exactly
    // xK, never K²x. This pin is what makes the curve rows for
    // x134/x136 a statement about the OPERATOR's scaling.
    def pairs(df: org.apache.spark.sql.DataFrame): Long = df
      .select(((col("doc_id") % 251) +
        floor(col("doc_id") / lit(10000000L)) * 251).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
      .as[Long].head()
    val b = pairs(base("documents"))
    assert(b > 0, "base fixture must contain identical groups")
    assert(pairs(scaled("documents")) === 3 * b)
    // and the un-banded formula would NOT be invariant (the trap the
    // band exists to avoid): plain mod-251 groups inflate superlinearly
    def pairsPlain(df: org.apache.spark.sql.DataFrame): Long = df
      .select((col("doc_id") % 251).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)))
      .as[Long].head()
    assert(pairsPlain(scaled("documents")) > 3 * pairsPlain(base("documents")))
  }

  test("embeddings scale xK with disjoint ids; replica 0 is verbatim") {
    assert(scaled("embeddings").count() === 3 * base("embeddings").count())
    assert(scaled("embeddings").select("vec_id").distinct.count() ===
      3 * base("embeddings").select("vec_id").distinct.count())
    // replica 0 (the query side: vec_id < 20 lives here) is untouched
    val b0 = base("embeddings").select(col("vec_id"), col("embedding"))
    val s0 = scaled("embeddings").filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), col("embedding"))
    assert(s0.except(b0).count() === 0 && b0.except(s0).count() === 0)
  }

  test("rotation preserves intra-replica cosine structure exactly") {
    // same permutation on both vectors of a pair ⇒ same dot-product
    // terms (reordered) ⇒ cosines equal to fp-reduction noise; and a
    // rotated replica is NOT a verbatim copy (ids aside)
    val bcos = base("embeddings").filter(col("vec_id") < 10)
    val pairsOf = (df: org.apache.spark.sql.DataFrame, off: Long) => df
      .select((col("vec_id") - off).as("id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1).map(_._2)
    val v0 = pairsOf(bcos, 0L)
    val v2 = pairsOf(scaled("embeddings")
      .filter(col("vec_id") >= 20000000L && col("vec_id") < 20000010L),
      20000000L)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    for (i <- v0.indices; j <- v0.indices if i < j)
      assert(math.abs(cos(v0(i), v0(j)) - cos(v2(i), v2(j))) < 1e-9,
        s"intra-replica cosine must survive rotation ($i,$j)")
    // and replica 2's vectors differ from the base (rotation real)
    assert(v0.indices.exists(i => v0(i) != v2(i)),
      "rotation must actually change the vectors")
  }

  test("sign pattern decorrelates replicas past the rotation wrap (K > dim)") {
    // rotation alone wraps at r % dim: replicas r and r+dim would carry
    // bit-identical vectors under different vec_ids — quadratic
    // cross-replica duplicate re-inflation exactly past the point the
    // curve stops looking. The per-replica sign flip breaks the wrap
    // while preserving every intra-replica dot product EXACTLY
    // (each term multiplied by s_i² = 1). Probe with a micro base of
    // dim-4 vectors and k = 9 > dim, so replicas 0/4/8 share a rotation.
    val micro = java.nio.file.Files.createTempDirectory("graft-microscale").toString
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$micro/orders.parquet")
    Seq((1L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$micro/lineitem.parquet")
    Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$micro/supplier.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey").write.parquet(s"$micro/customer.parquet")
    Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
      .write.parquet(s"$micro/documents.parquet")
    Seq((100L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
        (101L, Seq(4.0f, -3.0f, 2.0f, -1.0f)))
      .toDF("vec_id", "embedding").write.parquet(s"$micro/embeddings.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-microscale-out").toString
    // the probe only inspects embeddings — exercise the table-subset
    // path (round-16) instead of fabricating the full micro corpus
    ScaleCurve.buildScaledDir(spark, micro, out, k = 9,
      tables = Seq("embeddings"))
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")
      .as[(Long, Seq[Float])].collect().toMap
    val off = 10000000L
    def rep(r: Int, id: Long): Seq[Float] = vecs(id + r * off)
    // same rotation (r % 4 == 0), different signs ⇒ different vectors
    for (r <- Seq(4, 8); id <- Seq(100L, 101L))
      assert(rep(r, id) != rep(0, id),
        s"replica $r must not be a verbatim copy of replica 0 (id $id)")
    assert(rep(4, 100L) != rep(8, 100L),
      "replicas 4 and 8 must differ from each other too")
    // intra-replica dot products preserved exactly in every replica
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val d0 = dot(rep(0, 100L), rep(0, 101L))
    for (r <- 1 until 9)
      assert(math.abs(dot(rep(r, 100L), rep(r, 101L)) - d0) < 1e-9,
        s"intra-replica dot product must survive signs+rotation (r=$r)")
  }
}
