package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A4/M1-M5 semantics: batch apply == sequential upsert/delete replay
  * (the contract of reference spec/active_record_batch_consumer_spec.rb
  * create/update/delete ordering cases). */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, value) with value==null ⇒ tombstone
  private def events = Seq(
    (1L, "A", "a1"), (2L, "B", "b1"), (3L, "A", null),
    (4L, "C", "c1"), (5L, "B", "b2"), (6L, "D", "d1"), (7L, "D", null))
    .toDF("id", "key", "value")

  /** Driver-side oracle: sequential replay of upserts/deletes. */
  private def replay(rows: Seq[(Long, String, String)]): Map[String, String] =
    rows.sortBy(_._1).foldLeft(Map.empty[String, String]) {
      case (state, (_, k, null)) => state - k
      case (state, (_, k, v)) => state + (k -> v)
    }

  test("applyEvents equals sequential replay") {
    val got = Materialize.applyEvents(events, Seq("key"), col("id"),
      col("value").isNull)
      .select("key", "value").as[(String, String)].collect().toMap
    val want = replay(Seq((1L, "A", "a1"), (2L, "B", "b1"), (3L, "A", null),
      (4L, "C", "c1"), (5L, "B", "b2"), (6L, "D", "d1"), (7L, "D", null)))
    assert(got === want)
    assert(got === Map("B" -> "b2", "C" -> "c1"))
  }

  test("splitTombstones partitions on the predicate, null-safe") {
    val (up, del) = Materialize.splitTombstones(events, col("value").isNull)
    assert(up.count() === 5 && del.count() === 2)
  }

  test("mergeSnapshot: upserts replace, tombstones delete, untouched survive") {
    val current = Seq(("A", "a0"), ("X", "x0"), ("B", "b0"))
      .toDF("key", "value")
    val batch = Seq((1L, "A", "a9"), (2L, "B", null), (3L, "N", "n1"))
      .toDF("id", "key", "value")
    val got = Materialize.mergeSnapshot(current, batch, Seq("key"),
      col("id"), col("value").isNull)
      .as[(String, String)].collect().toMap
    assert(got === Map("A" -> "a9", "X" -> "x0", "N" -> "n1"))
  }

  test("fanOut nest/explode round-trips the child set with parent backfill") {
    val parents = Seq((1L, "p1"), (2L, "p2")).toDF("pk", "pname")
    val children = Seq((1L, 10L, "c10"), (1L, 11L, "c11"), (2L, 20L, "c20"))
      .toDF("fk", "ck", "cname")
    val (nested, exploded) = Materialize.fanOut(parents, children, "pk", "fk",
      Seq("ck", "cname"))
    assert(nested.count() === 2)
    val got = exploded.select("pk", "pname", "ck", "cname")
      .as[(Long, String, Long, String)].collect().toSet
    assert(got === Set((1L, "p1", 10L, "c10"), (1L, "p1", 11L, "c11"),
      (2L, "p2", 20L, "c20")))
  }

  test("save_associations_first: assoc batch deduped, fk filled back on primaries") {
    import spark.implicits._
    // three orders, two referencing the SAME customer profile — the
    // association batch must collapse them to one row, and both
    // primaries must come back with the same fk
    // (mass_updater.rb:93-131: save children first, then
    // record.assign_attributes(assoc.foreign_key => assoc.id))
    val prim = Seq(
      (100L, 7L, "gold"), (200L, 7L, "gold"), (300L, 9L, "silver"))
      .toDF("order_id", "cust", "tier")
      .select(col("order_id"),
        struct(col("cust"), col("tier")).as("profile"))
    val (assocBatch, staged) =
      Materialize.extractAssociationsFirst(prim, "profile")
    assert(assocBatch.columns.toSeq === Seq("cust", "tier", "bulk_import_id"))
    val assocs = assocBatch.select(col("cust"), col("tier"))
      .as[(Long, String)].collect().toSet
    assert(assocs === Set((7L, "gold"), (9L, "silver")),
      "equal attribute sets collapse to one association row")
    // the store's pk assignment, simulated deterministically
    val saved = assocBatch.withColumn("id",
      (col("cust") * 10).cast("long"))
    val filled = Materialize.fillForeignKeys(staged, saved,
      pkCol = "id", fkCol = "profile_id", assocCol = "profile")
    assert(!filled.columns.contains("bulk_import_id") &&
      !filled.columns.contains("profile"),
      "staging columns dropped — the frame is ready for the primary save")
    val got = filled.select(col("order_id"), col("profile_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 70L), (200L, 70L), (300L, 90L)))
  }

  test("save_associations_first: equal attrs hash equal however the struct was built") {
    import spark.implicits._
    // two frames building the same attribute set through different
    // expressions must stage identical surrogates (the dedup and the
    // fill-back join both ride on it)
    val a = Seq((1L, 5L)).toDF("pk", "x")
      .select(col("pk"), struct(col("x").as("v"), lit("c").as("w")).as("p"))
    val b = Seq((2L, 5L)).toDF("pk", "x")
      .select(col("pk"),
        struct((col("x") + 0).as("v"), concat(lit("c")).as("w")).as("p"))
    val sa = Materialize.extractAssociationsFirst(a, "p")._2
      .select(col("bulk_import_id")).as[String].head()
    val sb = Materialize.extractAssociationsFirst(b, "p")._2
      .select(col("bulk_import_id")).as[String].head()
    assert(sa === sb)
    // non-struct assoc columns are rejected loudly
    val e = intercept[IllegalArgumentException](
      Materialize.extractAssociationsFirst(
        Seq((1L, 2L)).toDF("pk", "flat"), "flat"))
    assert(e.getMessage.contains("struct"))
  }

  test("save_associations_first: a NULL association fails loudly, never drops") {
    import spark.implicits._
    // the reference's fill-back calls `.id` on the nil association
    // (mass_updater.rb:128-130 → NoMethodError); the Spark analog must
    // not silently lose the row at the inner join on a NULL surrogate
    val prim = Seq((1L, Some(5L)), (2L, None)).toDF("pk", "x")
      .select(col("pk"),
        when(col("x").isNotNull,
          struct(col("x").as("v"), lit("c").as("w"))).as("p"))
    val (_, staged) = Materialize.extractAssociationsFirst(prim, "p")
    val e = intercept[Exception](staged.collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("save_associations_first"),
      s"expected the null-association raise, got: ${chain(e)}")
  }

  test("replaceChildren removes stale children of touched parents only") {
    val existing = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("pk", "ck")
    val incoming = Seq((1L, 11L), (1L, 12L)).toDF("pk", "ck")
    val got = Materialize.replaceChildren(existing, incoming, "pk")
      .as[(Long, Long)].collect().toSet
    // parent 1 replaced by incoming set; parents 2,3 untouched
    assert(got === Set((1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L)))
  }
}
