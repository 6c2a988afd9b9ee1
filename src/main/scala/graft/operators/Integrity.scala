package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit: per foreign-key relationship, the
  * row/key counts a pipeline health check wants — child rows, NULL
  * keys (not violations, per SQL FK semantics), distinct keys, orphan
  * keys/rows (child keys absent from the parent), and row-level
  * coverage of the non-null population.
  *
  * Scale shape per relation: the child collapses to (key, count) with
  * map-side partial aggregation BEFORE anything else — all later work
  * (anti join against the parent's distinct keys, total/orphan
  * aggregates) runs on the compact keyed frame, so a 100 TB child
  * crosses the wire once as pre-aggregated pairs. The final combine is
  * a crossJoin of two one-row aggregates (trivially safe).
  */
object Integrity {

  /** One-row report for `child.childKey → parent.parentKey`.
    *
    * Columns: relation, child_rows, null_rows, distinct_keys,
    * orphan_keys, orphan_rows, coverage — coverage is matched non-null
    * rows / non-null rows (null when the child has no non-null keys).
    */
  def fkReport(relation: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val keyed = child.select(col(childKey).as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("__cnt"))
    val totals = keyed.agg(
      sum(col("__cnt")).as("child_rows"),
      coalesce(sum(when(col("__k").isNull, col("__cnt"))), lit(0L))
        .as("null_rows"),
      count(when(col("__k").isNotNull, lit(1))).as("distinct_keys"))
    val orphans = keyed.filter(col("__k").isNotNull)
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("orphan_keys"),
        coalesce(sum(col("__cnt")), lit(0L)).as("orphan_rows"))
    val nonNull = col("child_rows") - col("null_rows")
    totals.crossJoin(orphans).select(
      lit(relation).as("relation"),
      col("child_rows"), col("null_rows"), col("distinct_keys"),
      col("orphan_keys"), col("orphan_rows"),
      when(nonNull > 0,
        (nonNull - col("orphan_rows")).cast("double") /
          nonNull.cast("double")).as("coverage"))
  }

  /** Union of [[fkReport]] rows, one per relationship. */
  def fkReports(
      relations: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(relations.nonEmpty, "fkReports needs at least one relation")
    relations.map { case (name, c, ck, p, pk) =>
      fkReport(name, c, ck, p, pk)
    }.reduce(_ unionByName _)
  }
}
