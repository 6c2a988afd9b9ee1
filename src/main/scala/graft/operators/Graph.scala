package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge frames — PageRank with proper
  * dangling-mass redistribution, fixed-iteration and fully
  * deterministic (a pure function of the edge set).
  *
  * 100 TB shape: each iteration is exactly two key shuffles — ranks
  * join edges on `src` (both sides hash-partitioned on the node id, so
  * consecutive iterations reuse the exchange) and the contribution sum
  * groups by `dst`. The dangling mass and node count cross the driver
  * plan as ONE-ROW aggregate frames broadcast back (`crossJoin
  * (broadcast(...))`, the same shape as [[Decay.recencyScore]] /
  * [[Scale]]); no collect, no per-node driver state. Out-degrees are
  * computed once and reused by every iteration. For deep runs
  * (`iterations` ≫ 10) pass `materializeEvery` so the lineage is cut
  * with `localCheckpoint` instead of growing a plan Catalyst has to
  * re-optimize per iteration — the same converge-or-bound discipline
  * as [[graft.ext.Dedup.components]].
  *
  * Reference scope: deimos has no graph analytics; this extends the
  * engine for crawl-curation work (domain authority, link spam) —
  * SURVEY.md §2.9.
  */
object Graph {

  /** PageRank over `edges` (srcCol → dstCol, duplicates allowed — they
    * are distinct'd). Nodes = src ∪ dst. Uniform initial rank 1/N;
    * per iteration
    *   r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + D/N)
    * where D is the total rank mass parked on dangling nodes (no
    * out-edges) — the standard formulation, so Σ r stays 1 every
    * iteration.
    *
    * @param materializeEvery cut lineage with localCheckpoint every k
    *        iterations (0 = never; fine for small fixed runs)
    * @return (node, rank) — one row per node
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      materializeEvery: Int = 0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // Materialize the static inputs ONCE (localCheckpoint, same
    // discipline as Dedup.components): every iteration reuses the edge
    // set, node set, and out-degrees — left lazy, each of the ~4 uses
    // per iteration would re-run the upstream joins/distincts from the
    // scan (a 3-iteration unroll re-executed the edge-building join
    // 10+ times in the plan audit). Iterative graph processing pays
    // one adjacency materialization; that is the correct trade at any
    // scale.
    val e = edges.select(col(srcCol).cast("string").as("__src"),
      col(dstCol).cast("string").as("__dst")).distinct().localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct().localCheckpoint()
    // out-degree once; every iteration divides by it (exact: each
    // contribution term is one IEEE division r/deg)
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val n = nodes.agg(count(lit(1)).as("__n"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    for (i <- 1 to iterations) {
      // mass parked on dangling nodes (anti-join against out-degree)
      val dangling = ranks.join(deg, ranks("node") === deg("__src"),
          "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = e
        .join(deg, Seq("__src"))
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .groupBy(col("__dst"))
        .agg(sum(col("rank") / col("__deg")).as("__c"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("__dst"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(n))
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / col("__n"))).as("rank"))
      if (materializeEvery > 0 && i % materializeEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
