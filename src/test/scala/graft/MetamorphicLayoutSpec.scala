package graft

import org.apache.spark.sql.functions._

import MetamorphicHarness._

/** Layout/permutation invariance (metamorphic family, engine-only —
  * see [[MetamorphicHarness]]): every order-insensitive query must
  * produce the SAME multiset of rows when its input tables are
  * re-ordered and re-split across files. A query that leaks
  * `spark_partition_id`, `monotonically_increasing_id`, first-row
  * arbitrariness, or partition-local state fails here even though the
  * single-layout oracle run can never see it.
  *
  * Input: the sf0.001 testdata vs a value-identical copy with row
  * order shuffled and every single-file table split into 3 files.
  */
class MetamorphicLayoutSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"
  private lazy val permDir: String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft-metamorphic-perm").toString
    permutedCopy(spark, srcDir, d)
    d
  }

  /** Queries spanning every batch family: dedup, sampling, governance,
    * text, retrieval, contamination, temporal, ANN. All are
    * order-insensitive by contract (each hash-matches a sorted oracle
    * comparison), so layout invariance must hold for every one. */
  private val queries = Seq(
    // dedup
    "x1_dedup_exact", "x2_dedup_minhash", "x3_dedup_simhash",
    "x4_dedup_ngram", "x5_dedup_embed", "x13_dedup_groups",
    "x97_dup_extents", "x124_prefix_jaccard",
    // sampling
    "x30_sample", "x43_cap_per_group", "x45_epoch_shuffle",
    "x46_group_split", "x53_mixture", "x65_weighted_sample",
    "x107_token_budget",
    // governance / profiling
    "x39_len_quantiles", "x42_profile", "x73_robust_outliers",
    "x78_cube", "x88_heavy_hitters", "x103_quantile_bins",
    "x109_kanon", "x121_fd_profile", "x129_cms", "x131_psi",
    // text
    "x8_text_langid", "x9_text_quality", "x10_text_tokens",
    "x72_lexdiv",
    // retrieval
    "x40_postings", "x49_bm25", "x95_hybrid_rrf",
    // contamination
    "x38_contamination",
    // temporal
    "x17_sessions", "x57_asof_fwd",
    // ANN
    "x6_ann_brute", "x7_ann_lsh")

  queries.foreach { name =>
    test(s"layout invariance: $name") {
      val fn = SparkEntry.queries(name)
      assertSame(name, fn(spark, srcDir), fn(spark, permDir))
    }
  }

  test("TEETH: a partition-id-dependent query is flagged") {
    // the seeded mutant: output depends on file layout, the exact bug
    // class this suite exists to catch — the checker MUST report a
    // difference between the two layouts
    def mutant(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
    val d = diff(mutant(srcDir), mutant(permDir))
    assert(d.isDefined,
      "checker failed to flag a layout-dependent result")
  }

  test("TEETH: first-row arbitrariness is flagged") {
    // `first()` without ordering is layout-dependent — a classic
    // silent wrong-both-ways bug shape
    def mutant(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .agg(first(col("doc_id")).as("first_doc"))
    val d = diff(mutant(srcDir), mutant(permDir))
    assert(d.isDefined,
      "checker failed to flag first-row arbitrariness " +
        "(did the permuted copy preserve row order?)")
  }
}
