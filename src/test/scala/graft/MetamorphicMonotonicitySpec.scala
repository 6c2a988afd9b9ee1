package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import MetamorphicHarness._
import graft.ext.{Contamination, Dedup, Sampling}
import graft.functions.TextFunctions

/** Deletion monotonicity / stability (metamorphic family, engine-only
  * — see [[MetamorphicHarness]]): removing rows from the corpus must
  * never GROW a gate's pass set, invent dedup pairs, or flip the
  * membership of surviving rows in a deterministic sample. D is a
  * fixed slice of the sf0.001 documents (every 5th doc); C\D keeps
  * the rest.
  */
class MetamorphicMonotonicitySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)
  private lazy val reduced = docs.filter(col("doc_id") % 5 =!= 0)
    .localCheckpoint(true)

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is")

  test("quality gate is per-row: pass(C \\ D) == pass(C) \\ D") {
    def passes(c: DataFrame) = c.filter(
      TextFunctions.qualityGate(col("text"), stops).getField("kept"))
      .select(col("doc_id"))
    assertSame("gate deletion stability",
      passes(reduced),
      passes(docs).filter(col("doc_id") % 5 =!= 0))
  }

  test("exact dedup groups only shrink under deletion") {
    val full = Dedup.exact(docs, "doc_id", "text")
      .select(col("fingerprint"), col("n_docs"))
    val less = Dedup.exact(reduced, "doc_id", "text")
      .select(col("fingerprint"), col("n_docs").as("n_less"))
    val joined = less.join(full, Seq("fingerprint"), "left")
      .localCheckpoint(true)
    // every surviving fingerprint existed before, with >= the count
    assert(joined.filter(col("n_docs").isNull).count() == 0,
      "deletion invented a fingerprint group")
    assert(joined.filter(col("n_less") > col("n_docs")).count() == 0,
      "deletion grew a dedup group")
  }

  test("minhash near-dup pairs restricted to survivors are unchanged") {
    // a doc's signature and band buckets depend on nothing but its
    // own text, so deleting OTHER docs neither invents nor destroys a
    // pair between survivors (uncapped surface)
    val full = Dedup.minhashLsh(docs, "doc_id", "text")
      .localCheckpoint(true)
    val less = Dedup.minhashLsh(reduced, "doc_id", "text")
    val fullRestricted = full.filter(
      col("doc_a") % 5 =!= 0 && col("doc_b") % 5 =!= 0)
    assert(full.count() > 0, "no pairs — vacuous")
    assertSame("minhash deletion stability", less, fullRestricted)
  }

  test("uniform sample membership is stable under deletion") {
    def s(c: DataFrame) = Sampling.uniform(c, col("doc_id"), 0.3)
      .select(col("doc_id"))
    assertSame("sample deletion stability",
      s(reduced), s(docs).filter(col("doc_id") % 5 =!= 0))
  }

  test("per-group cap never grows under deletion") {
    val fullCounts = Sampling.kPerGroup(docs, col("doc_id"),
        col("lang"), 20)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_full"))
    val lessCounts = Sampling.kPerGroup(reduced, col("doc_id"),
        col("lang"), 20)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_less"))
    val joined = lessCounts.join(fullCounts, Seq("lang"), "left")
      .localCheckpoint(true)
    assert(joined.filter(col("n_full").isNull).count() == 0)
    assert(joined.filter(col("n_less") > col("n_full")).count() == 0,
      "deletion grew a capped group")
    assert(joined.filter(col("n_less") > 20).count() == 0, "cap violated")
  }

  test("decontamination is per-doc: survivors(C \\ D) == survivors(C) \\ D") {
    val bench = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def surv(c: DataFrame) =
      Contamination.decontaminate(c, bench, "doc_id", "text", n = 5)
        .select(col("doc_id"))
    assertSame("decontaminate deletion stability",
      surv(reduced), surv(docs).filter(col("doc_id") % 5 =!= 0))
  }

  test("TEETH: a corpus-count-dependent gate mutant is flagged") {
    // seeded mutant: the gate passes everything when the corpus count
    // is EVEN, nothing when odd — so deleting one row from an
    // odd-sized corpus GROWS the pass set from 0 to everything, the
    // exact violation the monotonicity checks exist to catch
    def mutantGate(c: DataFrame): Long = {
      val n = c.count()
      if (n % 2 == 0) c.count() else 0L
    }
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(2)
      .collect().map(_.getLong(0))
    val oddCorpus = docs.filter(col("doc_id") =!= ids(0))
      .localCheckpoint(true)
    assert(oddCorpus.count() % 2 == 1, "seeding assumption broken")
    val before = mutantGate(oddCorpus)
    val after = mutantGate(oddCorpus.filter(col("doc_id") =!= ids(1)))
    // after > before IS the monotonicity violation: a sound gate can
    // never pass MORE rows after a deletion
    assert(after > before,
      "seeded mutant did not violate deletion monotonicity — teeth lost")
  }
}
