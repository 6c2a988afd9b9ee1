package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities: bucketed co-located joins and skew salting — the
  * knobs a 100 TB deployment turns when the default shuffle plan isn't
  * good enough.
  */
object Scale {

  /** Persist a frame bucketed by join keys. Two tables bucketed the
    * same way join shuffle-free (SortMergeJoin with no Exchange) —
    * the right layout for a fact table that is merge-joined every
    * micro-batch. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for skewed keys: the skewed (big) side gets a random
    * salt in [0, salts); the small side is replicated across all salt
    * values. Breaks a hot key into `salts` parallel partitions at the
    * cost of replicating the other side `salts`×. AQE's skew-join
    * handles moderate skew automatically; salting is for the
    * pathological keys AQE can't split (single-key hotspots).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Deterministic variant: salt derived from another column's hash —
    * reproducible plans (tests, oracles). */
  def saltedJoinDeterministic(big: DataFrame, small: DataFrame, key: String,
      saltFrom: String, salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
