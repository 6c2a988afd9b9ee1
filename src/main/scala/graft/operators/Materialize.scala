package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Materialization: apply a keyed event stream to a table — the engine's
  * equivalent of the reference's batch-consumption merge
  * (`lib/deimos/active_record_consume/batch_consumption.rb:143-235`,
  * `mass_updater.rb:49-88`).
  *
  * Spark-first shape: compaction + tombstone split are one keyed window /
  * filter pair (single shuffle on the key); the final state of a batch is
  * derivable without row-at-a-time application because last-write-wins
  * makes all but the final version of a key irrelevant.
  */
object Materialize {

  /** A4 — split a batch into (upserts, deletes) on the tombstone
    * predicate (reference: `batch_consumption.rb:143-164`). */
  def splitTombstones(df: DataFrame, tombstone: Column): (DataFrame, DataFrame) =
    (df.filter(!coalesce(tombstone, lit(false))), df.filter(coalesce(tombstone, lit(false))))

  /** Final state after applying a keyed batch in order: the last event
    * per key wins; a key whose last event is a tombstone is absent.
    * This is exactly what sequential upsert/delete application converges
    * to (reference semantics of `update_database`,
    * `batch_consumption.rb:143-164`, with default compaction A1).
    */
  def applyEvents(events: DataFrame, keyCols: Seq[String], orderCol: Column,
      tombstone: Column): DataFrame =
    Compaction.lastWins(events, keyCols, orderCol)
      .filter(!coalesce(tombstone, lit(false)))

  /** Merge a compacted batch into an existing snapshot: new version of
    * every key present in the batch (tombstones remove), untouched keys
    * carried over. Both inputs shuffle once on the key; at scale this is
    * the standard copy-on-write merge pattern.
    */
  def mergeSnapshot(current: DataFrame, batch: DataFrame, keyCols: Seq[String],
      orderCol: Column, tombstone: Column): DataFrame = {
    val compacted = Compaction.lastWins(batch, keyCols, orderCol)
    val survivors = compacted.filter(!coalesce(tombstone, lit(false)))
      .select(current.columns.toIndexedSeq.map(col): _*)
    val untouched = current.join(compacted.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    untouched.unionByName(survivors)
  }

  /** M5 — association fan-out: nest child rows under their parent,
    * then re-split with the parent key backfilled — the engine analog of
    * the reference's bulk-import-id surrogate join
    * (`batch_record_list.rb:53-66`, `mass_updater.rb:75-88`).
    *
    * @param parents   parent rows (one per parentKey)
    * @param children  child rows carrying parentKey
    * @param parentKey join column
    * @param childCols child payload columns to nest
    * @return (nested, exploded) — nested has `children: array<struct>`;
    *         exploded is the flattened parent-key-backfilled child set.
    */
  def fanOut(parents: DataFrame, children: DataFrame, parentKey: String,
      childFk: String, childCols: Seq[String]): (DataFrame, DataFrame) = {
    val childStruct = struct(childCols.map(col): _*)
    val nestedChildren = children
      .groupBy(col(childFk).as(parentKey))
      .agg(sort_array(collect_list(childStruct)).as("children"))
    val nested = parents.join(nestedChildren, Seq(parentKey), "inner")
    val exploded = nested
      .withColumn("child", explode(col("children")))
      .select((parents.columns.toIndexedSeq.map(col) ++
        childCols.map(c => col("child").getField(c).as(c))): _*)
    (nested, exploded)
  }

  /** M5 — primary-key backfill: parents were staged with a surrogate
    * `bulk_import_id`; after the store assigns real pks, children get
    * their fk by joining staged→saved on the surrogate (reference:
    * `batch_record_list.rb:53-66` — the bulk_import_id UUID join). */
  def backfillPrimaryKeys(children: DataFrame, savedParents: DataFrame,
      surrogateCol: String, pkCol: String): DataFrame =
    children.join(
      savedParents.select(col(surrogateCol), col(pkCol)), Seq(surrogateCol))

  /** M5 — stage parents with the surrogate id column (deterministic
    * hash by default so tests and oracles can reproduce it). */
  def withBulkImportId(parents: DataFrame, fromCols: Seq[String],
      surrogateCol: String = "bulk_import_id"): DataFrame =
    parents.withColumn(surrogateCol,
      md5(concat_ws("|", fromCols.map(col): _*)))

  /** M5, assoc-first direction (`save_associations_first` — reference
    * `mass_updater.rb:93-131`, topic setting `consumer_route.rb:13` /
    * `active_record_consumer.rb:64-66`): the primary rows BELONG TO
    * their nested association record — the association table must be
    * saved FIRST so every primary can be written with the real foreign
    * key filled back (the reverse of [[fanOut]]'s parents-first
    * direction, where children carry the parent key).
    *
    * This is step 1 (`assign_associations` + the save prep): pull the
    * nested association struct off the primaries, collapse equal
    * attribute sets to ONE association row (the reference's per-record
    * BatchRecords land on one row through the child upsert's conflict
    * target), and key everything by a deterministic surrogate of the
    * attributes — the assoc-first analog of the bulk_import_id
    * staging. After the caller saves the association batch (the store
    * assigns primary keys), [[fillForeignKeys]] completes step 2.
    *
    * Scale shape: the dedup is one shuffle on the surrogate; the
    * primaries pass through with one added column, no shuffle.
    *
    * @return (assocBatch, stagedPrimaries) — assocBatch is the deduped
    *         association frame (attr columns + surrogate); staged
    *         primaries carry the surrogate linking each row to its
    *         association record.
    */
  def extractAssociationsFirst(primaries: DataFrame, assocCol: String,
      surrogateCol: String = "bulk_import_id"): (DataFrame, DataFrame) = {
    val st = primaries.schema(assocCol).dataType match {
      case s: org.apache.spark.sql.types.StructType => s
      case other => throw new IllegalArgumentException(
        s"$assocCol must be a struct of association attributes, got " +
          other.catalogString)
    }
    // to_json of a struct is schema-ordered, so equal attribute sets
    // hash equal regardless of how the caller built the struct. A NULL
    // association raises at execution: the reference's fk fill-back
    // calls `.id` on the nil association (mass_updater.rb:128-130,
    // NoMethodError) — a silent drop at the fill-back's inner join
    // (NULL surrogate never equi-joins) would be data loss, not parity.
    // Coalesce stops at the first non-null, so the error fires only on
    // the offending rows.
    val staged = primaries.withColumn(surrogateCol,
      coalesce(md5(to_json(col(assocCol))),
        raise_error(lit(s"save_associations_first: '$assocCol' is null " +
          "for some primary rows; every primary must carry its " +
          "association record (reference mass_updater.rb:128-130 " +
          "raises on nil)")).cast("string")))
    val assocBatch = staged.select(
      (st.fieldNames.toIndexedSeq.map(f =>
        col(assocCol).getField(f).as(f)) :+ col(surrogateCol)): _*)
      .dropDuplicates(surrogateCol)
    (assocBatch, staged)
  }

  /** M5, assoc-first step 2 (`mass_updater.rb:126-130`: each primary
    * gets `assoc.foreign_key = saved association's id`): join the
    * store-assigned primary key back onto the staged primaries on the
    * surrogate, name it as the foreign-key column, and drop the
    * staging columns — the returned frame is the primary batch ready
    * for its own save, fks real. Inner join: every staged primary has
    * its association row by construction, so no row is lost. */
  def fillForeignKeys(stagedPrimaries: DataFrame, savedAssocs: DataFrame,
      pkCol: String, fkCol: String, assocCol: String,
      surrogateCol: String = "bulk_import_id"): DataFrame =
    stagedPrimaries.join(
      savedAssocs.select(col(surrogateCol), col(pkCol).as(fkCol)),
      Seq(surrogateCol))
      .drop(surrogateCol)
      .drop(assocCol)

  /** "Replace associations" delete: children of touched parents that are
    * NOT in the incoming set are removed — i.e. a touched parent's
    * child set is replaced WHOLESALE by its incoming children
    * (reference: `batch_record_list.rb:79-86`). Returns surviving
    * children. */
  def replaceChildren(existing: DataFrame, incoming: DataFrame,
      parentKey: String): DataFrame = {
    val touchedParents = incoming.select(parentKey).distinct()
    val untouched = existing.join(touchedParents, Seq(parentKey), "left_anti")
    untouched.unionByName(incoming.select(existing.columns.toIndexedSeq.map(col): _*))
  }
}
