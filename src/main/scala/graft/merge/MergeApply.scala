package graft.merge

import graft.model.Op
import graft.table.{GraftLake, SchemaEvolution}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-partitioned LWW MERGE upsert into the lake table (the north rule's
  * core operator).
  *
  * Formulated as **union + per-key max-offset reduction** instead of a
  * full-outer join:
  * {{{
  *   merged(bucket) = maxBy_offset( target_rows(bucket) ∪ batch_rows(bucket) )
  * }}}
  * DELETEs become tombstone rows (`_deleted = true`) that participate in the
  * same reduction — so "a maximal DELETE removes the row" and "a late
  * lower-offset replay cannot resurrect it" (SURVEY.md §4.4.2, §7.5) fall
  * out of one operator, with no join-strategy edge cases.
  *
  * Scale properties: only buckets touched by the batch are read and
  * rewritten (manifest-level pruning — bounded rewrite at 1e10 scale); the
  * single exchange is a hash partition by key with map-side partial
  * `max_by`, optionally salted for zipfian hot keys; AQE re-coalesces
  * post-shuffle partitions. Idempotent by construction: re-applying any
  * subset of already-applied events reproduces the same rows (equal offsets
  * → equal deterministic images).
  */
object MergeApply {

  final case class MergeResult(
      newFiles: Seq[GraftLake.FileEntry],
      affectedBuckets: Set[Int],
      appliedPerBucket: Map[Int, Long])

  /** `updates`: deduped or raw batch rows shaped as
    * (repo, path, <data cols of `schema`>, offset struct, op). */
  def apply(
      spark: SparkSession,
      lake: GraftLake,
      snap: GraftLake.Snapshot,
      schema: StructType,
      updates: DataFrame,
      batchId: Long,
      salt: Int = 1): MergeResult = {

    val dataCols = SchemaEvolution.dataColumns(schema).map(_.name)
      .filterNot(LwwDedup.keyCols.contains)
    val bucket = GraftLake.bucketExpr(lake.nBuckets)

    // batch rows in target-table shape (DELETE → tombstone with null data)
    val asRows = updates
      .select(
        LwwDedup.keyCols.map(col) ++
        dataCols.map(c => when(col("op") === Op.Delete, lit(null))
          .otherwise(col(c)).as(c)) ++
        Seq(col("offset").as("_offset"),
            (col("op") === Op.Delete).as("_deleted")): _*)
      .withColumn("_bucket", bucket)

    asRows.persist()
    val perBucket = asRows.groupBy(col("_bucket"))
      .agg(count_distinct(col("repo"), col("path")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val affected = perBucket.keySet

    val result =
      if (affected.isEmpty) MergeResult(Nil, Set.empty, Map.empty)
      else {
        val target = lake
          .read(spark, snap, Some(affected), includeTombstones = true)
          .withColumn("_bucket", bucket)
        val merged = LwwDedup.dedup(
          target.unionByName(asRows), salt, offsetCol = "_offset")
        val files = lake.writeData(
          merged.select((schema.fieldNames.map(col) :+ col("_bucket")).toSeq: _*),
          batchId
        ).map(_.copy(schemaVersion = snap.schemaVersion))
        MergeResult(files, affected, perBucket)
      }
    asRows.unpersist()
    result
  }

  /** File list of the next snapshot: untouched buckets keep their files. */
  def nextFiles(snap: GraftLake.Snapshot, r: MergeResult): Seq[GraftLake.FileEntry] =
    snap.files.filterNot(f => r.affectedBuckets.contains(f.bucket)) ++ r.newFiles
}
