package graft.merge

import graft.model.Op
import graft.table.{GraftLake, SchemaEvolution}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-partitioned LWW MERGE upsert into the lake table (the north rule's
  * core operator).
  *
  * Shuffle-minimal formulation:
  *
  * 1. **Winning offsets** — `groupBy(key).agg(max(offset))` over ONLY the
  *    key + offset columns. The exchange carries ~40 bytes/row instead of
  *    full row images; map-side partial max reduces every input partition
  *    to one row per key first, which also makes hot-key skew a non-issue
  *    (a zipfian key contributes at most one row per upstream partition —
  *    the reason the reference's one-thread-per-table design (reference:
  *    server/akkaSystem/SingleDbBinglogActor.java:57-68) never scaled is
  *    exactly what partial aggregation solves here).
  * 2. **Winner fetch** — broadcast the (key, winning-offset) set and
  *    re-scan the batch with a hash semi-join: full row images never
  *    shuffle at all. Per-microbatch key cardinality is bounded by source
  *    rate limiting (`maxFilesPerTrigger`), which is what makes the
  *    broadcast safe by construction at 1e10-event scale.
  * 3. **Merge** — `maxBy_offset(target_bucket_rows ∪ winners)` per key,
  *    over affected buckets only (manifest pruning bounds the rewrite).
  *    DELETEs ride through as tombstones (`_deleted`), so "a maximal
  *    DELETE removes the row" and "a late lower-offset replay cannot
  *    resurrect it" (SURVEY.md §4.4.2, §7.5) fall out of one operator.
  *
  * Idempotent by construction: re-applying any subset of already-applied
  * events reproduces the same rows (equal offsets → equal images).
  */
object MergeApply {

  final case class MergeResult(
      newFiles: Seq[GraftLake.FileEntry],
      affectedBuckets: Set[Int],
      appliedPerBucket: Map[Int, Long],
      countMs: Long = 0,
      writeMs: Long = 0)

  /** `updates`: raw batch rows shaped as
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

    // stage 1: winning offset per key — narrow-column shuffle only
    val t0 = System.nanoTime()
    val winOff = updates
      .select(col("repo"), col("path"), col("offset"))
      .groupBy("repo", "path")
      .agg(max(col("offset")).as("_woff"))
    winOff.persist()
    val perBucket = winOff.groupBy(bucket.as("_bucket"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val affected = perBucket.keySet
    val countMs = (System.nanoTime() - t0) / 1000000L
    val tw0 = System.nanoTime()

    val result =
      if (affected.isEmpty) MergeResult(Nil, Set.empty, Map.empty, countMs)
      else {
        // stage 2: fetch winner rows — broadcast hash join against a fresh
        // columnar scan; duplicate redeliveries of the same offset yield
        // identical rows and collapse in stage 3.
        val winKeys = winOff.select(col("repo").as("_wrepo"),
          col("path").as("_wpath"), col("_woff"))
        val winners = updates
          .join(broadcast(winKeys),
            col("repo") === col("_wrepo") && col("path") === col("_wpath") &&
            col("offset") === col("_woff"))
          .select(
            col("repo") +: col("path") +:
            (dataCols.map(c => when(col("op") === Op.Delete, lit(null))
              .otherwise(col(c)).as(c)) ++
            Seq(col("offset").as("_offset"),
              (col("op") === Op.Delete).as("_deleted"))): _*)
          .withColumn("_bucket", bucket)

        // stage 3: per-key reduction of target ∪ winners over affected
        // buckets, then rewrite those buckets
        val target = lake
          .read(spark, snap, Some(affected), includeTombstones = true)
          .withColumn("_bucket", bucket)
        val merged = LwwDedup.dedup(
          target.unionByName(winners), salt = 1, offsetCol = "_offset")
        val files = lake.writeData(
          merged.select((schema.fieldNames.map(col) :+ col("_bucket")).toSeq: _*),
          batchId
        ).map(_.copy(schemaVersion = snap.schemaVersion))
        MergeResult(files, affected, perBucket, countMs,
          (System.nanoTime() - tw0) / 1000000L)
      }
    winOff.unpersist()
    result
  }

  /** File list of the next snapshot: untouched buckets keep their files. */
  def nextFiles(snap: GraftLake.Snapshot, r: MergeResult): Seq[GraftLake.FileEntry] =
    snap.files.filterNot(f => r.affectedBuckets.contains(f.bucket)) ++ r.newFiles
}
