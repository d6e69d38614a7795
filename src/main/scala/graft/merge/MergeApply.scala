package graft.merge

import graft.model.Op
import graft.table.{GraftLake, SchemaEvolution}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-partitioned LWW MERGE upsert into the lake table (the north rule's
  * core operator).
  *
  * Shuffle-minimal formulation — per microbatch the merge is the write
  * action plus the caller's one winner-offset aggregate (computed once,
  * cached, and reused here as the broadcast build side — its row count is
  * also the exact dedup lineage metric and the broadcast-vs-shuffle
  * decision, so no aggregation is ever run twice). At 1e10-event scale the
  * per-job fixed cost is irrelevant, but in steady-state streaming it is
  * the per-microbatch latency floor:
  *
  * 1. **Winning offsets** (broadcast build side) — `groupBy(key)
  *    .agg(max(offset))` over ONLY key + offset columns. The exchange
  *    carries ~40 bytes/row instead of full row images; map-side partial
  *    max reduces every input partition to one row per key first, which
  *    also makes hot-key skew a non-issue (a zipfian key contributes at
  *    most one row per upstream partition — the reason the reference's
  *    one-thread-per-table design (reference:
  *    server/akkaSystem/SingleDbBinglogActor.java:57-68) never scaled is
  *    exactly what partial aggregation solves here).
  * 2. **Winner fetch** — offsets are globally unique (fileIdx, pos, rowIdx
  *    disambiguate every event — SURVEY.md §4.4.1), so the probe is a
  *    broadcast LEFT SEMI join on the bare offset struct: 24 bytes/key in
  *    the build hash table, no strings, and full row images never shuffle
  *    at all. Per-microbatch key cardinality is bounded by source rate
  *    limiting (`maxFilesPerTrigger`), which is what makes the broadcast
  *    safe by construction at scale.
  * 3. **Merge** — `max_by(row, offset)` per key over
  *    (target rows of affected buckets) ∪ winners; only affected buckets
  *    rewrite (manifest pruning bounds the rewrite). DELETEs ride through
  *    as tombstones (`_deleted`), so "a maximal DELETE removes the row"
  *    and "a late lower-offset replay cannot resurrect it"
  *    (SURVEY.md §4.4.2, §7.5) fall out of one operator.
  *
  * Idempotent by construction: re-applying any subset of already-applied
  * events reproduces the same rows (equal offsets → equal images).
  */
object MergeApply {

  final case class MergeResult(
      newFiles: Seq[GraftLake.FileEntry],
      affectedBuckets: Set[Int],
      /** total rows per rewritten bucket (winners + carried-over target),
        * read from parquet footers — no extra job */
      rowsPerBucket: Map[Int, Long],
      mergeMs: Long = 0)

  /** @param updates batch rows shaped as
    *   (repo, path, &lt;data cols of `schema`&gt;, offset struct, op).
    *   Broadcast path: NOT no-op-filtered (the semi-join excludes no-ops
    *   for free). Direct path: MUST be no-op-filtered by the caller.
    * @param winOff per-key winning offsets, a single `_woff` struct column,
    *   CACHED by the caller — the caller computes this aggregate exactly
    *   once (its count is the dedup lineage metric AND the broadcast
    *   decision) and the broadcast build here reads the cached blocks
    *   instead of re-running the keyed aggregation over the batch
    *   (round-2: the duplicated winner agg — once as the planning scan's
    *   count_distinct, once in here — was 2.2x the merge's own cost).
    *   Ignored on the direct path (may be null there).
    * @param affected bucket ids touched by this batch (a superset is safe:
    *   the bucket is rewritten with carried-over rows only).
    * @param useBroadcast winner-selection strategy, decided by the caller
    *   from `winOff`'s EXACT row count: `true` = the broadcast semi-join
    *   above (full images never shuffle — right when the key set fits
    *   executor memory, i.e. every rate-limited streaming microbatch);
    *   `false` = skip pre-selection entirely and let the single bucketed
    *   `max_by` reduction pick winners (one image shuffle, zero broadcast
    *   state — the only safe shape when a one-shot replay carries more
    *   distinct keys than any executor should hold; round-1 verdict: the
    *   unbounded broadcast OOMs at 10^8-key scale). */
  def apply(
      spark: SparkSession,
      lake: GraftLake,
      snap: GraftLake.Snapshot,
      schema: StructType,
      updates: DataFrame,
      winOff: DataFrame,
      affected: Set[Int],
      batchId: Long,
      useBroadcast: Boolean = true): MergeResult = {

    val t0 = System.nanoTime()
    if (affected.isEmpty) return MergeResult(Nil, Set.empty, Map.empty)

    val dataCols = SchemaEvolution.dataColumns(schema).map(_.name)
      .filterNot(LwwDedup.keyCols.contains)
    val bucket = GraftLake.bucketExpr(lake.nBuckets)

    val preSelected =
      if (useBroadcast)
        // probe on the 16-byte DECIMAL offset encoding (the build side IS
        // the cached winner aggregate, already encoded): offsets are
        // globally unique, so equality on the encoding selects exactly the
        // per-key winners — full row images never shuffle
        updates.join(broadcast(winOff),
          graft.model.Offset.encExpr(col("offset")) === col("_woff"), "leftsemi")
      else updates // per-key winners fall out of the bucketed reduction

    val winners = preSelected
      .select(
        col("repo") +: col("path") +:
        (dataCols.map(c => when(col("op") === Op.Delete, lit(null))
          .otherwise(col(c)).as(c)) ++
        Seq(col("offset").as("_offset"),
          (col("op") === Op.Delete).as("_deleted"))): _*)
      .withColumn("_bucket", bucket)

    val target = lake
      .read(spark, snap, Some(affected), includeTombstones = true)
      .withColumn("_bucket", bucket)
    // single exchange: repartition by bucket, then the per-key reduction
    // reuses that partitioning (grouping keys ⊇ partitioning keys) and the
    // bucket-directory write needs no further shuffle.
    val merged = LwwDedup.dedupBucketed(
      target.unionByName(winners), offsetCol = "_offset")
    val files = lake.writeData(
      merged.select((schema.fieldNames.map(col) :+ col("_bucket")).toSeq: _*),
      batchId, prePartitioned = true
    ).map(_.copy(schemaVersion = snap.schemaVersion))

    MergeResult(files, affected,
      files.groupBy(_.bucket).map { case (b, fs) => b -> fs.map(_.rows).sum },
      (System.nanoTime() - t0) / 1000000L)
  }

  /** File list of the next snapshot: untouched buckets keep their files. */
  def nextFiles(snap: GraftLake.Snapshot, r: MergeResult): Seq[GraftLake.FileEntry] =
    snap.files.filterNot(f => r.affectedBuckets.contains(f.bucket)) ++ r.newFiles
}
