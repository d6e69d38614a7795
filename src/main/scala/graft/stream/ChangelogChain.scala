package graft.stream

import graft.merge.MergeApply
import graft.table.GraftLake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Lake→lake changelog subscription (round-4 verdict #5): a downstream
  * pipeline chains off an upstream graft lake WITHOUT replaying the binlog
  * feed — the reference's whole raison d'être is exactly this subscription
  * fan-out (reference client/akkaSystem/SingleTableBinlogClientActor.java:
  * 106-142 — a client table actor applies the server's change stream into
  * its own store, resuming from its own acked position).
  *
  * [[sync]] applies one incremental window: the NET per-key changes
  * between the destination's last-applied source snapshot and the source's
  * current one ([[GraftLake.changesBetween]] — O(window) scan, never
  * O(table)), landed as one delta-append commit in the destination.
  * [[follow]] is the subscription loop: it triggers a sync whenever the
  * source log advances (one cheap `latest()` probe per poll).
  *
  * Exactly-once falls out of the same fence the ingest job uses: the
  * destination commit records `batchId = <source snapshot id>` under
  * `lineage = changelog:<source root>`, so a replayed window (crash between
  * apply and the caller's own bookkeeping, double-fired poll, restarted
  * follower) is skipped by the fence — and a crash between the data write
  * and the commit strands only orphan files that [[GraftLake.vacuum]]
  * sweeps. The destination's rows/offsets/tombstones are the source's
  * (LWW winners travel verbatim), so after any sync the destination state
  * EQUALS the source state at the synced snapshot — ChainedLakeSpec pins
  * that against a direct feed replay.
  *
  * Schema evolution rides for free: the destination adopts the source's
  * full schema-version map each sync, and window rows land stamped with
  * the source's current version (drop/rename field ids included).
  *
  * Retention bound: a follower that falls more than the source's
  * `expireKeep` snapshots behind loses its window (changesBetween needs
  * the chain) and must re-bootstrap — the same bound the reference's
  * too-old-seqId check imposes on slow subscribers (O3 analog). A fresh
  * destination bootstraps from a full source read at the current snapshot
  * (the net change from empty IS the full state, tombstones included).
  */
object ChangelogChain {

  final case class SyncResult(
      srcSnapshot: Long,
      rowsApplied: Long,
      applied: Boolean,
      bootstrapped: Boolean = false)

  def lineageFor(src: GraftLake): String = s"changelog:${src.root}"

  /** Apply everything committed in `src` since the last sync into `dst`
    * as ONE commit; no-op (fenced) when `dst` is already at or past the
    * source's current snapshot. `clientId` gates against the SOURCE
    * lake's D10 registry — a chained consumer is a subscriber like any
    * other — and heartbeats it per sync. */
  /** @param bootstrapChunkBuckets when > 0, a FRESH destination's
    *   bootstrap is applied as ceil(srcBuckets / k) bucket-range chunks,
    *   one atomic destination commit each, instead of one full-table
    *   commit (round-5 verdict #1: at 10^10 rows the one-shot bootstrap
    *   is a single transaction the sink must absorb whole, and one
    *   failure anywhere restarts all of it). Mid-bootstrap progress is
    *   recorded in the destination's own snapshot metrics
    *   (`bootstrapSrcSnap`, `bootstrapChunk`), so a crashed bootstrap
    *   resumes at the first uncommitted chunk — never re-serving
    *   completed ones — and every chunk reads the SAME pinned source
    *   snapshot (the union is row-for-row the one-shot bootstrap).
    *   0 (default) keeps the one-shot behavior.
    * @param maxBootstrapChunksPerCall cap on chunk commits per sync()
    *   call (tests use 1 to exercise the crash-resume seam — returning
    *   between chunk commits IS the crash state, each commit being
    *   atomic). Callers passing a finite cap must re-call sync() until
    *   the destination's `batchId >= 0`; [[follow]] never caps. */
  def sync(spark: SparkSession, src: GraftLake, dst: GraftLake,
      clientId: Option[String] = None,
      compactFactor: Double = 4.0, maxDeltaFiles: Int = 16,
      maxCompactBuckets: Int = 16, expireKeep: Int = 50,
      bootstrapChunkBuckets: Int = 0,
      maxBootstrapChunksPerCall: Int = Int.MaxValue): SyncResult = {
    clientId.foreach(src.checkClient)
    val srcSnap = src.latest().getOrElse(
      throw new IllegalStateException(s"source lake ${src.root} is empty"))
    clientId.foreach(src.heartbeat)
    val schema = src.currentSchema(srcSnap)
    val dstSnap = dst.latest().getOrElse(dst.init(schema))
    val lineage = lineageFor(src)
    val from: Option[Long] =
      if (Option(dstSnap.lineage).getOrElse("") == lineage && dstSnap.batchId >= 0)
        Some(dstSnap.batchId)
      else None
    // a mid-bootstrap destination: our own lineage, chunk progress in the
    // snapshot metrics (batchId stays -1 until the last chunk commits)
    val midBootstrap = from.isEmpty &&
      Option(dstSnap.lineage).getOrElse("") == lineage &&
      dstSnap.metrics.contains("bootstrapSrcSnap")
    if (from.exists(_ >= srcSnap.id)) // fence: window already applied
      return SyncResult(srcSnap.id, 0L, applied = false)
    // refuse to bootstrap ONTO foreign data: a destination populated by a
    // direct ingest (lineage = job uuid) or chained from a different source
    // would have its rows LWW-arbitrated against an unrelated offset space
    // — fail closed instead of silently producing a merged chimera
    if (from.isEmpty && dstSnap.files.nonEmpty && !midBootstrap)
      throw new IllegalStateException(
        s"destination ${dst.root} already holds data under lineage " +
          s"'${dstSnap.lineage}' (not $lineage); chain into a fresh " +
          "destination or resume the original subscription")

    // chunked bootstrap path (fresh destination or mid-bootstrap resume)
    if (from.isEmpty && (midBootstrap ||
        (bootstrapChunkBuckets > 0 && chunkCount(srcSnap, bootstrapChunkBuckets) > 1)))
      return bootstrapChunked(spark, src, dst, clientId, srcSnap, dstSnap,
        lineage, compactFactor, maxDeltaFiles, maxCompactBuckets, expireKeep,
        bootstrapChunkBuckets, maxBootstrapChunksPerCall)

    // too-old guard (reference O3, for subscribers): a follower whose
    // last-applied source snapshot has left the source's retention window
    // cannot reconstruct its change window — refuse with the remedy
    // spelled out instead of surfacing a manifest-chain internal error
    for (f <- from; floor <- src.oldestRetainedId() if f < floor)
      throw new IllegalStateException(
        s"subscription too old: destination ${dst.root} last applied " +
          s"source snapshot $f, but ${src.root} retains only ids >= " +
          s"$floor — the change window is gone; re-bootstrap into a " +
          "fresh destination (or raise the source's expireKeep)")

    // writer lease on the destination: fences the full-sweep vacuum off
    // this window's uncommitted files until the commit below lands
    dst.renewLease(lineage)

    // a fresh destination bootstraps from the full source state (the net
    // change from empty), tombstones included so late windows cannot
    // resurrect deleted keys
    val rows = from match {
      case Some(f) => src.changesBetween(spark, f, srcSnap.id)
      case None => src.read(spark, srcSnap, includeTombstones = true)
    }
    val width = GraftLake.deltaRangeWidth(dst.nBuckets)
    val shaped = rows
      .withColumn("_bucket", GraftLake.bucketExpr(dst.nBuckets))
      .select((schema.fieldNames.map(col) :+ col("_bucket")).toSeq: _*)
    val newFiles0 = dst.writeData(shaped, batchId = srcSnap.id,
      transient_ = dstSnap.files.nonEmpty || width > 1, rangeWidth = width)
    // window rows are per-key unique LWW winners, so a width-1 write into
    // an empty destination is directly base-markable
    val newFiles = newFiles0.map(_.copy(
      schemaVersion = srcSnap.schemaVersion,
      delta = !(width == 1 && dstSnap.files.isEmpty)))

    // keep destination delta debt bounded with the same fold/split plan
    // the ingest job runs (disjoint from this window's own files).
    // Tombstone GC horizon = the destination's own applied bound: per-key
    // LWW winner offsets at the source are MONOTONE (stale re-deliveries
    // are collapsed at the source before any window is cut), so no future
    // window can ever deliver a row below a tombstone the destination
    // already holds — the lower-offset-replay hazard tombstones guard
    // against cannot occur over this channel, and without a horizon a
    // delete-heavy subscription grows its tombstone set forever (the
    // destination never sees a feed-retention bound — round-5 review).
    val plan = MergeApply.compactionPlan(dstSnap.files, compactFactor,
      maxDeltaFiles, maxCompactBuckets)
    val (fold, split) = MergeApply.runPlan(spark, dst, dstSnap, plan,
      srcSnap.id, maxCompactBuckets, tombstoneHorizon = dstSnap.lastOffset)
    val consumed = MergeApply.consumedBy(plan, maxCompactBuckets) _

    val rowsApplied = newFiles.map(_.rows).sum
    val next = GraftLake.Snapshot(
      id = dstSnap.id + 1, batchId = srcSnap.id,
      schemas = srcSnap.schemas, schemaVersion = srcSnap.schemaVersion,
      files = dstSnap.files.filterNot(consumed) ++ fold.files ++ split.files ++ newFiles,
      lastOffset = srcSnap.lastOffset,
      metrics = Map("chainedRows" -> rowsApplied,
        "srcSnapshot" -> srcSnap.id,
        "compactedBuckets" -> plan.fold.size.toLong,
        "splitBuckets" -> split.buckets.size.toLong),
      parentId = dstSnap.id, lineage = lineage, nBuckets = dst.nBuckets,
      addedFiles = newFiles ++ fold.files ++ split.files,
      removedPaths = dstSnap.files.filter(consumed).map(_.path))
    dst.commit(next)
    dst.expire(expireKeep)
    // the window's files are referenced now — release eagerly so a
    // stop-then-vacuum needn't wait out the TTL (a crashed sync leaves its
    // lease to age out, which is exactly the fence stranded files need)
    dst.releaseLease(lineage)
    SyncResult(srcSnap.id, rowsApplied, applied = true, bootstrapped = from.isEmpty)
  }

  private def chunkCount(srcSnap: GraftLake.Snapshot, chunkBuckets: Int): Int = {
    val n = if (srcSnap.nBuckets > 0) srcSnap.nBuckets else 1
    if (chunkBuckets <= 0) 1
    else math.max(1, math.ceil(n.toDouble / chunkBuckets).toInt)
  }

  /** The chunked bootstrap (see [[sync]]'s scaladoc): apply the PINNED
    * source snapshot's full state as successive bucket-range chunks, one
    * atomic destination commit each, progress recorded in the
    * destination's own snapshot metrics (crash = resume at the first
    * uncommitted chunk). The chunk mapping (pinned id, chunk count) is
    * fixed by the FIRST chunk's commit and read back on resume, so an
    * option flip across a crash cannot re-map half-served chunks. */
  private def bootstrapChunked(spark: SparkSession, src: GraftLake,
      dst: GraftLake, clientId: Option[String],
      srcSnap: GraftLake.Snapshot, dstSnap: GraftLake.Snapshot,
      lineage: String, compactFactor: Double, maxDeltaFiles: Int,
      maxCompactBuckets: Int, expireKeep: Int,
      bootstrapChunkBuckets: Int, maxChunksPerCall: Int): SyncResult = {
    val resume = dstSnap.metrics.contains("bootstrapSrcSnap")
    val pinnedId =
      if (resume) dstSnap.metrics("bootstrapSrcSnap") else srcSnap.id
    val total =
      if (resume) dstSnap.metrics("bootstrapChunks").toInt
      else chunkCount(srcSnap, bootstrapChunkBuckets)
    val done0 =
      if (resume) dstSnap.metrics.getOrElse("bootstrapChunk", 0L).toInt else 0
    // O3 for the pinned snapshot: a bootstrap paused past the source's
    // retention cannot read a consistent base any more
    for (floor <- src.oldestRetainedId() if pinnedId < floor)
      throw new IllegalStateException(
        s"subscription too old: the mid-bootstrap destination ${dst.root} " +
          s"pins source snapshot $pinnedId, but ${src.root} retains only " +
          s"ids >= $floor — re-bootstrap into a fresh destination (or " +
          "raise the source's expireKeep)")
    val pinned =
      if (pinnedId == srcSnap.id) srcSnap else src.snapshotAt(pinnedId)
    val schema = src.currentSchema(pinned)
    val srcN = if (pinned.nBuckets > 0) pinned.nBuckets else 1
    val w = math.max(1, math.ceil(srcN.toDouble / total).toInt)
    val width = GraftLake.deltaRangeWidth(dst.nBuckets)
    dst.renewLease(lineage)
    var cur = dstSnap
    var rowsApplied = 0L
    var j = done0
    val until = math.min(total, done0 + math.max(1, maxChunksPerCall))
    while (j < until) {
      val buckets = (j * w until math.min((j + 1) * w, srcN)).toSet
      val rows = src.read(spark, pinned, Some(buckets),
        includeTombstones = true)
      val shaped = rows
        .withColumn("_bucket", GraftLake.bucketExpr(dst.nBuckets))
        .select((schema.fieldNames.map(col) :+ col("_bucket")).toSeq: _*)
      val files = dst.writeData(shaped, batchId = pinnedId,
        transient_ = true, rangeWidth = width)
        .map(_.copy(schemaVersion = pinned.schemaVersion, delta = true))
      val last = j == total - 1
      // the same bounded fold/split drain a normal window commit rides,
      // so a huge bootstrap keeps its delta debt bounded as it lands
      val plan = MergeApply.compactionPlan(cur.files, compactFactor,
        maxDeltaFiles, maxCompactBuckets)
      val (fold, split) = MergeApply.runPlan(spark, dst, cur, plan,
        pinnedId, maxCompactBuckets, tombstoneHorizon = None)
      val consumed = MergeApply.consumedBy(plan, maxCompactBuckets) _
      val next = GraftLake.Snapshot(
        id = cur.id + 1,
        // batchId stays -1 (the "mid-bootstrap" mark the resume and the
        // window fence both key on) until the LAST chunk commits
        batchId = if (last) pinnedId else -1L,
        schemas = pinned.schemas, schemaVersion = pinned.schemaVersion,
        files = cur.files.filterNot(consumed) ++ fold.files ++
          split.files ++ files,
        lastOffset = if (last) pinned.lastOffset else None,
        metrics = Map(
          "chainedRows" -> files.map(_.rows).sum,
          "srcSnapshot" -> pinnedId,
          "bootstrapSrcSnap" -> pinnedId,
          "bootstrapChunk" -> (j + 1).toLong,
          "bootstrapChunks" -> total.toLong,
          "compactedBuckets" -> plan.fold.size.toLong,
          "splitBuckets" -> split.buckets.size.toLong),
        parentId = cur.id, lineage = lineage, nBuckets = dst.nBuckets,
        addedFiles = files ++ fold.files ++ split.files,
        removedPaths = cur.files.filter(consumed).map(_.path))
      dst.commit(next)
      cur = next
      rowsApplied += files.map(_.rows).sum
      j += 1
    }
    dst.expire(expireKeep)
    dst.releaseLease(lineage)
    SyncResult(pinnedId, rowsApplied, applied = true, bootstrapped = true)
  }

  /** Subscription loop: trigger a [[sync]] whenever the source log has a
    * new snapshot (readStream-style incremental consumption, expressed as
    * a poll on the snapshot log — the log IS the stream). Runs until
    * `until` returns true; `onSync` observes each applied window. */
  def follow(spark: SparkSession, src: GraftLake, dst: GraftLake,
      pollMs: Long = 1000L, clientId: Option[String] = None,
      until: () => Boolean = () => false,
      onSync: SyncResult => Unit = _ => ()): Unit = {
    var lastSeen = -1L
    while (!until()) {
      val tip = src.latest().map(_.id).getOrElse(-1L)
      if (tip > lastSeen) {
        val r = sync(spark, src, dst, clientId)
        lastSeen = r.srcSnapshot
        if (r.applied) onSync(r)
      } else Thread.sleep(pollMs)
    }
  }
}
