package graft.stream

import graft.feed.{BinlogFeedGen, FeedReader}
import graft.merge.{LwwDedup, MergeApply}
import graft.model.{DdlChange, Offset, Op}
import graft.table.{GraftLake, SchemaEvolution}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Resume modes — the reference's offset negotiation (D8;
  * reference: server/akkaSystem/TableBinglogActor.java:95-116,
  * base/enums/OffsetEnum.java:13). */
sealed trait ResumeMode
object ResumeMode {
  /** start from the latest feed offset at job start (reference CONTINUE) */
  case object Continue extends ResumeMode
  /** resume from checkpoint / lake state (reference LAST_POS) */
  case object LastPos extends ResumeMode
  /** explicit replay-from offset, validated (reference FROM_POS) */
  final case class FromPos(offset: Offset) extends ResumeMode
}

/** Resume offset is older than the retained feed — the reference rejects
  * the subscription rather than silently skipping (O3;
  * server/infoPersistent/BinlogDataStorageWithLevelDB.java:262-289,
  * base/exceptions/TooOldSeqIdException.java). */
final class TooOldOffsetException(msg: String) extends RuntimeException(msg)

final case class IngestConfig(
    feedDir: String,
    lakeRoot: String,
    checkpointDir: String,
    nBuckets: Int = 32,
    /** LWW salt for the generic LwwDedup operator. The merge path itself
      * no longer consumes it: winner selection is a narrow partial-agg
      * (each hot key contributes ≤1 row per input partition before the
      * shuffle — the salting effect, without the extra stage) and the
      * final per-key reduction sees ≤2 rows/key (target ∪ winners). Kept
      * as a config so determinism tests can sweep it. */
    salt: Int = 1,
    /** reference `filterTimeChange` analog for no-op suppression (F3) */
    excludedCols: Set[String] = Set("commit"),
    /** reference `acceptEvent` analog (F2) */
    acceptOps: Set[String] = Op.rowOps.toSet,
    maxFilesPerTrigger: Int = 8,
    resumeMode: ResumeMode = ResumeMode.LastPos,
    watchedDb: String = BinlogFeedGen.WatchedDb,
    watchedTable: String = BinlogFeedGen.WatchedTable,
    /** snapshots kept by expiry (retention R1 analog) */
    expireKeep: Int = 50)

final case class BatchMetrics(
    batchId: Long,
    eventsIn: Long,
    watchedRows: Long,
    noopDrops: Long,
    dedupDrops: Long,
    applied: Long,
    ddls: Long,
    mergeLatencyMs: Long,
    affectedBuckets: Int,
    replayedSkip: Boolean,
    statsMs: Long = 0,
    countMs: Long = 0,
    writeMs: Long = 0,
    commitMs: Long = 0)

/** The CDC ingest pipeline: one microbatch = decode → filter → schema-evolve
  * → LWW dedup → MERGE → atomic snapshot commit → (engine) checkpoint.
  * The business-then-barrier ordering of the reference's Disruptor
  * (client/akkaSystem/SingleTableBinlogClientActor.java:83-91) maps to
  * "merge publishes, then offsets commit" (SURVEY.md §3.3). */
object CdcIngestJob {

  def offsetLit(o: Offset): Column = struct(
    lit(o.fileIdx).as("fileIdx"), lit(o.pos).as("pos"), lit(o.rowIdx).as("rowIdx"))

  /** min/max offsets present in the retained feed (file-pruned scan of the
    * offset column only). */
  def feedOffsetRange(spark: SparkSession, feedDir: String): (Offset, Offset) = {
    val r = FeedReader.readBatch(spark, feedDir)
      .agg(min(col("offset")).as("lo"), max(col("offset")).as("hi"))
      .collect()(0)
    def toOff(x: Any): Offset = {
      val s = x.asInstanceOf[org.apache.spark.sql.Row]
      Offset(s.getLong(0), s.getLong(1), s.getLong(2))
    }
    (toOff(r.get(0)), toOff(r.get(1)))
  }

  /** O3 guard: resuming from `from` when the feed's earliest retained file
    * is more than one file ahead means trimmed data → hard error. */
  def guardTooOld(from: Offset, feedMin: Offset): Unit =
    if (from.fileIdx + 1 < feedMin.fileIdx)
      throw new TooOldOffsetException(
        s"resume offset ${from.render} is older than the retained feed " +
        s"(earliest ${feedMin.render}) — events were trimmed")

  /** Resolve the resume mode to an optional lower-bound offset filter.
    * The feed range scan (footer-stats-cheap, but still a job) only runs
    * for modes that need it — a fresh LAST_POS start skips it. */
  def resolveStart(spark: SparkSession, cfg: IngestConfig,
      lake: GraftLake): Option[Offset] = cfg.resumeMode match {
    case ResumeMode.Continue =>
      Some(feedOffsetRange(spark, cfg.feedDir)._2) // only events > now
    case ResumeMode.FromPos(o) =>
      guardTooOld(o, feedOffsetRange(spark, cfg.feedDir)._1); Some(o)
    case ResumeMode.LastPos =>
      lake.latest().flatMap(_.lastOffset) match {
        case Some(last) => // resuming into an existing table: O3 guard
          guardTooOld(last, feedOffsetRange(spark, cfg.feedDir)._1); None
        case None => None // fresh start: nothing to guard, no scan
      }
  }

  /** Apply one (micro)batch. Returns metrics; replayed batchIds are fenced
    * and no-op (exactly-once commit). */
  def applyBatch(spark: SparkSession, lake: GraftLake, cfg: IngestConfig,
      batch: DataFrame, batchId: Long,
      fromPos: Option[Offset] = None): BatchMetrics = {
    val t0 = System.nanoTime()
    val snap = lake.latest().getOrElse(
      throw new IllegalStateException("lake not initialized"))
    if (snap.batchId >= batchId)
      return BatchMetrics(batchId, 0, 0, 0, 0, 0, 0, 0, 0, replayedSkip = true)

    def decoded(src: DataFrame): DataFrame = {
      val bounded = fromPos match {
        case Some(o) => src.filter(col("offset") > offsetLit(o))
        case None => src
      }
      FeedReader.decode(
        bounded.filter(FeedReader.watched(cfg.watchedDb, cfg.watchedTable) &&
          FeedReader.acceptOps(cfg.acceptOps)),
        cfg.excludedCols)
    }

    // PLANNING SCAN — one shuffle-free, one-output-row job over the batch
    // computing what the merge plan and lineage metrics need up front: the
    // affected bucket set, a DDL counter, no-op drops, and batch stats.
    // Design notes (each choice measured against the alternative):
    //  - only DeclarativeAggregate functions (sum/max/bit_or) — a single
    //    collect_set/collect_list would force the stage into interpreted
    //    ObjectHashAggregate (~2x the CPU of this entire scan). The bucket
    //    set is a bit_or bitmask, one long per 64 buckets; the rare DDL
    //    payloads come from a second stats-pruned scan only when the
    //    counter says any exist.
    //  - no Observations/CollectMetrics: inside `foreachBatch` the write
    //    action's QueryExecutionListener event is swallowed by the
    //    enclosing streaming execution, so `Observation.get` never
    //    resolves there (verified empirically; batch-mode writes do).
    //  - winners do NOT round-trip through the driver: a keyed variant of
    //    this scan collecting per-key winning offsets costs several
    //    driver-serial seconds per batch (row conversion + local-relation
    //    broadcast rebuild) — the winner set stays distributed as a
    //    broadcast subquery inside the merge job (MergeApply).
    val bucket = GraftLake.bucketExpr(lake.nBuckets)
    val isRow = col("op").isin(Op.rowOps: _*)
    val nWords = (lake.nBuckets + 63) / 64
    val maskAggs = (0 until nWords).map { w =>
      coalesce(bit_or(when(isRow && bucket >= w * 64 && bucket < (w + 1) * 64,
        call_function("shiftleft", lit(1L), bucket - lit(w * 64)))), lit(0L))
        .as(s"mask$w")
    }
    val planRow = decoded(batch).agg(
      count(lit(1)).as("n"),
      (Seq(
        coalesce(sum(when(isRow, 1L).otherwise(0L)), lit(0L)).as("rows"),
        max(col("offset")).as("maxOff"),
        coalesce(sum(when(isRow && col("_noop"), 1L).otherwise(0L)), lit(0L)).as("noops"),
        coalesce(sum(when(col("op") === Op.Ddl, 1L).otherwise(0L)), lit(0L)).as("nddl")
      ) ++ maskAggs): _*
    ).collect()(0)
    def toOff(r: org.apache.spark.sql.Row): Offset =
      Offset(r.getLong(0), r.getLong(1), r.getLong(2))
    val eventsIn = planRow.getLong(0)
    val watchedRows = planRow.getLong(1)
    val maxOff = Option(planRow.get(2))
      .map(r => toOff(r.asInstanceOf[org.apache.spark.sql.Row]))
    val noops = planRow.getLong(3)
    val nDdl = planRow.getLong(4)
    val affected: Set[Int] = (0 until nWords).flatMap { w =>
      val mask = planRow.getLong(5 + w)
      (0 until 64).filter(b => (mask & (1L << b)) != 0).map(_ + w * 64)
    }.toSet
    // rare path: fetch DDL payloads in stream order (op='DDL' prunes via
    // parquet row-group stats, so DDL-free batches never pay a scan here)
    val ddls: Seq[DdlChange] =
      if (nDdl == 0) Nil
      else decoded(batch)
        .filter(col("op") === Op.Ddl)
        .select(col("offset"), col("ddl"))
        .collect()
        .sortBy(r => toOff(r.getStruct(0)))
        .map(_.getStruct(1))
        .map(d => DdlChange(d.getString(0), d.getString(1), d.getString(2), d.getString(3)))
    val tStats = (System.nanoTime() - t0) / 1000000L

    // schema evolution resolved BEFORE the merge plan (SURVEY.md §4.4.7);
    // strictly additive/widening, so parsing the whole batch with the
    // evolved schema is equivalent to per-event catalog refresh.
    val curSchema = lake.currentSchema(snap)
    val newSchema = SchemaEvolution.fold(curSchema, ddls)
    val evolved = newSchema != curSchema
    val (schemas, schemaVersion) =
      if (evolved) (snap.schemas + ((snap.schemaVersion + 1).toString -> newSchema.json),
        snap.schemaVersion + 1)
      else (snap.schemas, snap.schemaVersion)
    val snapForMerge = snap.copy(schemas = schemas, schemaVersion = schemaVersion)

    // project row events to merge shape against the (possibly evolved)
    // schema. No no-op filter on this probe lineage: winners are fetched
    // by globally-unique offset and the build side excludes no-ops, so the
    // semi-join drops them for free — the probe scan never evaluates the
    // image compare and never reads before-images beyond the key fields.
    val evolvedCols = SchemaEvolution.evolvedColumns(newSchema)
    val updates = decoded(batch)
      .filter(isRow)
      .select(
        LwwDedup.keyCols.map(col) ++
        Seq(col("after.commit").as("commit"), col("after.lang").as("lang"),
          col("after.content").as("content")) ++
        evolvedCols.map(f =>
          element_at(col("extras"), f.name).cast(f.dataType).as(f.name)) ++
        Seq(col("offset"), col("op")): _*)
    // winner build side: surviving (non-noop) row events, key + offset only
    val survivors = decoded(batch)
      .filter(isRow && !col("_noop"))
      .select(col("repo"), col("path"), col("offset"))

    val result = MergeApply(spark, lake, snapForMerge, newSchema, updates,
      survivors, affected, batchId)

    // "applied" lineage metric = winner rows newly written this batch:
    // rows in the new files whose offset is beyond the pre-merge
    // `lastOffset`. For the first batch into the lake that is every row
    // (footer sums — no job); afterwards a narrow offset-column count over
    // only the new files. Re-delivered duplicates of already-applied
    // events keep their old offsets and so correctly count as 0 applied.
    val applied: Long = snap.lastOffset match {
      case None => result.rowsPerBucket.values.sum
      case _ if result.newFiles.isEmpty => 0L
      case Some(last) =>
        spark.read.parquet(result.newFiles.map(_.path): _*)
          .filter(col("_offset") > offsetLit(last))
          .count()
    }
    val latencyMs = (System.nanoTime() - t0) / 1000000L
    val tCommit0 = System.nanoTime()

    if (result.affectedBuckets.nonEmpty || evolved || maxOff.isDefined) {
      val metrics: Map[String, Long] =
        result.rowsPerBucket.map { case (b, n) => s"bucket.$b.rows" -> n } ++
        Map("eventsIn" -> eventsIn, "watchedRows" -> watchedRows,
          "noopDrops" -> noops, "dedupDrops" -> (watchedRows - noops - applied),
          "applied" -> applied, "ddls" -> nDdl, "mergeLatencyMs" -> latencyMs)
      val next = GraftLake.Snapshot(
        id = snap.id + 1, batchId = batchId,
        schemas = schemas, schemaVersion = schemaVersion,
        files = MergeApply.nextFiles(snap, result),
        lastOffset = (maxOff.toSeq ++ snap.lastOffset.toSeq)
          .sorted.lastOption,
        metrics = metrics, parentId = snap.id)
      lake.commit(next)
      lake.expire(cfg.expireKeep)
    }
    val m = BatchMetrics(batchId, eventsIn, watchedRows, noops,
      watchedRows - noops - applied, applied, nDdl, latencyMs,
      result.affectedBuckets.size, replayedSkip = false,
      statsMs = tStats, countMs = 0, writeMs = result.mergeMs,
      commitMs = (System.nanoTime() - tCommit0) / 1000000L)
    Metrics.append(lake.root, m)
    m
  }

  /** Full replay / tail as a Structured Streaming job with checkpointed
    * offsets (S1/D3/D6 analog: the checkpoint replaces both position
    * stores — SURVEY.md §1.5). */
  def runStream(spark: SparkSession, cfg: IngestConfig,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val lake = new GraftLake(cfg.lakeRoot, cfg.nBuckets)
    lake.init(graft.model.Schemas.targetBase)
    val fromPos = resolveStart(spark, cfg, lake)
    FeedReader.readStream(spark, cfg.feedDir, cfg.maxFilesPerTrigger)
      .writeStream
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) =>
        applyBatch(spark, lake, cfg, df, id, fromPos); ()
      }
      .start()
  }

  /** One-shot batch replay (whole retained feed as a single merge) — used
    * by tests and the bench's single-pass mode. */
  def replayBatch(spark: SparkSession, cfg: IngestConfig): BatchMetrics = {
    val lake = new GraftLake(cfg.lakeRoot, cfg.nBuckets)
    lake.init(graft.model.Schemas.targetBase)
    val fromPos = resolveStart(spark, cfg, lake)
    val nextBatch = lake.latest().map(_.batchId).getOrElse(-1L) + 1
    applyBatch(spark, lake, cfg, FeedReader.readBatch(spark, cfg.feedDir),
      nextBatch, fromPos)
  }
}
