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
    /** LWW salt for zipfian hot keys (1 = plain two-phase agg) */
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

    // DDL events: a separate pruned scan (the op = 'DDL' predicate pushes
    // into parquet row-group stats, so DDL-free files are skipped); kept
    // apart from the merge plan so the observation below doesn't block
    // pushdown.
    val ddls: Seq[DdlChange] = decoded(batch)
      .filter(col("op") === Op.Ddl)
      .select(col("offset"), col("ddl"))
      .collect()
      .sortBy { r =>
        val o = r.getStruct(0); (o.getLong(0), o.getLong(1), o.getLong(2))
      }
      .map(_.getStruct(1))
      .map(d => DdlChange(d.getString(0), d.getString(1), d.getString(2), d.getString(3)))
    val nDdl = ddls.size.toLong
    val tStats = (System.nanoTime() - t0) / 1000000L

    // batch statistics ride the merge pass itself (CollectMetrics — no
    // extra scan): counts + max offset observed while winners materialize.
    val obs = new org.apache.spark.sql.Observation(s"graft-batch-$batchId")
    val observed = decoded(batch).observe(obs,
      count(lit(1)).as("n"),
      coalesce(sum(when(col("op").isin(Op.rowOps: _*), 1L).otherwise(0L)), lit(0L)).as("rows"),
      coalesce(sum(when(col("_noop"), 1L).otherwise(0L)), lit(0L)).as("noops"),
      max(col("offset")).as("maxOff"))

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

    // project row events to merge shape against the (possibly evolved) schema
    val evolvedCols = SchemaEvolution.evolvedColumns(newSchema)
    val rows = observed
      .filter(col("op").isin(Op.rowOps: _*) && !col("_noop"))
    val updates = rows.select(
      LwwDedup.keyCols.map(col) ++
      Seq(col("after.commit").as("commit"), col("after.lang").as("lang"),
        col("after.content").as("content")) ++
      evolvedCols.map(f =>
        element_at(col("extras"), f.name).cast(f.dataType).as(f.name)) ++
      Seq(col("offset"), col("op")): _*)

    val result = MergeApply(spark, lake, snapForMerge, newSchema, updates,
      batchId, cfg.salt)
    // the winners action above completed → observed metrics are available.
    // Guard: when AQE collapses an all-filtered batch to an empty relation
    // the CollectMetrics node can vanish — fall back to a direct agg (the
    // batch is empty or near-empty then, so the extra pass is cheap).
    val statsRow: Map[String, Any] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val viaObs = try Await.result(Future(obs.get), 5.seconds)
        catch { case _: Throwable => Map.empty[String, Any] }
      if (viaObs.contains("n")) viaObs
      else {
        val r = decoded(batch).agg(
          count(lit(1)).as("n"),
          coalesce(sum(when(col("op").isin(Op.rowOps: _*), 1L).otherwise(0L)), lit(0L)).as("rows"),
          coalesce(sum(when(col("_noop"), 1L).otherwise(0L)), lit(0L)).as("noops"),
          max(col("offset")).as("maxOff")).collect()(0)
        Map("n" -> r.getLong(0), "rows" -> r.getLong(1),
          "noops" -> r.getLong(2), "maxOff" -> r.get(3))
      }
    }
    val eventsIn = statsRow("n").asInstanceOf[Long]
    val watchedRows = statsRow("rows").asInstanceOf[Long]
    val noops = statsRow("noops").asInstanceOf[Long]
    val maxOff = Option(statsRow("maxOff")).map { r0 =>
      val r = r0.asInstanceOf[org.apache.spark.sql.Row]
      Offset(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val applied = result.appliedPerBucket.values.sum
    val latencyMs = (System.nanoTime() - t0) / 1000000L
    val tCommit0 = System.nanoTime()

    if (result.affectedBuckets.nonEmpty || evolved || maxOff.isDefined) {
      val metrics: Map[String, Long] =
        result.appliedPerBucket.map { case (b, n) => s"bucket.$b.applied" -> n } ++
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
      statsMs = tStats, countMs = result.countMs, writeMs = result.writeMs,
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
