package graft.stream

import graft.feed.FeedReader
import graft.model.Op
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

/** Event-time streaming operators over the change feed — the Structured
  * Streaming surface the core merge deliberately does NOT need (offset-
  * guarded idempotent merge replaces watermarking for correctness —
  * SURVEY.md §2.2), provided for the analytics consumers the reference
  * serves through handlers: windowed rollups with bounded lateness and a
  * stateful per-key changelog.
  *
  * Scale shape: both are single-shuffle streaming aggregations whose state
  * is bounded — the rollup's by watermark expiry (windows older than the
  * watermark are finalized and dropped from the state store), the
  * changelog's by key cardinality (one ~100-byte state row per live key,
  * hash-partitioned across executors). */
object EventTimeOps {

  /** Watermarked tumbling-window rollup of watched row events, append-mode:
    * a window emits exactly once, when the event-time watermark passes its
    * end (late events within `delay` still count; later ones are dropped —
    * the documented trade, vs the merge path which is never lossy). */
  def hourlyRollupStream(spark: SparkSession, feedDir: String, outDir: String,
      checkpointDir: String, delay: String = "30 seconds",
      windowLen: String = "1 minute",
      maxFilesPerTrigger: Int = 2): StreamingQuery =
    rollup(FeedReader.readStream(spark, feedDir, maxFilesPerTrigger),
      delay, windowLen)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** The windowed aggregation over pre-shaped (event_time, op) rows —
    * stream- and batch-applicable (the batch application over the same
    * feed is the test oracle). */
  def windowRollup(events: DataFrame, delay: String,
      windowLen: String): DataFrame =
    events
      .withWatermark("event_time", delay)
      .groupBy(window(col("event_time"), windowLen), col("op"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("op"), col("n"))

  /** The rollup transform over the raw feed. */
  def rollup(feed: DataFrame, delay: String, windowLen: String): DataFrame =
    windowRollup(
      feed
        .filter(FeedReader.watched() && col("op").isin(Op.rowOps: _*))
        .select(timestamp_millis(col("ts")).as("event_time"), col("op")),
      delay, windowLen)

  // ---- stateful per-key changelog (mapGroupsWithState) --------------------

  /** Input row for the stateful changelog: one decoded watched row event. */
  final case class KeyedEvent(repo: String, path: String,
      fileIdx: Long, pos: Long, rowIdx: Long, op: String, commit: String)

  /** Per-key streaming state: the current LWW winner. */
  final case class KeyState(fileIdx: Long, pos: Long, rowIdx: Long,
      commit: String, deleted: Boolean)

  /** One changelog record: emitted whenever a key's winner advances. */
  final case class StateChange(repo: String, path: String,
      fileIdx: Long, pos: Long, rowIdx: Long, commit: String,
      deleted: Boolean)

  /** The reference's handler-facing view is a per-key stream of "newest
    * state changed" callbacks (ChangeDataHandler.onEvent) — this is that
    * changelog as a KeyValueGroupedDataset.mapGroupsWithState operator:
    * per microbatch, each key folds its events in offset order against the
    * persisted winner and emits at most ONE record (the new winner) iff it
    * advanced. Re-deliveries and stale offsets fold away exactly like the
    * merge path (same O1 comparator). */
  def lwwChangelog(events: Dataset[KeyedEvent]): Dataset[StateChange] = {
    import events.sparkSession.implicits._
    def offOf(e: KeyedEvent) = (e.fileIdx, e.pos, e.rowIdx)
    def offOfS(s: KeyState) = (s.fileIdx, s.pos, s.rowIdx)
    events
      .groupByKey(e => (e.repo, e.path))
      .flatMapGroupsWithState[KeyState, StateChange](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        case ((repo, path), it, state: GroupState[KeyState]) =>
          val best = it.maxBy(offOf)
          val advanced = state.getOption.forall(s =>
            Ordering[(Long, Long, Long)].lt(offOfS(s), offOf(best)))
          if (advanced) {
            val ns = KeyState(best.fileIdx, best.pos, best.rowIdx,
              best.commit, best.op == Op.Delete)
            state.update(ns)
            Iterator.single(StateChange(repo, path, ns.fileIdx, ns.pos,
              ns.rowIdx, ns.commit, ns.deleted))
          } else Iterator.empty // re-delivery / stale offsets: fold away
      }
  }

  /** Decode the raw feed into the changelog's typed input (same F1/F2/F3
    * semantics as the merge path: watched rows only, no-ops suppressed). */
  def keyedEvents(feed: DataFrame): Dataset[KeyedEvent] = {
    import feed.sparkSession.implicits._
    FeedReader.decode(
        feed.filter(FeedReader.watched() && col("op").isin(Op.rowOps: _*)),
        excludedCols = Set("commit"))
      .filter(!col("_noop"))
      .select(col("repo"), col("path"),
        col("offset.fileIdx").as("fileIdx"), col("offset.pos").as("pos"),
        col("offset.rowIdx").as("rowIdx"), col("op"),
        coalesce(col("after.commit"), col("before.commit")).as("commit"))
      .as[KeyedEvent]
  }

  /** Streaming changelog query: update-mode in-memory sink (tests) or any
    * update-capable sink. */
  def lwwChangelogStream(spark: SparkSession, feedDir: String,
      checkpointDir: String, queryName: String,
      maxFilesPerTrigger: Int = 2): StreamingQuery =
    lwwChangelog(keyedEvents(
        FeedReader.readStream(spark, feedDir, maxFilesPerTrigger)))
      .writeStream
      .queryName(queryName)
      .format("memory")
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
}
