package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.EventTimeOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming event-time suite: watermarked windowed aggregation (append
  * emits once per finalized window; late-beyond-watermark events drop) and
  * the flatMapGroupsWithState per-key LWW changelog vs the replay oracle. */
class EventTimeSpec extends SparkSuite {

  test("watermarked rollup: finalized windows match the batch rollup, emitted once") {
    val cfg = FeedConfig(nEvents = 3000, nKeys = 200, eventsPerFile = 500,
      decoyFrac = 0.05)
    val feedDir = tmp("f1"); val out = tmp("out1"); val cp = tmp("c1")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val q = EventTimeOps.hourlyRollupStream(spark, feedDir, out, cp,
      delay = "5 seconds", windowLen = "10 seconds")
    q.awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty, "watermark must finalize early windows")
    assert(got.map(g => (g._1, g._2)).distinct.length == got.length,
      "append mode: every (window, op) emitted exactly once")
    // every emitted row must equal the batch ground truth for its window
    val want = EventTimeOps.rollup(
        graft.feed.FeedReader.readBatch(spark, feedDir),
        delay = "5 seconds", windowLen = "10 seconds")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
      .toMap
    got.foreach { case (w, op, n) =>
      assert(want.get((w, op)).contains(n), s"window $w/$op: $n vs ${want.get((w, op))}")
    }
    // restart on the same checkpoint with no new data → no duplicate emits
    val q2 = EventTimeOps.hourlyRollupStream(spark, feedDir, out, cp,
      delay = "5 seconds", windowLen = "10 seconds")
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == got.length)
  }

  test("late events beyond the watermark are dropped; within it, counted") {
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, String)](spark)
    val df = ms.toDF().toDF("event_time", "op")
    val agg = EventTimeOps.windowRollup(df, delay = "10 seconds",
      windowLen = "10 seconds")
    val q = agg.writeStream.format("memory").queryName("late_rollup")
      .outputMode("append").start()
    def t(s: Long) = new Timestamp(s * 1000L)
    // batch 1: window [0,10) gets 2 events; max event time 35s
    ms.addData((t(2), "U"), (t(5), "U"), (t(35), "U"))
    q.processAllAvailable() // watermark after batch → 35-10 = 25s
    // batch 2: t(3) is BELOW the 25s watermark → dropped; t(28) is above
    // it → counted; t(60) advances the clock. [0,10) (end 10 <= 25)
    // finalizes THIS batch with n=2 — without the late event.
    ms.addData((t(3), "U"), (t(28), "U"), (t(60), "U"))
    q.processAllAvailable() // watermark → 50s
    // batch 3: advance once more so [20,30) and [30,40) (ends <= 50) emit
    ms.addData((t(70), "U"))
    q.processAllAvailable()
    val rows = spark.table("late_rollup")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getLong(2))).toMap
    q.stop()
    assert(rows(0L) == 2L, s"late event must not reach the finalized [0,10) window: $rows")
    assert(rows(20L) == 1L && rows(30L) == 1L, s"in-time windows finalize: $rows")
  }

  test("flatMapGroupsWithState LWW changelog converges to the oracle state") {
    val cfg = FeedConfig(nEvents = 3000, nKeys = 220, eventsPerFile = 300,
      noopFrac = 0.06, decoyFrac = 0.05, dupTailFrac = 0.2)
    val feedDir = tmp("f2")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val q = EventTimeOps.lwwChangelogStream(spark, feedDir, tmp("c2"),
      queryName = "lww_changelog", maxFilesPerTrigger = 2)
    q.awaitTermination()
    // latest emission per key = the key's final state
    val lastPerKey = spark.table("lww_changelog")
      .groupBy("repo", "path")
      .agg(max_by(struct(col("fileIdx"), col("pos"), col("rowIdx"),
        col("commit"), col("deleted")),
        struct(col("fileIdx"), col("pos"), col("rowIdx"))).as("s"))
      .select(col("repo"), col("path"), col("s.commit").as("commit"),
        col("s.deleted").as("deleted"),
        col("s.fileIdx"), col("s.pos"), col("s.rowIdx"))
      .collect()
    val live = lastPerKey.filter(!_.getAs[Boolean]("deleted"))
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val want = ReplayOracle.finalState(cfg)
    assert(live.size == want.size,
      s"live keys ${live.size} != oracle ${want.size}")
    want.foreach { w =>
      val g = live((w.repo, w.path))
      assert(g == ((w.commit, w.offsetFileIdx, w.offsetPos, w.offsetRowIdx)),
        s"changelog final state mismatch at ${w.repo}/${w.path}")
    }
    // deleted finals are exactly the keys absent from the oracle
    val deletedKeys = lastPerKey.filter(_.getAs[Boolean]("deleted"))
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(deletedKeys.intersect(want.map(w => (w.repo, w.path)).toSet).isEmpty)
  }
}
