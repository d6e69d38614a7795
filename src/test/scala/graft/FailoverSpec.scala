package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** D9 — multi-server failover, Spark-shaped (SURVEY.md §2.1 D9): the
  * reference's client answers a dead server by re-registering every table
  * with a live one from its recorded offsets
  * (client/akkaSystem/SingleDBInsBinlogClientActor.java:117-162); the
  * Structured Streaming equivalent is restart-from-checkpoint, and
  * [[CdcIngestJob.runSupervised]] is that loop made explicit — bounded
  * consecutive-failure budget, backoff, exactly-once across retries. */
class FailoverSpec extends SparkSuite {

  val cfg: FeedConfig = FeedConfig(nEvents = 3000, nKeys = 250,
    eventsPerFile = 300, dupTailFrac = 0.2)

  /** One mid-feed parquet part file (binlog file `idx` of 10). */
  private def partFile(feedDir: String, idx: Int = 6): Path =
    Files.list(Paths.get(feedDir, f"_file=f$idx%05d")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.head

  /** Overwrite `p` PRESERVING its modification time: the generator stamps
    * feed files in binlog-rotation order and the file stream delivers by
    * mtime — a real transient IO fault corrupts bytes, not the binlog's
    * position in the rotation. (Bumping the mtime would reorder delivery
    * past the fault, which is a different — and invalid — feed.) */
  private def overwriteKeepingMtime(p: Path, bytes: Array[Byte]): Unit = {
    val mtime = Files.getLastModifiedTime(p)
    Files.write(p, bytes)
    Files.setLastModifiedTime(p, mtime)
  }

  test("the supervisor restarts a failed stream from its checkpoint and " +
    "converges to the oracle (transient feed corruption healed between " +
    "attempts)") {
    val feedDir = tmp("fo-feed"); val lakeRoot = tmp("fo-lake")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val victim = partFile(feedDir)
    val good = Files.readAllBytes(victim)
    overwriteKeepingMtime(victim, "not a parquet file".getBytes) // IO fault

    val restarts = CdcIngestJob.runSupervised(spark,
      IngestConfig(feedDir, lakeRoot, tmp("fo-cp"), nBuckets = 8,
        maxFilesPerTrigger = 1),
      maxRestarts = 5, backoffMs = 50L,
      onRestart = (_, _) => overwriteKeepingMtime(victim, good)) // heals
    assert(restarts >= 1, "the injected fault must have killed one attempt")

    val lake = new GraftLake(lakeRoot, 8)
    val got = lake.read(spark, lake.latest().get)
      .select("repo", "path", "commit", "content")
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length,
      s"rows ${got.length} != oracle ${want.length} after failover")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.repo && g.getString(1) == w.path &&
        g.getString(2) == w.commit && g.getString(3) == w.content,
        s"state diverged at ${w.repo}/${w.path} across the restart")
    }
  }

  test("multi-table: progress on ANY subscribed table resets the restart " +
    "budget — the probe must not watch only the first lake") {
    // Two subscriptions where the FIRST table never receives an event
    // (decoyFrac = 0, so the decoy spec's lake stays at its init
    // snapshot forever) and the second carries the whole feed. Two
    // transient faults, healed one per restart, force two restarts under
    // a budget of ONE consecutive unproductive attempt: the run only
    // survives because each failed attempt advanced the SECOND lake —
    // a probe that watched specs.head alone would count two consecutive
    // no-progress failures and throw (round-5 fifth review).
    import graft.stream.TableSpec
    val feedDir = tmp("fm-feed")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val victims = Seq(partFile(feedDir, 3), partFile(feedDir, 6))
    val good = victims.map(Files.readAllBytes)
    victims.foreach(overwriteKeepingMtime(_, "transient garbage".getBytes))

    var heals = 0
    val restarts = CdcIngestJob.runSupervised(spark,
      IngestConfig(feedDir, "", tmp("fm-cp"), maxFilesPerTrigger = 1,
        tables = Seq(
          // a table name the feed NEVER carries (decoyFrac > 0 gives the
          // real decoy table events, which would let even a head-only
          // probe see progress): this lake must sit at its init snapshot
          TableSpec(BinlogFeedGen.WatchedDb, "phantom_table",
            tmp("fm-lakeA"), nBuckets = 4),
          TableSpec(BinlogFeedGen.WatchedDb, BinlogFeedGen.WatchedTable,
            tmp("fm-lakeB"), nBuckets = 8))),
      maxRestarts = 1, backoffMs = 10L,
      onRestart = (_, _) => {
        overwriteKeepingMtime(victims(heals), good(heals)); heals += 1
      })
    assert(restarts == 2 && heals == 2,
      s"expected two healed restarts, got restarts=$restarts heals=$heals")

    val lakeB = new GraftLake(tmp("fm-lakeB"), 8)
    val got = lakeB.read(spark, lakeB.latest().get)
      .select("repo", "path", "commit", "content")
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length,
      s"rows ${got.length} != oracle ${want.length} after multi-table failover")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.repo && g.getString(1) == w.path &&
        g.getString(3) == w.content,
        s"state diverged at ${w.repo}/${w.path}")
    }
    val lakeA = new GraftLake(tmp("fm-lakeA"), 4)
    assert(lakeA.latest().exists(_.id == 0),
      "the event-less first lake must still sit at its init snapshot")
  }

  test("a permanently poisoned feed exhausts the consecutive-restart " +
    "budget and propagates the error instead of spinning") {
    val feedDir = tmp("fp-feed"); val lakeRoot = tmp("fp-lake")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    overwriteKeepingMtime(partFile(feedDir), "still not parquet".getBytes)
    var restartCalls = 0
    intercept[Throwable] {
      CdcIngestJob.runSupervised(spark,
        IngestConfig(feedDir, lakeRoot, tmp("fp-cp"), nBuckets = 8,
          maxFilesPerTrigger = 1),
        maxRestarts = 1, backoffMs = 10L,
        onRestart = (_, _) => restartCalls += 1)
    }
    assert(restartCalls == 1,
      s"budget of 1 must allow exactly one restart, got $restartCalls")
    // the committed prefix (files 1..5) survives intact for the next
    // (human-initiated) resume — failover never loses applied state
    val lake = new GraftLake(lakeRoot, 8)
    assert(lake.latest().exists(_.batchId >= 1),
      "the pre-fault prefix must remain committed")
  }
}
