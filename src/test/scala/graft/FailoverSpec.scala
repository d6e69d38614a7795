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

  /** One mid-feed parquet part file (binlog file 6 of 10). */
  private def partFile(feedDir: String): Path =
    Files.list(Paths.get(feedDir, "_file=f00006")).iterator().asScala
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
