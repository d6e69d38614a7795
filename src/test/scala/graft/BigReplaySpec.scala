package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.functions._

/** Scale-shape check for the merge's big-batch path: a one-shot replay
  * whose distinct-key count exceeds the broadcast limit must take the
  * direct shuffled LWW reduction (no winner broadcast at all) and still
  * reproduce the oracle exactly. ~1M distinct keys — far past the forced
  * limit, enough to make an accidental broadcast visibly pathological. */
class BigReplaySpec extends SparkSuite {

  test("1M-key replay over the shuffled path matches the oracle") {
    val cfg = FeedConfig(nEvents = 1200000, nKeys = 1000000,
      eventsPerFile = 150000, noopFrac = 0.0, decoyFrac = 0.0,
      contentChars = 24)
    val feedDir = tmp("feed"); val lakeRoot = tmp("lake")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val m = CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp"), nBuckets = 16,
      broadcastKeyLimit = 100000)) // 1M keys >> limit → direct path
    assert(m.applied > 0)

    val lake = new GraftLake(lakeRoot, 16)
    val got = lake.read(spark, lake.latest().get)
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        sha2(col("content"), 256).as("sha"),
        col("_offset.fileIdx").as("ofi"), col("_offset.pos").as("opo"),
        col("_offset.rowIdx").as("oro"))

    import spark.implicits._
    val want = ReplayOracle.finalState(cfg)
    val wantDf = want.map(w => (w.repo, w.path, w.commit, w.lang,
        ReplayOracle.sha256Hex(w.content), w.offsetFileIdx, w.offsetPos,
        w.offsetRowIdx))
      .toDF("repo", "path", "commit", "lang", "sha", "ofi", "opo", "oro")

    assert(got.count() == want.size)
    // distributed set equality — no million-row driver collect
    assert(got.exceptAll(wantDf).isEmpty, "engine rows not in oracle")
    assert(wantDf.exceptAll(got).isEmpty, "oracle rows not in engine")
  }
}
