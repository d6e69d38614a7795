package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Offline re-shard (GraftLake.rebucket): a growing table migrates its
  * bucket count with ONE full rewrite, and everything downstream keeps
  * working — reads are bit-identical, the changelog window crossing the
  * rebucket is empty (no row changed, only its placement), time travel
  * still serves the pre-rebucket layout, stale handles fail closed, and
  * a stream RESUMED with the new count merges the rest of the feed into
  * the re-sharded table exactly as a never-rebucketed replay would. */
class RebucketSpec extends SparkSuite {

  private def state(lake: GraftLake, s: GraftLake.Snapshot): Seq[(String, String, String, String, Boolean)] =
    lake.read(spark, s, includeTombstones = true)
      .select("repo", "path", "commit", "content", "_deleted").collect()
      .map((r: Row) => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("rebucket preserves state exactly; placement, metadata and guards " +
    "all follow the new count") {
    val feedDir = tmp("feed"); val lakeRoot = tmp("lake")
    BinlogFeedGen.writeFeed(spark, FeedConfig(
      nEvents = 4000, nKeys = 400, eventsPerFile = 500), feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp"), nBuckets = 8))
    val lake8 = new GraftLake(lakeRoot, 8)
    val before = lake8.latest().get
    val want = state(lake8, before)

    val after = lake8.rebucket(spark, 32)
    assert(after.nBuckets == 32 && after.id == before.id + 1)
    assert(after.lastOffset == before.lastOffset &&
      after.batchId == before.batchId &&
      after.lineage == before.lineage,
      "rebucket must not disturb the fence/resume metadata")

    // state is bit-identical (tombstones included) under the new layout
    val lake32 = new GraftLake(lakeRoot, 32)
    assert(state(lake32, lake32.latest().get) == want)

    // every new file is a per-bucket BASE whose rows hash to its bucket
    assert(after.files.forall(f => !f.delta && f.hi == f.bucket))
    val misplaced = lake32.read(spark, after, includeTombstones = true)
      .select(col("repo"), col("path"), GraftLake.bucketExpr(32).as("b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .filterNot { case (repo, path, b) =>
        GraftLake.bucketOf(repo, path, 32) == b
      }
    assert(misplaced.isEmpty)
    // point reads prune against the new count
    val k = want.filterNot(_._5).head
    assert(lake32.readKey(spark, lake32.latest().get, k._1, k._2).count() == 1)

    // the changelog window over the rebucket commit is EMPTY: no row
    // changed, only its placement
    assert(lake32.changesBetween(spark, before.id, after.id).isEmpty)
    // time travel to the pre-rebucket id serves the OLD layout unchanged
    assert(state(lake32, lake32.snapshotAt(before.id)) == want)

    // a stale handle (old count) fails closed instead of mis-bucketing
    val stale = new GraftLake(lakeRoot, 8)
    val e = intercept[IllegalStateException](stale.latest())
    assert(e.getMessage.contains("nBuckets"))
    assert(GraftLake.storedBuckets(lakeRoot).contains(32))
  }

  test("offline maintenance composes: optimize then rebucket between " +
    "stream sessions, and the resumed ingest is still exact") {
    val full = FeedConfig(nEvents = 6000, nKeys = 500, eventsPerFile = 500,
      dupTailFrac = 0.2, ddlAt = BinlogFeedGen.evolutionDdls(6000))
    val prefix = full.copy(nEvents = 3000,
      ddlAt = full.ddlAt.filter(_._1 < 3000))
    val feedDir = tmp("feed3"); val lakeRoot = tmp("lake3")

    // session 1: chunked replay leaves realistic delta debt behind
    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp3a"), nBuckets = 8), chunkFiles = 2)
    val idled = new GraftLake(lakeRoot, 8).latest().get

    // maintenance window, each verb in its own cold process: drain all
    // debt into key-clustered bases, then re-shard for the growth ahead
    graft.merge.MergeApply.optimize(spark, new GraftLake(lakeRoot, 8),
      maxBucketsPerCommit = 4)
    new GraftLake(lakeRoot, 8).rebucket(spark, 64)
    val maintained = new GraftLake(lakeRoot, 64).latest().get
    // the whole maintenance span is row-invisible to changelog consumers
    assert(new GraftLake(lakeRoot, 64)
      .changesBetween(spark, idled.id, maintained.id).isEmpty,
      "optimize+rebucket must report zero row changes")

    // session 2: the binlog grew; resume streaming over the maintained lake
    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp3b"), nBuckets = 64, maxFilesPerTrigger = 2))
    q.awaitTermination()

    // oracle: the same full feed replayed into a fresh never-maintained lake
    val oracleRoot = tmp("oracle3")
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, oracleRoot, tmp("cp3o"), nBuckets = 64))
    val got = new GraftLake(lakeRoot, 64)
    val ora = new GraftLake(oracleRoot, 64)
    assert(state(got, got.latest().get) == state(ora, ora.latest().get))
  }

  test("a stream resumed with the new count merges on top of the " +
    "re-sharded table exactly like an un-rebucketed replay") {
    val full = FeedConfig(nEvents = 6000, nKeys = 500, eventsPerFile = 500,
      dupTailFrac = 0.2, ddlAt = BinlogFeedGen.evolutionDdls(6000))
    val prefix = full.copy(nEvents = 3000,
      ddlAt = full.ddlAt.filter(_._1 < 3000))
    val feedDir = tmp("feed2"); val lakeRoot = tmp("lake2")

    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cpa"), nBuckets = 8))
    new GraftLake(lakeRoot, 8).rebucket(spark, 64)

    // feed grows; resume streaming against the re-sharded table
    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cpb"), nBuckets = 64, maxFilesPerTrigger = 2))
    q.awaitTermination()

    // oracle: the same full feed replayed into a fresh lake
    val oracleRoot = tmp("oracle")
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, oracleRoot, tmp("cpo"), nBuckets = 64))

    val got = new GraftLake(lakeRoot, 64)
    val ora = new GraftLake(oracleRoot, 64)
    assert(state(got, got.latest().get) == state(ora, ora.latest().get))
  }

  test("rebucket holds the writer lease across its write->commit window " +
    "and releases it on return (fences vacuum off the in-flight rewrite)") {
    val feedDir = tmp("feed4"); val lakeRoot = tmp("lake4")
    BinlogFeedGen.writeFeed(spark, FeedConfig(
      nEvents = 2000, nKeys = 300, eventsPerFile = 400), feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp4"), nBuckets = 8))
    val lake = new GraftLake(lakeRoot, 8)
    // probe the lease FILES directly (liveWriter reports one holder in
    // sort order; see OptimizeSpec's lease test for why that can shadow)
    val logDir = new java.io.File(lakeRoot, "_graft_log")
    def rebucketLease(): Option[String] =
      Option(logDir.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("lease-")).flatMap { f =>
          val enc = f.getName.stripPrefix("lease-").stripSuffix(".json")
          try Some(new String(
            java.util.Base64.getUrlDecoder.decode(enc), "UTF-8"))
          catch { case _: IllegalArgumentException => None }
        }.find(_.startsWith("rebucket-"))
    @volatile var seen: Option[String] = None
    @volatile var running = true
    val probe = new Thread(() => {
      while (running && seen.isEmpty) {
        seen = rebucketLease()
        Thread.sleep(2)
      }
    })
    probe.start()
    try lake.rebucket(spark, 32)
    finally { running = false; probe.join() }
    assert(seen.exists(_.startsWith("rebucket-")),
      s"the probe must observe rebucket's writer lease, saw $seen")
    assert(rebucketLease().isEmpty,
      "rebucket must release its lease on return")
  }
}
