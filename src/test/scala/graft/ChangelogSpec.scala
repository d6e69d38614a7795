package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.model.Offset
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.Row

/** Time travel + CDC-out changelog (GraftLake.snapshotAt /
  * changesBetween): downstream consumers must be able to (a) read any
  * retained historical snapshot and (b) pull the NET per-key changes
  * between two snapshots — whose rows are, by LWW construction, exactly
  * the `toId` state's rows with offsets beyond the `fromId` state's
  * lastOffset. That identity is the oracle for every case here. */
class ChangelogSpec extends SparkSuite {

  /** (repo, path, commit, content, offset, deleted) image rows, sorted. */
  private def images(rows: Array[Row]): Seq[(String, String, String, String, Offset, Boolean)] =
    rows.map { r =>
      val o = r.getAs[Row]("_offset")
      (r.getAs[String]("repo"), r.getAs[String]("path"),
        r.getAs[String]("commit"), r.getAs[String]("content"),
        Offset(o.getLong(0), o.getLong(1), o.getLong(2)),
        r.getAs[Boolean]("_deleted"))
    }.toSeq.sortBy(t => (t._1, t._2))

  test("changesBetween = the to-state rows past the from-state's lastOffset; " +
    "snapshotAt reproduces the historical state") {
    val full = FeedConfig(nEvents = 6000, nKeys = 800, eventsPerFile = 500,
      noopFrac = 0.0, decoyFrac = 0.0)
    val prefix = full.copy(nEvents = 4000) // same deterministic prefix
    val feedDir = tmp("feed"); val lakeRoot = tmp("lake")

    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp1"), nBuckets = 8))
    val lake = new GraftLake(lakeRoot, 8)
    val snapA = lake.latest().get
    val stateA = images(lake.read(spark, snapA, includeTombstones = true).collect())

    // the binlog grows; stream the remainder (compaction riding commits)
    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp2"), nBuckets = 8, maxFilesPerTrigger = 2))
    q.awaitTermination()
    val snapB = lake.latest().get
    assert(snapB.id > snapA.id)

    // time travel: the state as of snapA's id is bit-for-bit what was read
    // when snapA was current — even though later commits compacted files
    val travelled = images(
      lake.read(spark, lake.snapshotAt(snapA.id), includeTombstones = true).collect())
    assert(travelled == stateA, "snapshotAt(A) drifted from the live read at A")

    // changelog identity: net changes over (A, B] == B-state rows whose
    // offset is beyond A's lastOffset (touched keys' winners live in the
    // window; untouched keys must NOT appear)
    val changes = images(lake.changesBetween(spark, snapA.id, snapB.id).collect())
    val aLast = snapA.lastOffset.get
    val stateB = images(lake.read(spark, snapB, includeTombstones = true).collect())
    val expected = stateB.filter(t => Offset.ordering.gt(t._5, aLast))
    assert(changes == expected,
      s"changelog rows ${changes.size} != expected ${expected.size}")
    assert(changes.nonEmpty && changes.size < stateB.size,
      "window must touch some but not all keys for this case to mean anything")
    assert(changes.exists(_._6), "feed carries deletes — net deletes must surface")

    // empty window and bad bounds
    assert(lake.changesBetween(spark, snapB.id, snapB.id).count() == 0)
    intercept[IllegalArgumentException](
      lake.changesBetween(spark, snapB.id, snapA.id))
  }

  test("changelog over RANGED delta windows (256-bucket lake): window " +
    "files include bucket-range deltas and compaction rewrites, identity " +
    "still holds") {
    val full = FeedConfig(nEvents = 8000, nKeys = 2500, eventsPerFile = 800,
      noopFrac = 0.0, decoyFrac = 0.0)
    val prefix = full.copy(nEvents = 4000)
    val feedDir = tmp("feed3"); val lakeRoot = tmp("lake3")

    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp5"), nBuckets = 256))
    val lake = new GraftLake(lakeRoot, 256)
    val snapA = lake.latest().get

    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp6"), nBuckets = 256, maxFilesPerTrigger = 1))
    q.awaitTermination()
    val snapB = lake.latest().get
    // the window must actually contain ranged deltas (and, with folds
    // riding the commits, typically compaction-rewritten bases too)
    assert(snapB.files.exists(f => f.delta && f.hi > f.bucket),
      "fixture must leave ranged delta files in the snapshot")

    val changes = images(lake.changesBetween(spark, snapA.id, snapB.id).collect())
    val aLast = snapA.lastOffset.get
    val expected = images(lake.read(spark, snapB, includeTombstones = true).collect())
      .filter(t => Offset.ordering.gt(t._5, aLast))
    assert(changes == expected,
      s"ranged-window changelog ${changes.size} rows != expected ${expected.size}")
  }

  test("changelog across schema evolution carries the evolved column for " +
    "window rows") {
    val n = 3000L
    val full = FeedConfig(nEvents = n, nKeys = 300, eventsPerFile = 300,
      noopFrac = 0.0, decoyFrac = 0.0, ddlAt = BinlogFeedGen.evolutionDdls(n))
    // prefix ends BEFORE the first DDL so the whole evolution happens
    // inside the changelog window
    val firstDdl = full.ddlAt.keys.min
    val prefix = full.copy(nEvents = firstDdl - 1, ddlAt = Map.empty)
    val feedDir = tmp("feed2"); val lakeRoot = tmp("lake2")

    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp3"), nBuckets = 8))
    val lake = new GraftLake(lakeRoot, 8)
    val snapA = lake.latest().get
    assert(snapA.schemaVersion == 0)

    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp4"), nBuckets = 8, maxFilesPerTrigger = 2))
    q.awaitTermination()
    val snapB = lake.latest().get
    assert(snapB.schemaVersion > 0, "evolution DDLs must have applied")

    val changes = lake.changesBetween(spark, snapA.id, snapB.id)
    assert(changes.columns.contains("size"),
      s"changelog must carry the evolved column (got ${changes.columns.mkString(",")})")
    // identity oracle again, on the evolved schema
    val aLast = snapA.lastOffset.get
    val got = images(changes.collect())
    val want = images(lake.read(spark, snapB, includeTombstones = true).collect())
      .filter(t => Offset.ordering.gt(t._5, aLast))
    assert(got == want, s"changelog ${got.size} rows != expected ${want.size}")
  }

  test("changelog across DROP and RENAME DDLs: window rows surface under " +
    "the renamed column, dropped columns vanish, identity holds " +
    "(round-4 verdict #4)") {
    import graft.model.DdlChange
    val n = 3000L
    val full = FeedConfig(nEvents = n, nKeys = 300, eventsPerFile = 300,
      noopFrac = 0.0, decoyFrac = 0.0,
      ddlAt = Map(
        (n * 2 / 5) -> DdlChange("add_column", "size", "", "bigint"),
        (n * 3 / 5) -> DdlChange("rename_column", "size", "", "bytes"),
        (n * 4 / 5) -> DdlChange("drop_column", "lang", "", "")))
    val firstDdl = full.ddlAt.keys.min
    val prefix = full.copy(nEvents = firstDdl - 1, ddlAt = Map.empty)
    val feedDir = tmp("feedDR"); val lakeRoot = tmp("lakeDR")

    BinlogFeedGen.writeFeed(spark, prefix, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cpDR1"), nBuckets = 8))
    val lake = new GraftLake(lakeRoot, 8)
    val snapA = lake.latest().get

    BinlogFeedGen.writeFeed(spark, full, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cpDR2"), nBuckets = 8, maxFilesPerTrigger = 1))
    q.awaitTermination()
    val snapB = lake.latest().get
    assert(snapB.schemaVersion == 3, s"three DDLs (got ${snapB.schemaVersion})")

    val changes = lake.changesBetween(spark, snapA.id, snapB.id)
    assert(changes.columns.contains("bytes") && !changes.columns.contains("size"),
      s"changelog must carry the RENAMED column (got ${changes.columns.mkString(",")})")
    assert(!changes.columns.contains("lang"), "dropped column must vanish")
    // the alias chain must have decoded pre-rename extras into `bytes`
    assert(changes.filter(changes("bytes").isNotNull).count() > 0,
      "renamed column lost its pre-rename values in the window")
    // identity oracle on the renamed/dropped schema
    val aLast = snapA.lastOffset.get
    val got = images(changes.collect())
    val want = images(lake.read(spark, snapB, includeTombstones = true).collect())
      .filter(t => Offset.ordering.gt(t._5, aLast))
    assert(got == want, s"changelog ${got.size} rows != expected ${want.size}")
  }
}
