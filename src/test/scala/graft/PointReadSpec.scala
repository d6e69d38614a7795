package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.functions._

/** Point lookup (GraftLake.readKey — the LevelDB point-seek analog):
  * the read must (a) agree row-for-row with filtering the full table
  * scan, including absent and tombstoned keys, and (b) PLAN only the
  * files whose bucket range covers the key's bucket — the property that
  * makes a single-key read O(range files) instead of O(table) at 100 TB.
  * 256 buckets force bucket-RANGE delta/base files (width > 1), so the
  * stray-row slice path is exercised, not just per-bucket files. */
class PointReadSpec extends SparkSuite {

  private val nBuckets = 256

  private lazy val lakeRoot: String = {
    val feedDir = tmp("feed")
    BinlogFeedGen.writeFeed(spark, FeedConfig(
      nEvents = 4000, nKeys = 500, eventsPerFile = 500,
      noopFrac = 0.05, decoyFrac = 0.02), feedDir)
    val root = tmp("lake")
    CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, root, tmp("cp"), nBuckets = nBuckets))
    root
  }

  test("bucketOf (driver-side fold) matches bucketExpr (the write path)") {
    val lake = new GraftLake(lakeRoot, nBuckets)
    val snap = lake.latest().get
    val keyed = lake.read(spark, snap)
      .select(col("repo"), col("path"),
        GraftLake.bucketExpr(nBuckets).as("b"))
      .collect()
    assert(keyed.nonEmpty)
    keyed.foreach { r =>
      assert(GraftLake.bucketOf(r.getString(0), r.getString(1), nBuckets)
        == r.getInt(2))
    }
    // multiple buckets actually in play, or the suite proves nothing
    assert(keyed.map(_.getInt(2)).distinct.length > 10)
  }

  test("readKey == full-scan filter for live, tombstoned and absent keys") {
    val lake = new GraftLake(lakeRoot, nBuckets)
    val snap = lake.latest().get
    val all = lake.read(spark, snap, includeTombstones = true)
      .select("repo", "path", "commit", "_deleted").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    val live = all.filter(!_._4).take(5)
    val dead = all.filter(_._4).take(2)
    assert(live.nonEmpty && dead.nonEmpty)

    live.foreach { case (repo, path, commit, _) =>
      val got = lake.readKey(spark, snap, repo, path).collect()
      assert(got.length == 1, s"$repo/$path")
      assert(got(0).getAs[String]("commit") == commit)
    }
    // tombstoned keys read as absent (the default read drops tombstones)
    dead.foreach { case (repo, path, _, _) =>
      assert(lake.readKey(spark, snap, repo, path).isEmpty, s"$repo/$path")
    }
    assert(lake.readKey(spark, snap, "no-such-repo", "no/such/path").isEmpty)
  }

  test("readKey plans ONLY files covering the key's bucket range") {
    val lake = new GraftLake(lakeRoot, nBuckets)
    val snap = lake.latest().get
    def norm(p: String) = p.replaceFirst("^file:/*", "/")
    val (repo, path) = {
      val r = lake.read(spark, snap).select("repo", "path").head()
      (r.getString(0), r.getString(1))
    }
    val b = GraftLake.bucketOf(repo, path, nBuckets)
    val covering = snap.files.filter(_.covers(b)).map(f => norm(f.path)).toSet
    val planned = lake.readKey(spark, snap, repo, path)
      .inputFiles.map(norm).toSet
    assert(planned.nonEmpty && planned.subsetOf(covering),
      s"planned files outside the key's bucket range: ${planned -- covering}")
    // the pruning is real: the table spans many ranges, the plan one
    assert(snap.files.size > covering.size,
      "fixture degenerate: every file covers the probed bucket")
  }
}
