package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.merge.MergeApply
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import graft.table.GraftLake.FileEntry
import org.apache.spark.sql.functions._

/** Bucket-RANGED delta files (round 4): past 64 buckets a per-bucket delta
  * write costs O(nBuckets) files per microbatch — 4096+ tiny files per ~1s
  * commit at the north rule's bucket counts. Deltas now land as contiguous
  * bucket-range files (width = GraftLake.deltaRangeWidth(nBuckets)), so
  * per-commit file count is O(nBuckets/width) while base files stay
  * per-bucket (fold units and read pruning keep bucket granularity) and
  * compaction folds whole ranges so file removal stays atomic. */
class RangedDeltaSpec extends SparkSuite {

  test("deltaRangeWidth: 1 below 64 buckets, then scales, fold-budget capped") {
    assert(GraftLake.deltaRangeWidth(8) == 1)
    assert(GraftLake.deltaRangeWidth(64) == 1)
    assert(GraftLake.deltaRangeWidth(256) == 4)
    assert(GraftLake.deltaRangeWidth(4096) == 16)  // capped at fold budget
    assert(GraftLake.deltaRangeWidth(65536) == 16) // never exceeds it
  }

  test("256-bucket stream writes O(nBuckets/width) delta files per commit; " +
    "range folds fire; final state stays sha-exact") {
    val cfg = FeedConfig(nEvents = 12000, nKeys = 4000, eventsPerFile = 1200,
      noopFrac = 0.0, decoyFrac = 0.0)
    val feedDir = tmp("feed"); val lakeRoot = tmp("lake")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("cp"), nBuckets = 256, maxFilesPerTrigger = 1))
    q.awaitTermination()

    val lake = new GraftLake(lakeRoot, 256)
    val snap = lake.latest().get
    val width = GraftLake.deltaRangeWidth(256)
    val (deltas, bases) = snap.files.partition(_.delta)
    // with 4000 keys every batch touches ~all 256 buckets — per-commit
    // delta file count must be the RANGE count, not the bucket count
    deltas.foreach { f =>
      assert(f.hi - f.bucket + 1 == width, s"delta $f not width-$width")
      assert(f.bucket % width == 0, s"delta $f range not aligned")
    }
    assert(bases.forall(f => f.hi == f.bucket), "base files must be per-bucket")
    // per-commit delta file count is bounded by the RANGE count
    deltas.groupBy(_.path.split("/commit-")(1).takeWhile(_ != '-'))
      .foreach { case (bid, fs) =>
        assert(fs.size <= 256 / width,
          s"commit $bid wrote ${fs.size} delta files > ${256 / width} ranges")
      }
    // lineage: no applying commit may have added more delta files than
    // nBuckets/width (the whole point), despite touching ~256 buckets
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(lakeRoot, "_metrics.jsonl"))
      .asScala.toSeq
    import spark.implicits._
    val ms = spark.read.json(lines.toDS).filter(col("rowsWritten") > 0).collect()
    assert(ms.forall(_.getAs[Long]("affectedBuckets") > 200),
      "fixture must touch ~all buckets per batch for the bound to bite")
    assert(ms.nonEmpty && ms.exists(_.getAs[Long]("compactedBuckets") > 0),
      "range compaction never fired")

    // exactness: merge-on-read across ranged deltas + range folds
    val got = lake.read(spark, snap)
      .withColumn("sha", sha2(col("content"), 256))
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length, s"rows ${got.length} != oracle ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[String]("repo") == w.repo && g.getAs[String]("path") == w.path)
      assert(g.getAs[String]("sha") == ReplayOracle.sha256Hex(w.content))
    }

    // bucket-subset read slices stray rows out of range files: one bucket's
    // read == the full read restricted to keys hashing to that bucket
    val b = snap.files.filter(_.delta).head.bucket + 1 // inside a range
    val sub = lake.read(spark, snap, Some(Set(b)))
      .orderBy("repo", "path").collect()
    val full = lake.read(spark, snap)
      .filter(pmod(hash(col("repo"), col("path")), lit(256)) === b)
      .orderBy("repo", "path").collect()
    assert(sub.map(_.toString).toSeq == full.map(_.toString).toSeq,
      s"bucket-$b subset read drifted from the full read's slice " +
        s"(${sub.length} vs ${full.length} rows)")
  }

  test("compactionDue folds whole ranges (overlap closure), worst debt " +
    "first, within the bucket budget") {
    def d(lo: Int, hi: Int, rows: Long) =
      FileEntry(s"d-$lo-$hi", lo, 0, rows, delta = true, bucketHi = hi)
    def b(bk: Int, rows: Long) = FileEntry(s"b-$bk", bk, 0, rows)
    // two width-4 ranges with debt, one without; a legacy width-1 delta
    // overlapping the due range must pull nothing extra (it IS inside)
    val files = Seq(
      b(0, 100), b(1, 100), b(2, 100), b(3, 100), d(0, 3, 5000), d(2, 2, 10),
      b(4, 100), b(5, 100), b(6, 100), b(7, 100), d(4, 7, 900),
      b(8, 100), b(9, 100), b(10, 100), b(11, 100), d(8, 11, 10))
    val due = MergeApply.compactionDue(files, compactFactor = 1.0,
      maxDeltaFiles = 100, maxBuckets = 6)
    // worst range [0,3] (5010 rows incl. the width-1 delta) fits; [4,7]
    // (900 > 400 base) would fit a 8-budget but not the remaining 2;
    // [8,11] is under factor — not due at all
    assert(due == Set(0, 1, 2, 3), s"got $due")
    // a stray width-1 delta OUTSIDE the picked range with its own debt:
    // budget admits it independently
    val due2 = MergeApply.compactionDue(files :+ d(12, 12, 999),
      compactFactor = 1.0, maxDeltaFiles = 100, maxBuckets = 6)
    assert(due2 == Set(0, 1, 2, 3, 12), s"got $due2")
    // closure: force-pick a range whose width exceeds the budget via a
    // width-1 file overlapping it — the whole range must come along
    val mixed = Seq(b(0, 1), d(0, 7, 50), d(3, 3, 5000))
    val due3 = MergeApply.compactionDue(mixed, compactFactor = 1e9,
      maxDeltaFiles = 2, maxBuckets = 1)
    assert(due3 == Set(0, 1, 2, 3, 4, 5, 6, 7), s"got $due3")
  }
}
