package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Storage-layer suite (R1 retention + the crash-between-write-and-commit
  * story — the reference's trickiest storage behavior,
  * server/infoPersistent/BinlogDataStorageWithLevelDB.java:291-352): orphan
  * data files from crashed commits are invisible to readers and collected
  * by expiry; expired snapshots stop resolving; commit ids are fenced. */
class GraftLakeSpec extends SparkSuite {

  val cfg: FeedConfig = FeedConfig(nEvents = 2000, nKeys = 150,
    eventsPerFile = 200, decoyFrac = 0.0)

  private def buildLake(lakeRoot: String, cp: String): GraftLake = {
    val feedDir = tmp("feed-" + lakeRoot.split('/').last)
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    // maxFilesPerTrigger=1 → 10 microbatches → 11 snapshots
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, cp, nBuckets = 4, maxFilesPerTrigger = 1))
    q.awaitTermination()
    new GraftLake(lakeRoot, 4)
  }

  private def snapshotFiles(root: String): Seq[String] =
    Files.list(Paths.get(root, "_graft_log")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("snapshot-")).toSeq.sorted

  test("crashed commit: orphan data files are invisible and GC'd by expiry") {
    val lakeRoot = tmp("l1")
    val lake = buildLake(lakeRoot, tmp("c1"))
    val snap = lake.latest().get
    val before = lake.read(spark, snap).orderBy("repo", "path").collect().toSeq

    // simulate a crash between writeData and commit: data files land,
    // no snapshot references them
    val orphanSrc = lake.read(spark, snap, includeTombstones = true)
      .withColumn("_bucket", GraftLake.bucketExpr(4))
    val orphans = lake.writeData(orphanSrc, batchId = 9999)
    assert(orphans.nonEmpty && orphans.forall(f => Files.exists(Paths.get(f.path))))

    // readers resolve only snapshot-referenced files — identical result
    val after = lake.read(spark, lake.latest().get)
      .orderBy("repo", "path").collect().toSeq
    assert(after == before, "orphans must be invisible to readers")

    // expiry collects the orphans (and trims old snapshots)
    lake.expire(keep = 2)
    assert(orphans.forall(f => !Files.exists(Paths.get(f.path))),
      "orphaned data files must be GC'd")
    assert(snapshotFiles(lakeRoot).size == 2)

    // the surviving snapshot still reads completely
    val finalRows = lake.read(spark, lake.latest().get)
      .orderBy("repo", "path").collect().toSeq
    assert(finalRows == before)
  }

  test("expired snapshots stop resolving; retained ones keep their files") {
    val lakeRoot = tmp("l2")
    val lake = buildLake(lakeRoot, tmp("c2"))
    val all = snapshotFiles(lakeRoot)
    assert(all.size > 3, s"fixture should commit several snapshots (got ${all.size})")
    val latestBefore = lake.latest().get
    lake.expire(keep = 3)
    val kept = snapshotFiles(lakeRoot)
    assert(kept.size == 3 && kept == all.takeRight(3))
    // latest unchanged, still fully readable
    val latest = lake.latest().get
    assert(latest.id == latestBefore.id)
    assert(latest.files.forall(f => Files.exists(Paths.get(f.path))))
    assert(lake.read(spark, latest).count() > 0)
  }

  test("lake on a file: URI — the whole commit/read/GC path runs through " +
    "the Hadoop FileSystem API") {
    val feedDir = tmp("feed-uri"); val plain = tmp("l-uri")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val lakeRoot = "file:" + plain
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, "file:" + tmp("c-uri"), nBuckets = 4,
      maxFilesPerTrigger = 3))
    q.awaitTermination()
    val lake = new GraftLake(lakeRoot, 4)
    val snap = lake.latest().get
    assert(snap.batchId >= 1 && snap.files.nonEmpty)
    // manifest paths stay scheme-free (byte-compatible with plain roots)
    assert(snap.files.forall(f => !f.path.startsWith("file:") &&
      Files.exists(Paths.get(f.path))))
    val rows = lake.read(spark, snap).count()
    assert(rows > 0)
    lake.expire(keep = 1)
    assert(lake.read(spark, lake.latest().get).count() == rows)
    assert(snapshotFiles(plain).size == 1)
  }

  test("D10 client registry: unregistered identities are rejected at " +
    "subscription start; no registry = open") {
    val feedDir = tmp("feed-d10"); val lakeRoot = tmp("l-d10")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val lake = new GraftLake(lakeRoot, 4)
    lake.init(graft.model.Schemas.targetBase)
    // open check while no registry exists (single-tenant back-compat)
    lake.checkClient("anyone")
    assert(lake.registeredClients().isEmpty)
    lake.registerClient("alice")
    lake.registerClient("bob")
    assert(lake.registeredClients() == Set("alice", "bob"))
    lake.checkClient("alice") // registered → fine
    intercept[IllegalStateException](lake.checkClient("mallory"))
    // the gate fires BEFORE the stream starts (reference rejects at
    // registration, not first delivery)
    intercept[IllegalStateException] {
      CdcIngestJob.runStream(spark, IngestConfig(
        feedDir, lakeRoot, tmp("c-d10a"), nBuckets = 4,
        clientId = Some("mallory")))
    }
    // a registered client streams normally
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("c-d10b"), nBuckets = 4,
      maxFilesPerTrigger = 5, clientId = Some("alice")))
    q.awaitTermination()
    assert(lake.read(spark, lake.latest().get).count() > 0)
  }

  test("commit ids are fenced: re-committing a snapshot id is an error") {
    val lakeRoot = tmp("l3")
    val lake = new GraftLake(lakeRoot, 4)
    val s0 = lake.init(graft.model.Schemas.targetBase)
    intercept[IllegalStateException](lake.commit(s0))
  }
}
