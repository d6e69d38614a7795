package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.merge.MergeApply
import graft.model.DdlChange
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake

/** Crash/maintenance lifecycle fuzz: seeded-random feeds are streamed with
  * HARD kills at random microbatch thresholds, a maintenance verb
  * (optimize / expire / forced vacuum / rebucket) runs against the
  * half-ingested lake between restarts, and the resumed stream must still
  * converge to the oracle state row-for-row (sha256 and winner offsets
  * included). ExactlyOnceSpec pins ONE kill at one fixed point with no
  * maintenance in between; this drives the recovery path through the
  * interactions an operator actually produces — a vacuum that sweeps a
  * killed batch's uncommitted strands, an expire that trims history below
  * the crash point, a fold or a bucket-count migration committed between
  * two halves of one checkpointed stream, and a kill landing ON the DDL
  * batch of a full add/widen/rename/drop feed. */
class FuzzCrashSpec extends SparkSuite {

  private def randomCfg(rnd: scala.util.Random, withDdl: Boolean): FeedConfig = {
    val nEvents = 2000L + rnd.nextInt(2000)
    FeedConfig(
      nEvents = nEvents,
      nKeys = 100 + rnd.nextInt(300),
      seed = rnd.nextLong(),
      eventsPerFile = 200 + rnd.nextInt(200),
      skew = rnd.nextDouble() * 0.4,
      nHotKeys = 2 + rnd.nextInt(4),
      noopFrac = rnd.nextDouble() * 0.25,
      decoyFrac = rnd.nextDouble() * 0.10,
      dupTailFrac = rnd.nextDouble() * 0.35,
      ddlAt = if (withDdl) BinlogFeedGen.evolutionDdls(nEvents) else Map.empty,
      contentChars = 80 + rnd.nextInt(160))
  }

  /** Stream until the lake's committed batchId reaches `threshold` (or the
    * feed runs out), hard-stop, run `verb` against the stopped lake, repeat
    * per kill, then run to completion. Returns the final bucket count (a
    * rebucket verb migrates it mid-lifecycle). */
  private def runLifecycle(i: Int, cfg: FeedConfig, nb0: Int,
      kills: Seq[(Long, String)], label: String): Int = {
    val feedDir = tmp(s"cf-feed$i"); val lakeRoot = tmp(s"cf-lake$i")
    val cp = tmp(s"cf-cp$i")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    var nb = nb0
    kills.foreach { case (threshold, verb) =>
      val q = CdcIngestJob.runStream(spark, IngestConfig(feedDir, lakeRoot,
        cp, nBuckets = nb, maxFilesPerTrigger = 1))
      var spins = 0
      while (q.isActive && spins < 600 &&
          new GraftLake(lakeRoot, nb).latest().forall(_.batchId < threshold)) {
        Thread.sleep(100); spins += 1
      }
      q.stop() // hard kill, possibly mid-batch
      val lake = new GraftLake(lakeRoot, nb)
      assert(lake.latest().nonEmpty, s"$label: no commit before kill@$threshold")
      verb match {
        case "optimize" =>
          MergeApply.optimize(spark, lake, maxBucketsPerCommit = 8); ()
        case "expire" => lake.expire(2)
        case "vacuum" =>
          // the killed stream's writer lease is still fresh; ttl 0 forces
          // the sweep — safe (no batch in flight) and exactly the recovery
          // an operator performs after a crashed job, so the resumed
          // stream must reprocess whatever uncommitted strands it deletes
          lake.vacuum(leaseTtlMs = 0L)
        case "rebucket" => lake.rebucket(spark, nb * 4); nb *= 4
        case "none" =>
      }
    }
    val qf = CdcIngestJob.runStream(spark, IngestConfig(feedDir, lakeRoot,
      cp, nBuckets = nb, maxFilesPerTrigger = 2))
    qf.awaitTermination()
    nb
  }

  test("4 seeded crash/maintenance lifecycles (kill -> optimize | " +
    "expire+vacuum | ddl-batch kill | rebucket -> resume) converge to the " +
    "oracle") {
    val rnd = new scala.util.Random(fuzzSeed(20260820L))

    // point 0: plain feed, one kill, a mid-lifecycle offline fold
    val c0 = randomCfg(rnd, withDdl = false)
    val l0 = s"crash#0(seed=${c0.seed},events=${c0.nEvents})"
    val nb0 = runLifecycle(0, c0, 8, Seq((1L + rnd.nextInt(2), "optimize")), l0)
    OracleAsserts.assertMatchesOracle(spark, tmp("cf-lake0"), c0, nb0, l0)

    // point 1: add/widen evolution, two kills, retention trim below the
    // crash point then a forced orphan sweep
    val c1 = randomCfg(rnd, withDdl = true)
    val l1 = s"crash#1(seed=${c1.seed},events=${c1.nEvents},ddl=true)"
    val nb1 = runLifecycle(1, c1, 8,
      Seq((1L, "expire"), (3L + rnd.nextInt(2), "vacuum")), l1)
    OracleAsserts.assertMatchesOracle(spark, tmp("cf-lake1"), c1, nb1, l1)

    // point 2: full DDL surface, the kill aimed AT the add-column batch
    // (file index of the DDL event; 1 file per trigger => batchId ~ fileIdx)
    val base2 = randomCfg(rnd, withDdl = false)
    val positions = {
      val s = scala.collection.mutable.SortedSet.empty[Long]
      while (s.size < 4)
        s += 1L + Math.floorMod(rnd.nextLong(), base2.nEvents - 2)
      s.toVector
    }
    val c2 = base2.copy(ddlAt = Map(
      positions(0) -> DdlChange("add_column", "size", "", "int"),
      positions(1) -> DdlChange("widen_type", "size", "int", "bigint"),
      positions(2) -> DdlChange("rename_column", "size", "", "bytes"),
      positions(3) -> DdlChange("drop_column", "lang", "", "")))
    val ddlBatch = math.max(1L, positions(0) / c2.eventsPerFile)
    val l2 = s"crash#2(seed=${c2.seed},events=${c2.nEvents}," +
      s"killAtDdlBatch=$ddlBatch)"
    val nb2 = runLifecycle(2, c2, 8, Seq((ddlBatch, "none")), l2)
    OracleAsserts.assertMatchesOracle(spark, tmp("cf-lake2"), c2, nb2, l2,
      fullDdl = true)

    // point 3: plain feed, kill then a bucket-count migration; the resumed
    // stream merges the rest of the feed under the NEW count
    val c3 = randomCfg(rnd, withDdl = false)
    val l3 = s"crash#3(seed=${c3.seed},events=${c3.nEvents},rebucket 8->32)"
    val nb3 = runLifecycle(3, c3, 8, Seq((2L, "rebucket")), l3)
    assert(nb3 == 32, l3)
    OracleAsserts.assertMatchesOracle(spark, tmp("cf-lake3"), c3, nb3, l3)
  }
}
