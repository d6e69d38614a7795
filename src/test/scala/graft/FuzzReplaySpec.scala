package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.functions._

/** Randomized differential replay: the pinned ReplaySpec fixtures cover a
  * handful of hand-chosen configs; this spec drives SEEDED-random points
  * of the whole generator space (skew, no-op/decoy/dup fractions, file
  * sizing, bucket counts, batch vs microbatch, add/widen evolution)
  * through the engine and asserts row-for-row equality — content sha256
  * included — against the offset-order fold oracle. Seeds are fixed, so
  * failures reproduce; the point is coverage of INTERACTIONS (e.g. skewed
  * hot keys × duplicate tail files × mid-feed DDL × 2 buckets) that no
  * single pinned fixture exercises. */
class FuzzReplaySpec extends SparkSuite {

  private def randomCfg(rnd: scala.util.Random): FeedConfig = {
    val nEvents = 1500L + rnd.nextInt(2500)
    FeedConfig(
      nEvents = nEvents,
      nKeys = 80 + rnd.nextInt(350),
      seed = rnd.nextLong(),
      eventsPerFile = 200 + rnd.nextInt(600),
      skew = rnd.nextDouble() * 0.5,
      nHotKeys = 2 + rnd.nextInt(6),
      noopFrac = rnd.nextDouble() * 0.35,
      decoyFrac = rnd.nextDouble() * 0.10,
      dupTailFrac = rnd.nextDouble() * 0.40,
      ddlAt = if (rnd.nextBoolean()) BinlogFeedGen.evolutionDdls(nEvents)
              else Map.empty,
      contentChars = 80 + rnd.nextInt(240))
  }

  private def assertMatchesOracle(lakeRoot: String, cfg: FeedConfig,
      nBuckets: Int, label: String): Unit = {
    val lake = new GraftLake(lakeRoot, nBuckets)
    val snap = lake.latest().get
    val evolved = cfg.ddlAt.nonEmpty
    val base = lake.read(spark, snap)
      .withColumn("sha", sha2(col("content"), 256))
    val got = (if (evolved) base else base.withColumn("size", lit(null)))
      .select("repo", "path", "commit", "lang", "content", "sha", "size",
        "_offset")
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length,
      s"$label: row count ${got.length} != oracle ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      val key = s"${w.repo}/${w.path}"
      assert(g.getString(0) == w.repo && g.getString(1) == w.path,
        s"$label: key mismatch ${g.getString(0)}/${g.getString(1)} vs $key")
      assert(g.getString(2) == w.commit, s"$label: commit mismatch at $key")
      assert(g.getString(3) == w.lang, s"$label: lang mismatch at $key")
      assert(g.getString(4) == w.content, s"$label: content mismatch at $key")
      assert(g.getString(5) == ReplayOracle.sha256Hex(w.content),
        s"$label: sha256 mismatch at $key")
      if (evolved) {
        val gotSize = if (g.isNullAt(6)) None else Some(g.getLong(6))
        assert(gotSize == w.size, s"$label: evolved size $gotSize != " +
          s"oracle ${w.size} at $key")
      }
      val off = g.getAs[org.apache.spark.sql.Row]("_offset")
      assert((off.getLong(0), off.getLong(1), off.getLong(2)) ==
        ((w.offsetFileIdx, w.offsetPos, w.offsetRowIdx)),
        s"$label: offset mismatch at $key")
    }
  }

  test("6 seeded-random generator-space points replay to oracle equality " +
    "(4 batch, 2 microbatched), random bucket counts") {
    val rnd = new scala.util.Random(20260819L)
    (0 until 6).foreach { i =>
      val cfg = randomCfg(rnd)
      val nBuckets = 1 << (1 + rnd.nextInt(5)) // 2..32
      val streamMode = i >= 4
      val label = s"fuzz#$i(seed=${cfg.seed},events=${cfg.nEvents}," +
        s"keys=${cfg.nKeys},skew=${"%.2f".format(cfg.skew)}," +
        s"dup=${"%.2f".format(cfg.dupTailFrac)},ddl=${cfg.ddlAt.nonEmpty}," +
        s"buckets=$nBuckets,stream=$streamMode)"
      val feedDir = tmp(s"fz-feed$i"); val lakeRoot = tmp(s"fz-lake$i")
      BinlogFeedGen.writeFeed(spark, cfg, feedDir)
      val icfg = IngestConfig(feedDir, lakeRoot, tmp(s"fz-cp$i"),
        nBuckets = nBuckets, salt = i,
        maxFilesPerTrigger = 1 + rnd.nextInt(4))
      if (streamMode) CdcIngestJob.runStream(spark, icfg).awaitTermination()
      else CdcIngestJob.replayBatch(spark, icfg)
      assertMatchesOracle(lakeRoot, cfg, nBuckets, label)
    }
  }
}
