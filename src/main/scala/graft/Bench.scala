package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import org.apache.spark.sql.SparkSession

/** Benchmark main. Two parts:
  *
  * 1. Headline operator queries over `SPARK_GRAFT_SF_DIR` (noop-writes so
  *    nothing is pruned by a count-only action).
  * 2. The north-rule metric: change-events/sec applied (binlog replay →
  *    lake upsert) on a deterministic zipf-skewed feed, run at TWO
  *    parallelism levels — local[8] and local[32] on identical input — as
  *    this sandbox's stand-in for N vs 4N executors. Reports throughput at
  *    both and scaling efficiency T32/(4·T8).
  *
  * Prints ONE JSON line: {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val headline = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "cdc_lww_latest", "cdc_final_state", "cdc_noop_suppress",
    "cdc_asof_last_click", "cdc_hourly_rollup",
    "dedup_exact", "minhash_signature", "dedup_simhash", "doc_fingerprint",
    "text_quality", "token_count", "embed_cosine_topk", "embed_ann_lsh",
    "mm_binary_meta")

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** CDC replay at a given parallelism on a shared pre-generated feed. */
  private def cdcReplay(cpus: Int, feedDir: String, nEvents: Long): Double = {
    val spark = session(cpus)
    val base = java.nio.file.Files.createTempDirectory(s"graft-bench-$cpus-").toString
    val sec = time {
      val q = CdcIngestJob.runStream(spark, IngestConfig(
        feedDir, s"$base/lake", s"$base/cp",
        nBuckets = 64, salt = if (cpus >= 16) 8 else 4,
        maxFilesPerTrigger = 32))
      q.awaitTermination()
    }
    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
    sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong

    // part 1: headline queries at full parallelism
    val spark0 = session(cpus)
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val sec = try time {
        fn(spark0, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => -1.0 }
      name -> sec
    }

    // part 2: CDC replay scaling (shared deterministic zipf-skewed feed)
    val feedDir = s"/tmp/graft-bench-feed-$nEvents"
    val marker = new java.io.File(feedDir, "_SUCCESS")
    val cfg = FeedConfig(nEvents = nEvents, nKeys = 200000,
      eventsPerFile = nEvents.toInt / 64, skew = 0.2, noopFrac = 0.05,
      decoyFrac = 0.02, contentChars = 160)
    if (!marker.exists()) BinlogFeedGen.writeFeed(spark0, cfg, feedDir)
    spark0.stop()

    // JIT/codegen warmup at small scale so neither timed run pays it
    val warmDir = s"/tmp/graft-bench-feed-warm"
    if (!new java.io.File(warmDir, "_SUCCESS").exists()) {
      val sw = session(8)
      BinlogFeedGen.writeFeed(sw, cfg.copy(nEvents = 50000,
        eventsPerFile = 50000 / 8, nKeys = 10000), warmDir)
      sw.stop()
    }
    cdcReplay(8, warmDir, 50000)
    cdcReplay(32, warmDir, 50000)

    val t8 = cdcReplay(8, feedDir, nEvents)
    val t32 = cdcReplay(32, feedDir, nEvents)
    val eps8 = nEvents / t8
    val eps32 = nEvents / t32
    val eff = eps32 / (4.0 * eps8)

    val qs = (results ++ Seq(
      "cdc_replay_p8" -> t8, "cdc_replay_p32" -> t32))
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum + t8 + t32
    println(
      f"""{"metric":"change-events/sec applied (replay->upsert) @local[32]","value":$eps32%.1f,"unit":"events/sec","total_sec":$total%.2f,"events":$nEvents,"events_per_sec_p8":$eps8%.1f,"events_per_sec_p32":$eps32%.1f,"scaling_efficiency":$eff%.3f,"queries":$qs,"sf":"$sfDir"}""")
  }
}
