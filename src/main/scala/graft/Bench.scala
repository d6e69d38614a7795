package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Two parts:
  *
  * 1. Headline operator queries over `SPARK_GRAFT_SF_DIR` (noop-writes so
  *    nothing is pruned by a count-only action).
  * 2. The north-rule metric: change-events/sec applied (binlog replay →
  *    lake upsert) on a deterministic zipf-skewed feed, run at FOUR
  *    parallelism levels — local[4]/local[16] and local[8]/local[32] on
  *    identical input — as this sandbox's stand-in for N vs 4N executors.
  *    Runs are interleaved and the minimum per level is reported (the
  *    host is a shared VM with bursty neighbor steal; min-of-N is the
  *    least-noise estimator). A pure-CPU control job at the same levels
  *    separates harness/VM scaling from the engine's memory-bound share:
  *    on one socket all threads share LLC + memory bandwidth, which a
  *    real N→4N-executor cluster does not (per-executor bandwidth is
  *    constant there) — see BASELINE.md for the full protocol.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  private def session(cpus: Int, aqe: Boolean = true): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
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

  /** CDC replay at a given parallelism on a shared pre-generated feed.
    * AQE off: the merge's plan shapes are explicit (broadcast winners,
    * partition counts), so adaptive re-planning only adds per-stage
    * materialization barriers (~2s/batch measured). */
  private def cdcReplay(cpus: Int, feedDir: String): Double = {
    val spark = session(cpus, aqe = false)
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"graft-bench-$cpus-").toString
    val sec = time {
      CdcIngestJob.replayBatch(spark, IngestConfig(
        feedDir, s"$base/lake", s"$base/cp", nBuckets = 64))
    }
    spark.stop()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(base))
    sec
  }

  /** Pure-CPU control: same harness, no table IO — isolates how far the
    * box itself scales when memory traffic is negligible. */
  private def cpuControl(cpus: Int): Double = {
    val spark = session(cpus)
    import spark.implicits._
    val sec = time {
      spark.range(0, 64L * 300000, 1, 64).as[Long]
        .select(sum(xxhash64(sha2(concat_ws("-", col("id"), lit("graft")), 256))))
        .collect()
    }
    spark.stop()
    sec
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "8000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

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
    val feedDir = s"/dev/shm/graft-bench-feed-$nEvents"
    val marker = new java.io.File(feedDir, "_SUCCESS")
    val cfg = FeedConfig(nEvents = nEvents, nKeys = (nEvents / 10).toInt max 1000,
      eventsPerFile = (nEvents / 64).toInt max 1, skew = 0.2, noopFrac = 0.05,
      decoyFrac = 0.02, contentChars = 160)
    if (!marker.exists()) BinlogFeedGen.writeFeed(spark0, cfg, feedDir)
    spark0.stop()

    // JIT/codegen warmup at small scale so no timed run pays it
    val warmDir = s"/dev/shm/graft-bench-feed-warm"
    if (!new java.io.File(warmDir, "_SUCCESS").exists()) {
      val sw = session(8)
      BinlogFeedGen.writeFeed(sw, cfg.copy(nEvents = 50000,
        eventsPerFile = 50000 / 8, nKeys = 10000), warmDir)
      sw.stop()
    }
    cdcReplay(8, warmDir)

    // interleaved reps, min per level (shared-VM noise robustness)
    val levels = Seq(4, 16, 8, 32)
    val runs = (1 to reps).flatMap(_ => levels.map(c => c -> cdcReplay(c, feedDir)))
    val tmin: Map[Int, Double] =
      levels.map(c => c -> runs.filter(_._1 == c).map(_._2).min).toMap
    val eps: Map[Int, Double] = tmin.map { case (c, t) => c -> nEvents / t }
    val eff416 = eps(16) / (4.0 * eps(4))
    val eff832 = eps(32) / (4.0 * eps(8))

    // pure-CPU control at the headline pair
    cpuControl(4) // warm
    val ctl = Seq(4, 16).map(c => c -> (1 to reps).map(_ => cpuControl(c)).min).toMap
    val ctlEff = ctl(4) / (4.0 * ctl(16))

    val qs = (results ++
      tmin.toSeq.sortBy(_._1).map { case (c, t) => s"cdc_replay_p$c" -> t })
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum + runs.map(_._2).sum
    println(
      f"""{"metric":"change-events/sec applied (replay->upsert) @local[32]","value":${eps(32)}%.1f,"unit":"events/sec","total_sec":$total%.2f,"events":$nEvents,"events_per_sec_p4":${eps(4)}%.1f,"events_per_sec_p8":${eps(8)}%.1f,"events_per_sec_p16":${eps(16)}%.1f,"events_per_sec_p32":${eps(32)}%.1f,"scaling_efficiency":$eff416%.3f,"scaling_efficiency_p4_p16":$eff416%.3f,"scaling_efficiency_p8_p32":$eff832%.3f,"cpu_control_efficiency_p4_p16":$ctlEff%.3f,"queries":$qs,"sf":"$sfDir"}""")
  }
}
