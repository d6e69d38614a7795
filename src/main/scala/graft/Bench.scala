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
  * Fault isolation (round-1 lesson: one late crash erased every number):
  * every measured run is individually try/caught, and each result is
  * appended to `SPARK_GRAFT_BENCH_LOG` (default ./bench_partial.jsonl)
  * the moment it completes — a crash can cost at most the one run that
  * crashed. The final one-line JSON is computed from whatever succeeded.
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

  private lazy val partialLog = new java.io.PrintWriter(
    new java.io.FileWriter(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_LOG", "bench_partial.jsonl"), true))
  private def record(kind: String, key: String, sec: Double): Unit = {
    partialLog.println(
      f"""{"kind":"$kind","key":"$key","sec":$sec%.3f,"at":${System.currentTimeMillis()}}""")
    partialLog.flush()
  }

  /** Run one measured thing with fault isolation: on failure, log and
    * return -1 (the aggregation below skips negatives). */
  private def guarded(kind: String, key: String)(f: => Double): Double = {
    val sec =
      try f
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $kind/$key FAILED: ${e.getMessage}")
          -1.0
      }
    record(kind, key, sec)
    sec
  }

  /** CDC replay at a given parallelism on a shared pre-generated feed.
    * AQE off: the merge's plan shapes are explicit (broadcast winners,
    * partition counts), so adaptive re-planning only adds per-stage
    * materialization barriers (~2s/batch measured). */
  private def cdcReplay(cpus: Int, feedDir: String): Double = {
    val spark = session(cpus, aqe = false)
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"graft-bench-$cpus-").toString
    try time {
      CdcIngestJob.replayBatch(spark, IngestConfig(
        feedDir, s"$base/lake", s"$base/cp", nBuckets = 64))
    } finally {
      spark.stop()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(base))
    }
  }

  /** Pure-CPU control: same harness, no table IO — isolates how far the
    * box itself scales when memory traffic is negligible. bit_xor (not
    * sum): summing 19M uniform 64-bit hashes overflows long with p≈1 and
    * ANSI mode (Spark 4 default) makes that a hard error — the round-1
    * bench killer. XOR is closed over long. */
  private def cpuControl(cpus: Int): Double = {
    val spark = session(cpus)
    try time {
      spark.range(0, 64L * 300000, 1, 64)
        .select(bit_xor(xxhash64(sha2(concat_ws("-", col("id"), lit("graft")), 256))))
        .collect()
    } finally spark.stop()
  }

  /** Feed cache dir keyed by the FULL config (an nEvents-only key silently
    * reused stale feeds across config changes — round-1 advice). */
  private def feedCacheDir(cfg: FeedConfig): String = {
    val cfgHash = java.lang.Integer.toHexString(cfg.toString.hashCode)
    s"/dev/shm/graft-bench-feed-${cfg.nEvents}-$cfgHash"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "8000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    // part 1: headline queries at full parallelism
    val spark0 = session(cpus)
    val results = headline.map { name =>
      name -> guarded("headline", name)(time {
        SparkEntry.queries(name)(spark0, sfDir)
          .write.format("noop").mode("overwrite").save()
      })
    }

    // part 2: CDC replay scaling (shared deterministic zipf-skewed feed)
    val cfg = FeedConfig(nEvents = nEvents, nKeys = (nEvents / 10).toInt max 1000,
      eventsPerFile = (nEvents / 64).toInt max 1, skew = 0.2, noopFrac = 0.05,
      decoyFrac = 0.02, contentChars = 160)
    val feedDir = feedCacheDir(cfg)
    if (!new java.io.File(feedDir, "_SUCCESS").exists())
      BinlogFeedGen.writeFeed(spark0, cfg, feedDir)
    spark0.stop()

    // JIT/codegen warmup at small scale so no timed run pays it
    val warmCfg = cfg.copy(nEvents = 50000, eventsPerFile = 50000 / 8,
      nKeys = 10000)
    val warmDir = feedCacheDir(warmCfg)
    if (!new java.io.File(warmDir, "_SUCCESS").exists()) {
      val sw = session(8)
      try BinlogFeedGen.writeFeed(sw, warmCfg, warmDir) finally sw.stop()
    }
    guarded("warmup", "p8")(cdcReplay(8, warmDir))

    // interleaved reps, min per level (shared-VM noise robustness)
    val levels = Seq(4, 16, 8, 32)
    val runs = (1 to reps).flatMap(r => levels.map(c =>
      c -> guarded("cdc_replay", s"p$c-r$r")(cdcReplay(c, feedDir))))
    val tmin: Map[Int, Double] = levels.flatMap { c =>
      val ok = runs.filter(r => r._1 == c && r._2 > 0).map(_._2)
      if (ok.isEmpty) None else Some(c -> ok.min)
    }.toMap
    val eps: Map[Int, Double] = tmin.map { case (c, t) => c -> nEvents / t }
    def epsOr0(c: Int): Double = eps.getOrElse(c, 0.0)
    def eff(lo: Int, hi: Int): Double =
      if (eps.contains(lo) && eps.contains(hi)) eps(hi) / (4.0 * eps(lo)) else 0.0
    val eff416 = eff(4, 16)
    val eff832 = eff(8, 32)

    // pure-CPU control at BOTH N→4N pairs: it measures how far this box
    // itself scales (VM steal, all-core clock, shared bandwidth) — the
    // ceiling any workload here can show. A real N→4N-executor cluster
    // holds per-executor clock/bandwidth constant, so the engine's
    // cluster-expected efficiency is engine_eff / control_eff (normalized).
    guarded("cpu_control", "warm")(cpuControl(4))
    val ctl = Seq(4, 8, 16, 32).map(c => c ->
      (1 to reps).map(r => guarded("cpu_control", s"p$c-r$r")(cpuControl(c)))
        .filter(_ > 0)).toMap
    def ctlEffOf(lo: Int, hi: Int): Double =
      if (ctl(lo).nonEmpty && ctl(hi).nonEmpty) ctl(lo).min / (4.0 * ctl(hi).min)
      else 0.0
    val ctlEff = ctlEffOf(4, 16)
    val ctlEff832 = ctlEffOf(8, 32)
    def norm(e: Double, c: Double): Double = if (c > 0) math.min(e / c, 1.5) else 0.0

    val qs = (results ++
      tmin.toSeq.sortBy(_._1).map { case (c, t) => s"cdc_replay_p$c" -> t })
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ > 0).sum +
      runs.map(_._2).filter(_ > 0).sum
    println(
      f"""{"metric":"change-events/sec applied (replay->upsert) @local[32]","value":${epsOr0(32)}%.1f,"unit":"events/sec","total_sec":$total%.2f,"events":$nEvents,"events_per_sec_p4":${epsOr0(4)}%.1f,"events_per_sec_p8":${epsOr0(8)}%.1f,"events_per_sec_p16":${epsOr0(16)}%.1f,"events_per_sec_p32":${epsOr0(32)}%.1f,"scaling_efficiency":$eff416%.3f,"scaling_efficiency_p4_p16":$eff416%.3f,"scaling_efficiency_p8_p32":$eff832%.3f,"cpu_control_efficiency_p4_p16":$ctlEff%.3f,"cpu_control_efficiency_p8_p32":$ctlEff832%.3f,"normalized_efficiency_p4_p16":${norm(eff416, ctlEff)}%.3f,"normalized_efficiency_p8_p32":${norm(eff832, ctlEff832)}%.3f,"queries":$qs,"sf":"$sfDir"}""")
  }
}
