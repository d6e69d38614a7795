package graft
import graft.stream.{CdcIngestJob, IngestConfig}
import org.apache.spark.sql.SparkSession

/** Scratch harness for scaling experiments (not part of the library API). */
object Probe {
  val feedDir = "/dev/shm/graft-probe-feed"

  def run(cpus: Int, stages: Boolean = false): Double = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("PROBE_CODEC", "snappy"))
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").appName(s"rep$cpus").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (stages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (for (a <- i.completionTime; b <- i.submissionTime)
            yield a - b).getOrElse(-1L)
          println(f"[stage] p$cpus id=${i.stageId}%3d tasks=${i.numTasks}%4d " +
            f"wall=${wall / 1000.0}%6.2fs cpu=${i.taskMetrics.executorRunTime / 1000.0}%7.1fs " +
            f"shW=${i.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            f"shR=${i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            i.name.takeWhile(_ != '\n').take(60))
        }
      })
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"probe$cpus-").toString
    val t0 = System.nanoTime()
    val m = CdcIngestJob.replayBatch(spark, IngestConfig(
      feedDir, s"$base/lake", s"$base/cp", nBuckets = 64, salt = 1,
      broadcastKeyLimit = sys.env.getOrElse("PROBE_BKL", "4000000").toLong))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[probe] p$cpus total $sec%.2f s  $m")
    spark.stop()
    HarnessIO.rm(new java.io.File(base))
    sec
  }

  /** Steady-state live-tail probe with a per-stage listener over the TIMED
    * window only: stage wall/cpu/shuffle per job name — where a 2.2s
    * microbatch actually goes. Mirrors Bench.cdcSteadyInProcess. */
  def steady(cpus: Int, feedSrc: String, stages: Boolean): Double = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      .config("spark.sql.files.maxPartitionBytes", "2m")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").appName(s"steady$cpus").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var record = false
    val stage2job = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          j.stageIds.foreach(sid => stage2job.put(sid, s"job${j.jobId}:$desc"))
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (record) {
            val i = s.stageInfo
            val wall = (for (a <- i.completionTime; b <- i.submissionTime)
              yield a - b).getOrElse(0L) / 1000.0
            val j = Option(stage2job.get(i.stageId)).getOrElse("?")
            rows.add(f"[steady]   s=${i.stageId}%4d t=${i.numTasks}%4d " +
              f"wall=$wall%6.2fs cpu=${i.taskMetrics.executorRunTime / 1000.0}%7.1fs " +
              f"shW=${i.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
              f"shR=${i.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
              f"in=${i.taskMetrics.inputMetrics.bytesRead / 1e6}%7.1fMB " +
              s"[$j] ${i.name.takeWhile(_ != '\n').take(50)}")
          }
      })
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), s"probe-steady-").toString
    try {
      val parts = new java.io.File(feedSrc).listFiles()
        .filter(_.getName.startsWith("_file=f")).sortBy(_.getName)
      val mid = math.max(parts.length / 2, 1)
      val work = new java.io.File(base, "feed"); work.mkdirs()
      parts.take(mid).foreach(HarnessIO.linkInto(work))
      val cfg = IngestConfig(work.toString, s"$base/lake", s"$base/cp",
        nBuckets = 64, maxFilesPerTrigger =
          sys.env.getOrElse("PROBE_MFPT", "4").toInt)
      val q = CdcIngestJob.runStream(spark, cfg,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      q.processAllAvailable()
      parts.drop(mid).foreach(HarnessIO.linkInto(work))
      record = stages
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      record = false
      q.stop()
      if (stages) {
        import scala.jdk.CollectionConverters._
        println(f"[steady] p$cpus timed=$sec%.2fs — all stages in the window:")
        rows.asScala.toSeq.sorted.foreach(println)
      }
      println(java.nio.file.Files.readString(
        java.nio.file.Paths.get(cfg.lakeRoot, "_metrics.jsonl")))
      println(f"[steady] p$cpus timed=$sec%.2fs")
      sec
    } finally {
      HarnessIO.rm(new java.io.File(base))
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    // "one <cpus> [reps]": warmup + reps measured runs in one JVM, for
    // taskset-pinned experiments (fresh JVM per invocation → JIT warmup
    // must happen inside, at the same core count).
    val genOnly = args.headOption.contains("gen")
    if (args.headOption.contains("steady")) {
      val cpus = args(1).toInt
      val feed = args(2)
      steady(cpus, feed, stages = false) // warmup (JIT + page cache)
      steady(cpus, feed, stages = args.contains("stages"))
      return
    }
    if (args.headOption.contains("one")) {
      val cpus = args(1).toInt
      val reps = if (args.length > 2) args(2).toInt else 2
      val stages = args.contains("stages")
      run(cpus) // JIT warmup, unreported
      val ts = (1 to reps).map(_ => run(cpus, stages))
      println(f"[probe] pinned p$cpus best=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
      return
    }
    val g = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("PROBE_CODEC", "snappy"))
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    g.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(feedDir, "_SUCCESS").exists())
      graft.feed.BinlogFeedGen.writeFeed(g, graft.feed.BinlogFeedGen.FeedConfig(
        nEvents = sys.env.getOrElse("PROBE_EVENTS", "8000000").toLong,
        nKeys = sys.env.getOrElse("PROBE_KEYS", "800000").toInt,
        eventsPerFile = sys.env.getOrElse("PROBE_EVENTS", "8000000").toInt / 64,
        skew = 0.2, noopFrac = 0.05, decoyFrac = 0.02,
        contentChars = sys.env.getOrElse("PROBE_CONTENT", "160").toInt),
        feedDir)
    g.stop()
    if (genOnly) return
    run(8) // warmup
    val levels = args.toSeq.flatMap(_.split(",")).map(_.toInt) match {
      case Nil => Seq(4, 16)
      case xs => xs
    }
    val times = (1 to 3).flatMap(_ => levels.map(c => c -> run(c)))
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val meds = levels.map(c => c -> med(times.filter(_._1 == c).map(_._2)))
    println(meds.map { case (c, t) => f"p$c=$t%.2f" }.mkString("[probe] median ", " ", ""))
    for (Seq((cl, tl), (ch, th)) <- meds.sliding(2))
      println(f"[probe] eff p$cl->p$ch = ${tl / ((ch.toDouble / cl) * th)}%.3f")
  }
}
