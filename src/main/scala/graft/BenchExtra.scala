package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.stream.{CdcIngestJob, IngestConfig}
import org.apache.spark.sql.SparkSession

/** Extra measurement harness for the optimization rounds — NOT part of the
  * frozen driver contract (`graft.Bench` is the artifact; this main only
  * produces the before/after evidence cited in OPTIMIZATION_r*.md).
  *
  * Modes:
  *  - `plans <sfDir> <outDir>`: write `.explain("formatted")` for every
  *    declared query to `<outDir>/<name>.txt` (the judge-reviewable plan
  *    snapshots under plans/r06/).
  *  - `headline <cpus> <sfDir> <reps>`: per-query seconds with the noop
  *    sink (guide §1.4), `reps` samples each in ONE session (sample 1 ≈
  *    the bench's cold draw incl. codegen; later samples isolate the
  *    steady compute) — session config matches graft.Bench.session.
  *  - `replay <cpus> <nEvents>`: one-shot replayBatch on the bench-shaped
  *    feed; prints the per-phase BatchMetrics breakdown.
  *  - `steady <cpus> <nEvents>`: the live-tail steady-state protocol
  *    (phase 1 untimed, timed second half), per-batch metrics printed.
  */
object BenchExtra {

  private def session(cpus: Int, aqe: Boolean = true): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
      // A/B knob for the evidence runs only (graft.Bench pins 2m)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_EXTRA_SPLIT", "2m"))
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  // the bench feed shape (mirror of Bench.mainCfg — kept in sync by eye;
  // only used for this harness's own evidence runs)
  private def mainCfg(nEvents: Long): FeedConfig =
    FeedConfig(nEvents = nEvents,
      nKeys = ((nEvents / 10) min 1000000L).toInt max 1000,
      eventsPerFile = (nEvents / 64).toInt max 1, skew = 0.2, noopFrac = 0.05,
      decoyFrac = 0.02, contentChars = 160)

  private def feedDir(spark: SparkSession, nEvents: Long): String = {
    val cfg = mainCfg(nEvents)
    val dir = s"/dev/shm/graft-extra-feed-$nEvents"
    if (!new java.io.File(dir, "_SUCCESS").exists())
      BinlogFeedGen.writeFeed(spark, cfg, dir)
    dir
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "plans" :: sfDir :: outDir :: Nil =>
      val spark = session(32)
      new java.io.File(outDir).mkdirs()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
        try {
          val df = q(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name.txt"), txt.getBytes)
          println(s"PLAN $name ok")
        } catch {
          case e: Throwable => println(s"PLAN $name FAILED: ${e.getMessage}")
        }
      }
      spark.stop()

    case "headline" :: c :: sfDir :: r :: Nil =>
      val spark = session(c.toInt)
      val reps = r.toInt
      // same warmup the bench child does
      try SparkEntry.queries("q3_top_orders")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      val names = Seq(
        "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
        "cdc_lww_latest", "cdc_final_state", "cdc_noop_suppress",
        "cdc_asof_last_click", "cdc_hourly_rollup", "cdc_changelog",
        "dedup_exact", "minhash_signature", "dedup_simhash", "doc_fingerprint",
        "text_quality", "token_count", "embed_cosine_topk", "embed_ann_lsh",
        "mm_binary_meta")
      names.foreach { name =>
        val samples = (1 to reps).map { _ =>
          try time {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          } catch { case e: Throwable =>
            System.err.println(s"$name FAILED: ${e.getMessage}"); -1.0 }
        }
        println(f"EXTRA_KV $name ${samples.map(s => f"$s%.3f").mkString(",")}")
      }
      spark.stop()

    case "replay" :: c :: n :: Nil =>
      val spark = session(c.toInt, aqe = false)
      val feed = feedDir(spark, n.toLong)
      (1 to 2).foreach { i =>
        val base = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/dev/shm"), "graft-extra-run-").toString
        try {
          val sec = time {
            CdcIngestJob.replayBatch(spark, IngestConfig(
              feed, s"$base/lake", s"$base/cp", nBuckets = 64))
          }
          val metrics = java.nio.file.Files.readString(
            java.nio.file.Paths.get(s"$base/lake", "_metrics.jsonl"))
          println(f"EXTRA_REPLAY run$i sec=$sec%.3f")
          println(metrics)
        } finally HarnessIO.rm(new java.io.File(base))
      }
      spark.stop()

    case "steady" :: c :: n :: rest if rest.size <= 1 =>
      // optional 4th arg: nBuckets (default 64 — the bench shape). The
      // 4096-bucket draw certifies the ranged-delta write path (delta
      // files become bucket-RANGE files past 64 buckets) in a measured
      // number rather than only in functional pins (r05 verdict #5).
      val nBuckets = rest.headOption.map(_.toInt).getOrElse(64)
      val spark = session(c.toInt, aqe = false)
      val feed = feedDir(spark, n.toLong)
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-extra-steady-").toString
      try {
        val parts = new java.io.File(feed).listFiles()
          .filter(_.getName.startsWith("_file=f")).sortBy(_.getName)
        val mid = math.max(parts.length / 2, 1)
        val work = new java.io.File(base, "feed"); work.mkdirs()
        parts.take(mid).foreach(HarnessIO.linkInto(work))
        val cfg = IngestConfig(work.toString, s"$base/lake", s"$base/cp",
          nBuckets = nBuckets, maxFilesPerTrigger = 16)
        val q = CdcIngestJob.runStream(spark, cfg,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        q.processAllAvailable()
        parts.drop(mid).foreach(HarnessIO.linkInto(work))
        val sec = time(q.processAllAvailable())
        q.stop()
        println(f"EXTRA_STEADY sec=$sec%.3f")
        println(java.nio.file.Files.readString(
          java.nio.file.Paths.get(cfg.lakeRoot, "_metrics.jsonl")))
      } finally HarnessIO.rm(new java.io.File(base))
      spark.stop()

    case "abtest" :: c :: n :: Nil =>
      // decompose the replay batch's two scans into their stage costs
      val spark = session(c.toInt, aqe = false)
      import org.apache.spark.sql.functions._
      val feed = feedDir(spark, n.toLong)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val raw = () => graft.feed.FeedReader.readBatch(spark, feed)
        .filter(graft.feed.FeedReader.watched() &&
          graft.feed.FeedReader.acceptOps(Set("INSERT", "UPDATE", "DELETE")))
      def decoded() = graft.feed.FeedReader.decode(raw(), Set("commit"))
      val offEnc = graft.model.Offset.encExpr(col("offset"))
      def keyed() = decoded()
        .groupBy("repo", "path")
        .agg(max(when(col("op").isin("INSERT", "UPDATE", "DELETE") &&
          !col("_noop"), offEnc)).as("_woff"))
      def updates() = decoded()
        .select(col("repo"), col("path"), col("after.commit").as("commit"),
          col("after.lang").as("lang"), col("after.content").as("content"),
          col("offset"), col("op"))
      val variants: Seq[(String, () => Unit)] = Seq(
        "scan_raw" -> (() => noop(raw())),
        "scan_decoded" -> (() => noop(decoded())),
        "scan_updates" -> (() => noop(updates())),
        "keyed_agg" -> (() => noop(keyed())),
        "semijoin" -> (() => {
          val w = keyed().filter(col("_woff").isNotNull).select(col("_woff"))
          noop(updates().join(broadcast(w),
            graft.model.Offset.encExpr(col("offset")) === col("_woff"),
            "leftsemi"))
        }),
        "semijoin_triple" -> (() => {
          val seg2 = s"CAST('${java.math.BigInteger.TWO.pow(84)}' AS DECIMAL(38,0))"
          val w = keyed().filter(col("_woff").isNotNull).select(
            expr(s"_woff div $seg2").as("_wf"),
            expr(s"(_woff % $seg2) div ${1L << 42}").as("_wp"),
            expr(s"CAST(_woff % ${1L << 42} AS BIGINT)").as("_wr"))
          noop(updates().join(broadcast(w),
            col("offset.fileIdx") === col("_wf") &&
              col("offset.pos") === col("_wp") &&
              col("offset.rowIdx") === col("_wr"), "leftsemi"))
        }),
        "semijoin_hashkey_resid" -> (() => {
          val seg2 = s"CAST('${java.math.BigInteger.TWO.pow(84)}' AS DECIMAL(38,0))"
          val w = keyed().filter(col("_woff").isNotNull).select(
            expr(s"_woff div $seg2").as("_wf"),
            expr(s"(_woff % $seg2) div ${1L << 42}").as("_wp"),
            expr(s"CAST(_woff % ${1L << 42} AS BIGINT)").as("_wr"))
            .select(xxhash64(col("_wf"), col("_wp"), col("_wr")).as("_wh"),
              col("_wf"), col("_wp"), col("_wr"))
          noop(updates().join(broadcast(w),
            xxhash64(col("offset.fileIdx"), col("offset.pos"),
              col("offset.rowIdx")) === col("_wh") &&
              (col("offset.fileIdx") - col("_wf")) === 0 &&
              (col("offset.pos") - col("_wp")) === 0 &&
              (col("offset.rowIdx") - col("_wr")) === 0, "leftsemi"))
        }),
        "semijoin_hashkey_pure" -> (() => {
          val seg2 = s"CAST('${java.math.BigInteger.TWO.pow(84)}' AS DECIMAL(38,0))"
          val w = keyed().filter(col("_woff").isNotNull).select(
            expr(s"_woff div $seg2").as("_wf"),
            expr(s"(_woff % $seg2) div ${1L << 42}").as("_wp"),
            expr(s"CAST(_woff % ${1L << 42} AS BIGINT)").as("_wr"))
            .select(xxhash64(col("_wf"), col("_wp"), col("_wr")).as("_wh"))
          noop(updates().join(broadcast(w),
            xxhash64(col("offset.fileIdx"), col("offset.pos"),
              col("offset.rowIdx")) === col("_wh"), "leftsemi"))
        }),
        // the full two-consumer batch pipeline, uncached (today's shape:
        // keyed stats scan + winner-fetch probe scan both re-read parquet)
        // vs cached (decode once into the columnar cache, both consumers
        // read it) — re-tests the round-3 "cache is slower" measurement
        // under the current zstd feed and Spark 4 cache
        "pipeline_uncached" -> (() => {
          val w = keyed().filter(col("_woff").isNotNull).select(col("_woff"))
          noop(updates().join(broadcast(w),
            graft.model.Offset.encExpr(col("offset")) === col("_woff"),
            "leftsemi"))
        }),
        "pipeline_cached" -> (() => {
          val dec = decoded()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            val k = dec.groupBy("repo", "path")
              .agg(max(when(col("op").isin("INSERT", "UPDATE", "DELETE") &&
                !col("_noop"), offEnc)).as("_woff"))
            val w = k.filter(col("_woff").isNotNull).select(col("_woff"))
            val up = dec
              .select(col("repo"), col("path"), col("after.commit").as("commit"),
                col("after.lang").as("lang"), col("after.content").as("content"),
                col("offset"), col("op"))
            noop(up.join(broadcast(w),
              graft.model.Offset.encExpr(col("offset")) === col("_woff"),
              "leftsemi"))
          } finally { dec.unpersist(false); () }
        }),
        "semijoin_triple_repart" -> (() => {
          val seg2 = s"CAST('${java.math.BigInteger.TWO.pow(84)}' AS DECIMAL(38,0))"
          val w = keyed().filter(col("_woff").isNotNull).select(
            expr(s"_woff div $seg2").as("_wf"),
            expr(s"(_woff % $seg2) div ${1L << 42}").as("_wp"),
            expr(s"CAST(_woff % ${1L << 42} AS BIGINT)").as("_wr"))
          noop(updates().join(broadcast(w),
            col("offset.fileIdx") === col("_wf") &&
              col("offset.pos") === col("_wp") &&
              col("offset.rowIdx") === col("_wr"), "leftsemi")
            .withColumn("_bucket", graft.table.GraftLake.bucketExpr(64))
            .repartition(col("_bucket")))
        }))
      variants.foreach { case (name, f) =>
        val ts = (1 to 3).map(_ => time(f()))
        println(f"EXTRA_AB $name ${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      spark.stop()

    case "qtest" :: sfDir :: Nil =>
      // decompose q1's warm cost: scan vs cast vs agg vs sort
      val spark = session(32)
      import org.apache.spark.sql.functions._
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val one = lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
      def proj = li.select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("disc"))
      def agg = proj.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("qty")).cast("double").as("sum_qty"),
          sum(col("price")).cast("double").as("sum_base_price"),
          sum(col("price") * (one - col("disc"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
      val variants: Seq[(String, () => Unit)] = Seq(
        "q1_scan" -> (() => noop(li.select(col("l_returnflag"),
          col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount")))),
        "q1_proj" -> (() => noop(proj)),
        "q1_agg" -> (() => noop(agg)),
        "q1_full" -> (() => noop(agg.orderBy("l_returnflag", "l_linestatus"))),
        "q1_repart_agg" -> (() => noop(proj
          .repartition(spark.sparkContext.defaultParallelism)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("qty")).cast("double").as("sum_qty"),
            sum(col("price")).cast("double").as("sum_base_price"),
            sum(col("price") * (one - col("disc"))).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order")))),
        // integer-cents candidates: per-row decimal work and the decimal
        // aggregation buffers replaced by long arithmetic; the exact cents
        // totals convert back through an exact decimal division at the end
        "q1_cents_agg" -> (() => noop(li.select(
            col("l_returnflag"), col("l_linestatus"),
            (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qty_c"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"),
            (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("disc_c"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            (sum(col("qty_c")).cast("decimal(38,0)") / 100).cast("double").as("sum_qty"),
            (sum(col("price_c")).cast("decimal(38,0)") / 100).cast("double").as("sum_base_price"),
            (sum(col("price_c") * (lit(100L) - col("disc_c"))).cast("decimal(38,0)") / 10000).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order")))),
        "q1_cents_salted" -> (() => noop(li.select(
            col("l_returnflag"), col("l_linestatus"),
            pmod(col("l_orderkey"), lit(1024L)).as("_salt"),
            (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qty_c"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"),
            (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("disc_c"))
          .groupBy("l_returnflag", "l_linestatus", "_salt")
          .agg(
            sum(col("qty_c")).as("q"), sum(col("price_c")).as("p"),
            sum(col("price_c") * (lit(100L) - col("disc_c"))).as("d"),
            count(lit(1)).as("n"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            (sum(col("q").cast("decimal(38,0)")) / 100).cast("double").as("sum_qty"),
            (sum(col("p").cast("decimal(38,0)")) / 100).cast("double").as("sum_base_price"),
            (sum(col("d").cast("decimal(38,0)")) / 10000).cast("double").as("sum_disc_price"),
            sum(col("n")).as("count_order")))),
        // scale-safe: per-row work in longs, sum buffers compact decimal
        // (long-backed until 10^18, graceful BigDecimal past it)
        "q1_cents_decsum" -> (() => noop(li.select(
            col("l_returnflag"), col("l_linestatus"),
            (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qty_c"),
            (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("price_c"),
            (col("l_discount").cast("decimal(18,2)") * 100).cast("long").as("disc_c"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            (sum(col("qty_c").cast("decimal(20,0)")) / 100).cast("double").as("sum_qty"),
            (sum(col("price_c").cast("decimal(20,0)")) / 100).cast("double").as("sum_base_price"),
            (sum((col("price_c") * (lit(100L) - col("disc_c"))).cast("decimal(28,0)")) / 10000).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order")))),
        "events_scan" -> (() => noop(
          spark.read.parquet(s"$sfDir/events.parquet"))),
        "docs_scan" -> (() => noop(
          spark.read.parquet(s"$sfDir/documents.parquet"))))
      variants.foreach { case (name, f) =>
        val ts = (1 to 4).map(_ => time(f()))
        println(f"EXTRA_Q $name ${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      spark.stop()

    case other =>
      System.err.println(s"unknown args: $other")
      sys.exit(2)
  }
}
