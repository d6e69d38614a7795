package graft

import graft.feed.BinlogFeedGen
import graft.feed.BinlogFeedGen.FeedConfig
import graft.ops._
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes every SQL-verifiable operator of the engine over the
  * driver's parquet tables; `oracleSql` carries the DuckDB-equivalent of
  * each (identical column names and values — decimal/integer arithmetic
  * everywhere a float sum would be order-sensitive). */
object SparkEntry {

  /** Flagship: full CDC replay — generate a deterministic binlog-shaped
    * feed, stream-merge it into the lake, return the final table. */
  def entry(spark: SparkSession): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft-entry-").toString
    val cfg = FeedConfig(nEvents = 2000, nKeys = 150, eventsPerFile = 500,
      dupTailFrac = 0.2, ddlAt = BinlogFeedGen.evolutionDdls(2000))
    BinlogFeedGen.writeFeed(spark, cfg, s"$base/feed")
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      s"$base/feed", s"$base/lake", s"$base/cp", nBuckets = 8,
      maxFilesPerTrigger = 2))
    q.awaitTermination()
    val lake = new GraftLake(s"$base/lake", 8)
    lake.read(spark, lake.latest().get)
      .withColumn("content_sha", sha2(col("content"), 256))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational baseline
    "q1_pricing_summary" -> ((s, d) => RelationalQueries.q1PricingSummary(s, d)),
    "q3_top_orders" -> ((s, d) => RelationalQueries.q3TopOrders(s, d)),
    "q5_nation_revenue" -> ((s, d) => RelationalQueries.q5NationRevenue(s, d)),
    // CDC operator semantics (engine core, oracle-checkable form)
    "cdc_lww_latest" -> ((s, d) => CdcQueries.lwwLatest(s, d)),
    "cdc_final_state" -> ((s, d) => CdcQueries.finalState(s, d)),
    "cdc_noop_suppress" -> ((s, d) => CdcQueries.noopSuppress(s, d)),
    "cdc_changetype_filter" -> ((s, d) => CdcQueries.changeTypeFilter(s, d)),
    "cdc_resume_from" -> ((s, d) => CdcQueries.resumeFrom(s, d)),
    "cdc_asof_last_click" -> ((s, d) => CdcQueries.asofLastClick(s, d)),
    "cdc_hourly_rollup" -> ((s, d) => CdcQueries.hourlyRollup(s, d)),
    "cdc_dedup_replay" -> ((s, d) => CdcQueries.dedupReplay(s, d)),
    "cdc_changelog" -> ((s, d) => CdcQueries.changelog(s, d)),
    "cdc_chain_apply" -> ((s, d) => CdcQueries.chainApply(s, d)),
    // training-data text pipeline
    "dedup_exact" -> ((s, d) => TextOps.dedupExact(s, d)),
    "doc_fingerprint" -> ((s, d) => TextOps.fingerprint(s, d)),
    "minhash_signature" -> ((s, d) => TextOps.minhashSignature(s, d)),
    "dedup_minhash_pairs" -> ((s, d) => TextOps.minhashCandidates(s, d)),
    "dedup_simhash" -> ((s, d) => TextOps.simhash(s, d)),
    "ngram_jaccard" -> ((s, d) => TextOps.ngramJaccard(s, d)),
    "lang_id" -> ((s, d) => TextOps.langId(s, d)),
    "text_quality" -> ((s, d) => TextOps.textQuality(s, d)),
    "token_count" -> ((s, d) => TextOps.tokenCount(s, d)),
    // similarity search
    "embed_cosine_topk" -> ((s, d) => VectorOps.cosineTopK(s, d)),
    "embed_ann_lsh" -> ((s, d) => VectorOps.lshAnn(s, d)),
    "dedup_embed_cosine" -> ((s, d) => VectorOps.embedCosineDup(s, d)),
    // multimodal binary plumbing
    "mm_binary_meta" -> ((s, d) => MultimodalOps.binaryMeta(s, d)),
    "mm_frame_sample" -> ((s, d) => MultimodalOps.frameSample(s, d)),
    // codec-stub path (no SQL oracle: mapPartitions decode — rows-only check)
    "mm_decode_features" -> ((s, d) =>
      MultimodalOps.decodeFeatures(s, d).toDF().drop("feature")
        .orderBy("doc_id"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CdcQueries.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ MultimodalOps.oracles
}
