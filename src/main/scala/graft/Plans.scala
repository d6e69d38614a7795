package graft

import graft.feed.{BinlogFeedGen, FeedReader}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.merge.LwwDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Physical-plan audit: prints `.explain("formatted")` for the engine's hot
  * paths so plan regressions (lost pushdown, surprise exchanges, dropped
  * broadcasts) are reviewable as text. Run:
  * `sbt "runMain graft.Plans" > PLANS.md` (driver writes markdown to stdout;
  * Spark logs go to stderr). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val base = java.nio.file.Files.createTempDirectory("graft-plans-").toString
    BinlogFeedGen.writeFeed(spark,
      FeedConfig(nEvents = 2000, nKeys = 150, eventsPerFile = 500), s"$base/feed")

    def section(title: String, note: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n## $title\n")
      println(note)
      println("\n```")
      // queryExecution.explainString avoids explain()'s Console.withOut games
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println("```")
    }

    println("# PLANS — physical-plan audit of the hot paths")
    println("\nRegenerate with `sbt \"runMain graft.Plans\" 2>/dev/null > PLANS.md`.")

    val feed = FeedReader.readBatch(spark, s"$base/feed")
    val decoded = FeedReader.decode(
      feed.filter(FeedReader.watched() && FeedReader.acceptOps(Set("INSERT", "UPDATE", "DELETE"))),
      excludedCols = Set("commit"))

    val offEnc = graft.model.Offset.encExpr(col("offset"))
    section("Keyed planning/winner scan (1 of the 2 scans per batch)",
      "Checks: db/table filters appear in PushedFilters at the parquet scan; " +
      "ONE exchange (hash by repo,path); HashAggregate partial/final pair " +
      "(map-side combine bounds skew — max over the DECIMAL(38,0) offset " +
      "encoding, NOT the struct: struct max falls back to SortAggregate, " +
      "which sorts every scan partition by key); whole-stage codegen covers " +
      "scan→agg.") {
      decoded.groupBy("repo", "path")
        .agg(max(when(col("op").isin("INSERT", "UPDATE", "DELETE") && !col("_noop"),
          offEnc)).as("_woff"),
          count(lit(1)).as("_n"))
    }

    section("Merge winner fetch (broadcast path of scan 2)",
      "Checks: the batch side probes a BroadcastHashJoin LeftSemi on the " +
      "16-byte DECIMAL offset encoding — full row images never shuffle; the " +
      "build side is the (cached) winner aggregate, explicitly broadcast().") {
      val winOff = decoded.filter(!col("_noop"))
        .groupBy("repo", "path").agg(max(offEnc).as("_woff"))
        .select(col("_woff"))
      decoded.join(broadcast(winOff), offEnc === col("_woff"), "leftsemi")
    }

    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("repo"), col("path"), col("after.commit").as("commit"),
        col("after.lang").as("lang"), col("after.content").as("content"),
        col("offset").as("_offset"),
        (col("op") === "DELETE").as("_deleted"))
      .withColumn("_bucket", graft.table.GraftLake.bucketExpr(8))
    val shaped = shape(decoded)

    section("Merge WRITE, broadcast path (delta append — the steady-state shape)",
      "Checks: NO aggregate operator of any kind (round-2 verdict #3 — the " +
      "old target∪winners max_by sort-aggregated every touched bucket per " +
      "batch): winners are pre-selected by the BroadcastHashJoin LeftSemi " +
      "on unique offsets, then ONE Exchange hashpartitioning(_bucket) feeds " +
      "the delta-file write. Existing bucket files are never read or " +
      "rewritten here; base∪delta resolution happens at read/compaction.") {
      val winOff = decoded.filter(!col("_noop"))
        .groupBy("repo", "path").agg(max(offEnc).as("_woff"))
        .select(col("_woff"))
      shaped.join(broadcast(winOff),
          graft.model.Offset.encExpr(col("_offset")) === col("_woff"), "leftsemi")
        .repartition(col("_bucket"))
    }

    section("Merge WRITE, shuffle-hash path (over-broadcast-limit fallback)",
      "Taken when a batch's distinct-key count exceeds broadcastKeyLimit " +
      "(one-shot replay at 10^8-key scale). Checks: ShuffledHashJoin " +
      "LeftSemi BuildRight on the DECIMAL offset encoding — both sides " +
      "hash-partition on the encoding (globally unique ⇒ perfectly uniform, " +
      "key skew impossible), each partition builds a hash table over only " +
      "its 16-byte-encoding slice, images shuffle ONCE and nothing sorts " +
      "(the old bucketed max_by fallback sort-aggregated full images — " +
      "measured 9x slower at 16M events under a tight heap).") {
      val winOff = decoded.filter(!col("_noop"))
        .groupBy("repo", "path").agg(max(offEnc).as("_woff"))
        .select(col("_woff"))
      shape(decoded).join(winOff.hint("SHUFFLE_HASH"),
          graft.model.Offset.encExpr(col("_offset")) === col("_woff"), "leftsemi")
        .repartition(col("_bucket"))
    }

    section("Bucketed LWW reduction (library operator; merge-on-read twin)",
      "The per-key max-offset fold GraftLake.read applies over base+delta " +
      "buckets (and compaction folds amortized-rarely). Checks: ONE " +
      "Exchange hashpartitioning(_bucket); the groupBy(_bucket, repo, path) " +
      "max_by reuses that partitioning (no second exchange). The max_by " +
      "packs full row images into its buffer, so this is a sort-based " +
      "aggregate — the deliberate merge-on-read trade: reads pay a " +
      "per-bucket sort so writes are O(batch) delta appends.") {
      LwwDedup.dedupBucketed(shape(decoded.filter(!col("_noop"))),
        offsetCol = "_offset")
    }

    // two-commit lake so the changelog window has real snapshot bounds
    locally {
      import graft.stream.{CdcIngestJob, IngestConfig}
      CdcIngestJob.replayBatch(spark, IngestConfig(
        s"$base/feed", s"$base/lake", s"$base/cp", nBuckets = 8),
        chunkFiles = 2)
      val lake = new graft.table.GraftLake(s"$base/lake", 8)
      val last = lake.latest().get.id
      section("Changelog read (changesBetween — CDC-out incremental scan)",
        "Checks: the scan lists ONLY the window commits' added files (file " +
        "count in the Location, never the whole table); the lower offset " +
        "bound's fileIdx conjunct lands in PushedFilters (skips pre-window " +
        "rows of compaction-rewritten base files by row-group stats); one " +
        "hash-partition exchange feeds the per-key LWW winner fold.") {
        lake.changesBetween(spark, last - 1, last)
      }
      section("Changelog STREAM micro-batch (readStream graft-changelog)",
        "Checks: the DataFrame a micro-batch executes is ONE streaming " +
        "`Scan ExistingRDD` leaf. The window query — exactly the " +
        "changesBetween plan above, pushed fileIdx bound and batch " +
        "HashAggregate winner fold included — is compiled BEHIND that " +
        "leaf (StreamingShim), so the incremental planner never sees an " +
        "Aggregate to mis-plan as a stateful streaming aggregation, and " +
        "downstream stateful operators get a plain streaming relation.") {
        new graft.stream.ChangelogStreamSource(spark,
          Map("path" -> s"$base/lake")).getBatch(
          Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(last - 1)),
          org.apache.spark.sql.execution.streaming.runtime.LongOffset(last))
      }
      val key = lake.read(spark, lake.latest().get)
        .select("repo", "path").head()
      section("Point lookup (readKey — LevelDB point-seek analog)",
        "Checks: the scan's Location lists ONLY the files covering the " +
        "key's bucket range (O(range files), never O(table) — the file " +
        "pruning happens in the snapshot metadata, before any plan); the " +
        "repo/path equalities land in PushedFilters so non-matching " +
        "row groups skip on string stats; the per-key LWW fold runs over " +
        "just the pruned bucket slice.") {
        lake.readKey(spark, lake.latest().get,
          key.getString(0), key.getString(1))
      }
      section("Rebucket rewrite (offline re-shard, pre-write shape)",
        "One full rewrite by construction (the bucket function changed " +
        "for every row). Checks: base-only buckets stream scan→exchange→" +
        "write with NO aggregate; only delta-holding buckets pay the " +
        "merge-on-read LWW fold once, then ONE Exchange on the NEW bucket " +
        "id feeds the per-bucket base write. Nothing is O(anything) but " +
        "the table itself — which is the point of the operation.") {
        lake.read(spark, lake.latest().get, includeTombstones = true)
          .withColumn("_bucket", graft.table.GraftLake.bucketExpr(32))
          .repartition(col("_bucket"))
      }
    }

    section("q5_nation_revenue (join pipeline over the sf tables)",
      "Checks: dimension tables broadcast; filters pushed to scans " +
      "(PushedFilters on orders date range); ReadSchema pruned to used columns.") {
      ops.RelationalQueries.q5NationRevenue(spark, sf)
    }

    section("dedup_minhash_pairs (LSH banding, no all-pairs join)",
      "Checks: the self-join keys on (band, bkey) — an equi-join, never a " +
      "cross product; degenerate buckets pruned before the join.") {
      ops.TextOps.minhashCandidates(spark, sf)
    }

    section("embed_ann_lsh (bucket-pruned ANN)",
      "Checks: candidates join queries on the LSH bucket equi-key; " +
      "per-query ranking is a bounded window over bucket-local rows.") {
      ops.VectorOps.lshAnn(spark, sf)
    }

    spark.stop()
    HarnessIO.rm(new java.io.File(base))
  }
}
