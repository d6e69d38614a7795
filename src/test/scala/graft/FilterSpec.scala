package graft

import graft.feed.{BinlogFeedGen, FeedReader}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.model.{Op, Schemas}
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Filter-semantics unit tests (SURVEY.md §5.2.6): watched-table (F1),
  * change-type (F2/F5), and the null-aware no-op suppression truth table
  * (F3 — reference base/dbInfo/TableInfo.java:62-81, exclusion semantics
  * server/relay/WatchTableFilter.java:24-45). */
class FilterSpec extends SparkSuite {

  private def img(repo: String, commit: String, content: String): Row =
    Row(repo, "p", commit, "scala", content)

  private def eventDf(rows: Seq[Row]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, Schemas.changeEvent)
  }

  private def ev(op: String, before: Row, after: Row, table: String = "repo_files"): Row =
    Row(Row(1L, 1L, 0L), op, 0L, "code", table, before, after, null, null)

  test("F3 truth table: null-aware compare, excluded columns ignored") {
    val excluded = Set("commit")
    def noop(before: Row, after: Row, op: String = Op.Update): Boolean =
      eventDf(Seq(ev(op, before, after)))
        .select(FeedReader.isNoop(excluded)).collect()(0).getBoolean(0)

    // only excluded column differs → no-op (suppressed)
    assert(noop(img("r", "c1", "x"), img("r", "c2", "x")))
    // a kept column differs → not a no-op
    assert(!noop(img("r", "c1", "x"), img("r", "c2", "y")))
    // null == null for kept columns (reference TableInfo.java:74-75)
    assert(noop(img("r", "c1", null), img("r", "c2", null)))
    // null vs non-null → changed
    assert(!noop(img("r", "c1", null), img("r", "c2", "x")))
    assert(!noop(img("r", "c1", "x"), img("r", "c2", null)))
    // INSERT/DELETE are never suppressed regardless of images
    assert(!noop(img("r", "c1", "x"), img("r", "c1", "x"), Op.Insert))
    assert(!noop(img("r", "c1", "x"), null, Op.Delete))
  }

  test("F1: events on unwatched tables never reach the lake") {
    val cfg = FeedConfig(nEvents = 1500, nKeys = 100, eventsPerFile = 500,
      decoyFrac = 0.5)
    val feedDir = tmp("f1"); val lakeRoot = tmp("l1")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val total = FeedReader.readBatch(spark, feedDir).count()
    val watched = FeedReader.readBatch(spark, feedDir)
      .filter(FeedReader.watched()).count()
    assert(watched < total, "decoy rows exist in the feed")
    CdcIngestJob.replayBatch(spark, IngestConfig(feedDir, lakeRoot, tmp("c1"),
      nBuckets = 4))
    val lake = new GraftLake(lakeRoot, 4)
    val repos = lake.read(spark, lake.latest().get)
      .select("repo").distinct().collect().map(_.getString(0))
    // decoy keyspace is shifted by nKeys=100 → repo ids >= 100/64
    assert(repos.nonEmpty && repos.forall(_ <= "repo-0001"))
  }

  test("F2: acceptOps drops whole change-type classes at ingest") {
    val cfg = FeedConfig(nEvents = 1000, nKeys = 80, eventsPerFile = 500,
      decoyFrac = 0.0, noopFrac = 0.0)
    val feedDir = tmp("f2"); val lakeRoot = tmp("l2")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    // accept only INSERTs: no deletes ever applied → every first-version row
    // survives; updates never overwrite
    CdcIngestJob.replayBatch(spark, IngestConfig(feedDir, lakeRoot, tmp("c2"),
      nBuckets = 4, acceptOps = Set(Op.Insert)))
    val lake = new GraftLake(lakeRoot, 4)
    val rows = lake.read(spark, lake.latest().get)
      .select("repo", "path", "commit").collect()
    // every surviving row must be an INSERT image: verify via the generator
    // (INSERT happens at ver 1 or the 10-20% re-insert band)
    assert(rows.nonEmpty)
    val commits = rows.map(_.getString(2)).toSet
    val insertCommits = (0 until cfg.nKeys).flatMap { kid =>
      (1L to 60L).filter(v => BinlogFeedGen.opOf(cfg, kid.toLong, v) == Op.Insert)
        .map(v => BinlogFeedGen.commitOf(cfg, kid.toLong, v))
    }.toSet
    assert(commits.subsetOf(insertCommits))
  }

  test("F3 end-to-end with an arbitrary excluded set: {commit, content} " +
    "suppresses every UPDATE whose only changes are excluded") {
    // with content also excluded, EVERY generated UPDATE is a no-op (repo/
    // path/lang never change between versions), so the final state keeps
    // only INSERT images — verified against the generalized replay oracle
    val cfg = FeedConfig(nEvents = 2000, nKeys = 150, eventsPerFile = 500,
      decoyFrac = 0.0, noopFrac = 0.1)
    val excluded = Set("commit", "content")
    val feedDir = tmp("f5"); val lakeRoot = tmp("l5")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    CdcIngestJob.replayBatch(spark, IngestConfig(feedDir, lakeRoot, tmp("c5"),
      nBuckets = 4, excludedCols = excluded))
    val lake = new GraftLake(lakeRoot, 4)
    val got = lake.read(spark, lake.latest().get)
      .select("repo", "path", "commit", "content")
      .orderBy("repo", "path").collect().toSeq
    val want = graft.feed.ReplayOracle.finalState(cfg, excluded)
    // differs from the default-exclusion oracle — the set is really applied
    val defaultWant = graft.feed.ReplayOracle.finalState(cfg, Set("commit"))
    assert(want.map(r => (r.repo, r.path, r.commit)) !=
      defaultWant.map(r => (r.repo, r.path, r.commit)),
      "fixture too weak: wider exclusion must change the expected state")
    assert(got.size == want.size, s"rows ${got.size} != oracle ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.repo && g.getString(1) == w.path &&
        g.getString(2) == w.commit && g.getString(3) == w.content,
        s"mismatch at ${w.repo}/${w.path}")
    }
  }

  test("predicate DSL (F4): Catalyst SQL filter over before/after images") {
    // the reference's `"where (old.status = 1) and new.status = 2"` DSL
    // (client/config/ChangeDataFilter.java:42-104) maps 1:1 onto a SQL
    // expression over the typed envelope — the whole parser/evaluator is
    // Catalyst
    val cfg = FeedConfig(nEvents = 800, nKeys = 60, eventsPerFile = 400)
    val feedDir = tmp("f3")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val feed = FeedReader.readBatch(spark, feedDir)
    val filtered = feed.filter(
      "op = 'UPDATE' AND before.lang = 'scala' AND after.commit != before.commit")
    val got = filtered.count()
    val manual = feed.collect().count { r =>
      r.getString(1) == Op.Update && {
        val b = r.getStruct(5); val a = r.getStruct(6)
        b != null && a != null && b.getString(3) == "scala" &&
          a.getString(2) != b.getString(2)
      }
    }
    assert(got == manual && got > 0)
  }
}
