package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.model.DdlChange
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.{GraftLake, SchemaEvolution}
import org.apache.spark.sql.types._

/** Schema-evolution suite (SURVEY.md §5.2.4): DDL add-column and type-widen
  * mid-feed → later events use the new schema, earlier rows read as
  * null/widened; evolution survives restart (schema lives in the snapshot,
  * not driver memory — SURVEY.md §7.5). */
class SchemaEvolutionSpec extends SparkSuite {

  test("fold semantics: add, widen, idempotent replays, illegal widen") {
    val s0 = graft.model.Schemas.targetBase
    val add = DdlChange("add_column", "size", "", "int")
    val s1 = SchemaEvolution(s0, add)
    assert(s1("size").dataType == IntegerType)
    assert(SchemaEvolution(s1, add) == s1, "replayed add is a no-op")
    // engine columns stay at the tail
    assert(s1.fieldNames.takeRight(2).toSeq == Seq("_offset", "_deleted"))
    val widen = DdlChange("widen_type", "size", "int", "bigint")
    val s2 = SchemaEvolution(s1, widen)
    assert(s2("size").dataType == LongType)
    assert(SchemaEvolution(s2, widen) == s2, "replayed widen is a no-op")
    intercept[IllegalArgumentException](
      SchemaEvolution(s2, DdlChange("widen_type", "size", "bigint", "int")))
    intercept[IllegalArgumentException](
      SchemaEvolution(s2, DdlChange("drop_column", "size", "", "")))
    // widen on a column never added HERE (its add_column predates this
    // stream's resume point) materializes it at the widened type — the
    // reference refreshes the whole catalog on ALTER, so after the
    // statement the column simply exists with the TO type
    val s3 = SchemaEvolution(s0, widen)
    assert(s3("size").dataType == LongType)
    assert(s3.fieldNames.takeRight(2).toSeq == Seq("_offset", "_deleted"))
  }

  val cfg: FeedConfig = FeedConfig(nEvents = 4000, nKeys = 300,
    eventsPerFile = 400, ddlAt = BinlogFeedGen.evolutionDdls(4000))

  test("end-to-end: mid-feed ADD COLUMN + WIDEN reach the final table") {
    val feedDir = tmp("f1"); val lakeRoot = tmp("l1")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("c1"), nBuckets = 8, maxFilesPerTrigger = 2))
    q.awaitTermination()
    val lake = new GraftLake(lakeRoot, 8)
    val snap = lake.latest().get
    assert(snap.schemaVersion == 2, "two DDLs → two schema versions")
    val cur = lake.currentSchema(snap)
    assert(cur("size").dataType == LongType)
    val got = lake.read(spark, snap)
      .select("repo", "path", "commit", "content", "size")
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.repo && g.getString(1) == w.path)
      assert(g.getString(2) == w.commit && g.getString(3) == w.content)
      val size = if (g.isNullAt(4)) None else Some(g.getLong(4))
      assert(size == w.size, s"size mismatch at ${w.repo}/${w.path}: $size vs ${w.size}")
    }
    // post-widen values genuinely exceed Int range somewhere
    assert(want.exists(_.size.exists(_ > Int.MaxValue.toLong)),
      "fixture must exercise the widened range")
  }

  test("evolution survives restart: kill between the two DDLs, resume") {
    val feedDir = tmp("f2"); val lakeRoot = tmp("l2"); val cp = tmp("c2")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val ing = IngestConfig(feedDir, lakeRoot, cp, nBuckets = 8,
      maxFilesPerTrigger = 1)
    val q1 = CdcIngestJob.runStream(spark, ing)
    var spins = 0
    // wait until the add_column (at 40% of the feed) has been committed
    def ver(): Int = new GraftLake(lakeRoot, 8).latest().map(_.schemaVersion).getOrElse(0)
    while (ver() < 1 && spins < 600) { Thread.sleep(100); spins += 1 }
    q1.stop()
    assert(ver() >= 1, "killed after the first DDL committed")
    val q2 = CdcIngestJob.runStream(spark, ing)
    q2.awaitTermination()
    val lake = new GraftLake(lakeRoot, 8)
    val snap = lake.latest().get
    assert(snap.schemaVersion == 2)
    val got = lake.read(spark, snap)
      .select("repo", "path", "size").orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    got.zip(want).foreach { case (g, w) =>
      val size = if (g.isNullAt(2)) None else Some(g.getLong(2))
      assert(size == w.size)
    }
  }
}
