package graft

import graft.feed.{BinlogFeedGen, ReplayOracle}
import graft.feed.BinlogFeedGen.FeedConfig
import graft.model.DdlChange
import graft.stream.{CdcIngestJob, IngestConfig}
import graft.table.GraftLake

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** The payload type map end-to-end (§1.2): the reference coerces 15 MySQL
  * types into row images (server/dbInfo/TableColumnList.java:44-103,
  * base/dbInfo/TableInfo.java:88-100); here DDL-evolved DECIMAL / TIMESTAMP /
  * DATE / BOOLEAN columns ride the extras envelope through decode → merge →
  * snapshot and come back typed, verified row-by-row against the oracle. */
class TypeMapSpec extends SparkSuite {

  val cfg: FeedConfig = FeedConfig(nEvents = 2500, nKeys = 180,
    eventsPerFile = 500, decoyFrac = 0.0, dupTailFrac = 0.1,
    ddlAt = Map(
      400L -> DdlChange("add_column", "score", "", "decimal(9,3)"),
      600L -> DdlChange("add_column", "seen_at", "", "timestamp"),
      800L -> DdlChange("add_column", "born_on", "", "date"),
      1000L -> DdlChange("add_column", "flag", "", "boolean"),
      1200L -> DdlChange("add_column", "size", "", "int"),
      1800L -> DdlChange("widen_type", "size", "int", "bigint"),
      // near the end of the feed: most keys' final image predates it, so
      // the null-evolved-column read path is guaranteed to be exercised
      2450L -> DdlChange("add_column", "late_col", "", "int")))

  test("decimal/timestamp/date/boolean evolved columns reach the lake typed") {
    val feedDir = tmp("f1"); val lakeRoot = tmp("l1")
    BinlogFeedGen.writeFeed(spark, cfg, feedDir)
    val q = CdcIngestJob.runStream(spark, IngestConfig(
      feedDir, lakeRoot, tmp("c1"), nBuckets = 8, maxFilesPerTrigger = 2))
    q.awaitTermination()
    val lake = new GraftLake(lakeRoot, 8)
    val snap = lake.latest().get
    // one schema version per batch that saw DDLs (batches fold all their
    // DDLs into one evolution step), not one per DDL
    assert(snap.schemaVersion >= 2, "evolution committed across batches")
    val cur = lake.currentSchema(snap)
    import org.apache.spark.sql.types._
    assert(cur("score").dataType == DecimalType(9, 3))
    assert(cur("seen_at").dataType == TimestampType)
    assert(cur("born_on").dataType == DateType)
    assert(cur("flag").dataType == BooleanType)
    assert(cur("size").dataType == LongType)

    val got = lake.read(spark, snap)
      .select("repo", "path", "commit", "score", "seen_at", "born_on",
        "flag", "size", "late_col")
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.repo && g.getString(1) == w.path &&
        g.getString(2) == w.commit)
      def raw(c: String): Option[String] = w.extras.get(c)
      // decimal(9,3): exact value compare
      val score = Option(g.getDecimal(3))
      assert(score.map(_.compareTo(raw("score").map(new java.math.BigDecimal(_)).orNull) == 0)
        .getOrElse(raw("score").isEmpty), s"score at ${w.repo}/${w.path}")
      // timestamp: strings were cast in UTC session time
      val seen = Option(g.getTimestamp(4)).map(_.toInstant)
      val seenWant = raw("seen_at").map(s =>
        LocalDateTime.parse(s.replace(' ', 'T')).toInstant(ZoneOffset.UTC))
      assert(seen == seenWant, s"seen_at at ${w.repo}/${w.path}: $seen vs $seenWant")
      // date
      val born = Option(g.getDate(5)).map(_.toLocalDate)
      assert(born == raw("born_on").map(LocalDate.parse),
        s"born_on at ${w.repo}/${w.path}")
      // boolean
      val flag = if (g.isNullAt(6)) None else Some(g.getBoolean(6))
      assert(flag == raw("flag").map(_.toBoolean), s"flag at ${w.repo}/${w.path}")
      // int → widened bigint
      val size = if (g.isNullAt(7)) None else Some(g.getLong(7))
      assert(size == w.size, s"size at ${w.repo}/${w.path}")
      // late column: null for keys whose final image predates its DDL
      val late = if (g.isNullAt(8)) None else Some(g.getInt(8))
      assert(late.map(_.toString) == w.extras.get("late_col"),
        s"late_col at ${w.repo}/${w.path}")
    }
    // the fixture genuinely exercises each type, the widened range, AND
    // the null-evolved-column read path
    assert(want.exists(_.extras.contains("score")))
    assert(want.exists(_.extras.contains("seen_at")))
    assert(want.exists(_.size.exists(_ > Int.MaxValue.toLong)))
    assert(got.exists(_.isNullAt(8)) && got.exists(!_.isNullAt(8)),
      "null AND non-null evolved columns exercised")
  }
}
