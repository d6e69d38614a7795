package graft

import graft.feed.ReplayOracle
import graft.feed.BinlogFeedGen.FeedConfig
import graft.table.GraftLake
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.Assertions._

/** Shared differential assertion: the lake's final LWW state must equal the
  * offset-order fold oracle row-for-row — content sha256, evolved values
  * and per-key winner offsets included. Used by the seeded-random replay
  * fuzz (FuzzReplaySpec) and the crash/maintenance lifecycle fuzz
  * (FuzzCrashSpec). */
object OracleAsserts {

  def assertMatchesOracle(spark: SparkSession, lakeRoot: String,
      cfg: FeedConfig, nBuckets: Int, label: String,
      fullDdl: Boolean = false): Unit = {
    val lake = new GraftLake(lakeRoot, nBuckets)
    val snap = lake.latest().get
    val evolved = cfg.ddlAt.nonEmpty
    // full-DDL feeds rename size->bytes and drop lang; the lake column for
    // the evolved value is therefore `bytes` and `lang` no longer exists
    val sizeCol = if (fullDdl) "bytes" else "size"
    val base0 = lake.read(spark, snap)
      .withColumn("sha", sha2(col("content"), 256))
    val base = if (fullDdl) base0.withColumn("lang", lit(null)) else base0
    val got = (if (evolved) base else base.withColumn("size", lit(null)))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        col("content"), col("sha"), col(sizeCol).as("size"), col("_offset"))
      .orderBy("repo", "path").collect()
    val want = ReplayOracle.finalState(cfg)
    assert(got.length == want.length,
      s"$label: row count ${got.length} != oracle ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      val key = s"${w.repo}/${w.path}"
      assert(g.getString(0) == w.repo && g.getString(1) == w.path,
        s"$label: key mismatch ${g.getString(0)}/${g.getString(1)} vs $key")
      assert(g.getString(2) == w.commit, s"$label: commit mismatch at $key")
      if (!fullDdl)
        assert(g.getString(3) == w.lang, s"$label: lang mismatch at $key")
      assert(g.getString(4) == w.content, s"$label: content mismatch at $key")
      assert(g.getString(5) == ReplayOracle.sha256Hex(w.content),
        s"$label: sha256 mismatch at $key")
      if (evolved) {
        val gotSize = if (g.isNullAt(6)) None else Some(g.getLong(6))
        assert(gotSize == w.size, s"$label: evolved size $gotSize != " +
          s"oracle ${w.size} at $key")
      }
      val off = g.getAs[org.apache.spark.sql.Row]("_offset")
      assert((off.getLong(0), off.getLong(1), off.getLong(2)) ==
        ((w.offsetFileIdx, w.offsetPos, w.offsetRowIdx)),
        s"$label: offset mismatch at $key")
    }
  }
}
