package graft

import org.apache.spark.sql.functions._

/** Smoke coverage of the driver-facing query surface: every SparkEntry
  * query runs at sf0.001 and returns a sane shape; every query with an
  * oracle has matching column names (the driver's compare is name-keyed).
  * Deep value parity vs DuckDB runs via tools/parity.py (driver-side). */
class QueriesSpec extends SparkSuite {

  val sf = "/root/testdata/sf0.001"

  test("every query runs and (except filters that can empty out) has rows") {
    val mayBeEmpty = Set("ngram_jaccard", "dedup_minhash_pairs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0 && (mayBeEmpty(name) || n > 0), s"$name returned $n rows")
    }
  }

  test("oracle keys are a subset of query keys; names sane") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracles: ${ok.diff(qk)}")
    // every query has an oracle (round 2: the codec stub gained one too)
    assert(qk.diff(ok).isEmpty, s"missing oracles: ${qk.diff(ok)}")
  }

  test("chain-apply composition law: merge(state@mid, winners(mid,max]) == final state") {
    // the oracle certifies this cross-engine at sf0.01; this pins it in-suite
    // at sf0.001, row-for-row (pure picked values, no arithmetic — exact)
    val chained = graft.ops.CdcQueries.chainApply(spark, sf).collect().toSeq
    val direct = graft.ops.CdcQueries.finalState(spark, sf).collect().toSeq
    assert(chained == direct)
  }

  test("entry() produces a non-empty sha-verified table") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("content_sha"))
    // spot-check: sha column is the sha of content
    val r = df.select(col("content"), col("content_sha")).limit(1).collect()(0)
    assert(graft.feed.ReplayOracle.sha256Hex(r.getString(0)) == r.getString(1))
  }
}
