package graft.feed

import graft.model.{Op, Schemas}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Readers + decode/filter stages over the binlog-shaped feed.
  *
  * Filter semantics replicate the reference exactly:
  *  - F1 watched-table filter, applied before any image decoding
  *    (reference: server/relay/BinlogProducer.java:93-95, 268-271) — with
  *    parquet this also prunes at scan time via pushed predicates.
  *  - F2 change-type filter at ingest (`acceptEvent` config;
  *    server/dbInfo/DatabaseInitInfo.java:54-57, 111-113).
  *  - F3 no-op-change suppression: an UPDATE whose before/after images are
  *    equal null-aware, ignoring configured "time-like" columns
  *    (server/relay/WatchTableFilter.java:24-45; null truth table
  *    base/dbInfo/TableInfo.java:62-81) — expressed as Catalyst
  *    `EqualNullSafe` over pruned structs, no UDF.
  */
object FeedReader {

  /** Feed schema incl. the `_file` partition directory column. */
  val feedSchema: StructType =
    StructType(Schemas.changeEvent.fields :+ StructField("_file", StringType))

  def readBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(feedSchema).parquet(dir)

  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(feedSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** F1: watched-table predicate (pushed down to the parquet scan). */
  def watched(db: String = BinlogFeedGen.WatchedDb,
      table: String = BinlogFeedGen.WatchedTable): Column =
    col("db") === db && col("table") === table

  /** F2: change-type accept set (DDL always passes — it is control flow). */
  def acceptOps(ops: Set[String]): Column =
    col("op") === Op.Ddl || col("op").isin(ops.toSeq: _*)

  /** F3: true when the event is a suppressible no-op UPDATE. `excluded`
    * columns (the reference's `filterTimeChange` list) are ignored in the
    * comparison; comparison is null-safe per column.
    *
    * Evolved-column values ride in the AFTER-only `extras` map (the
    * envelope has no before-image for them), so an event carrying extras
    * can never be PROVEN a no-op — the reference compares full refreshed-
    * catalog row images (WatchTableFilter.java:24-45 over TableInfo's
    * post-ALTER column list), where an UPDATE changing only an evolved
    * column is NOT filtered. Suppression is therefore conservative: only
    * extras-free events qualify. Over-delivery is harmless (LWW winners
    * de-dup it); suppressing a real evolved-column change would silently
    * lose the value (round-5 review).
    *
    * Expressed as a short-circuiting AND of per-field `<=>` rather than
    * `struct(a) <=> struct(b)`: field-wise null-safe equality is the same
    * predicate, but codegen then skips struct materialization (two ~full-row
    * copies per event) and exits on the first differing field — `content`
    * is compared last, and for real updates the comparison ends within its
    * first differing bytes. This predicate runs in every scan of a batch,
    * so it dominates per-event CPU if written carelessly. */
  def isNoop(excluded: Set[String]): Column = {
    val keep = Schemas.repoFile.fieldNames.filterNot(excluded.contains)
    // cheap fixed-width-ish fields first, content last
    val ordered = keep.sortBy(c => if (c == "content") 1 else 0)
    val eqs = ordered.map(c => col(s"after.$c") <=> col(s"before.$c"))
    val extrasFree = col("extras").isNull || size(col("extras")) <= 0
    eqs.foldLeft(col("op") === Op.Update && extrasFree)(_ && _)
  }

  /** Decode row events into merge shape: key columns hoisted (DELETE has
    * only a before-image — BinlogProducer.java:97-98), payload flattened,
    * `_noop` flagged for metrics. The positional-decode step of the
    * reference (base/dbInfo/TableInfo.java:41-51) is subsumed by the typed
    * parquet schema. */
  def decode(feed: DataFrame, excludedCols: Set[String]): DataFrame =
    feed
      .withColumn("repo", coalesce(col("after.repo"), col("before.repo")))
      .withColumn("path", coalesce(col("after.path"), col("before.path")))
      .withColumn("_noop", isNoop(excludedCols))
}
