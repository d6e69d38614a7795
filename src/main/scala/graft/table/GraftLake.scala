package graft.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import graft.model.Offset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot-committed Parquet table, from scratch (no Iceberg
  * jars in this environment — SURVEY.md §7.1/§7.3).
  *
  * Layout:
  * {{{
  *   <root>/data/commit-<batchId>-<uuid>/_bucket=N/part-....parquet
  *   <root>/_graft_log/snapshot-%011d.json    // atomic-renamed commit
  *   <root>/_metrics.jsonl                    // per-microbatch lineage
  * }}}
  *
  * The commit protocol replicates the reference's ack-after-process ordering
  * (reference: server/akkaSystem/ClientConnectActor.java:91-96 — offsets are
  * persisted only after delivery): data files first, snapshot JSON rename
  * last, streaming checkpoint after that. A crash between steps leaves only
  * orphan data files, which no snapshot references and expiry deletes.
  * Replayed batchIds are fenced by `latest.batchId` (idempotent commits).
  *
  * Scale notes: the snapshot lists files per hash bucket of (repo, path), so
  * a MERGE touches only affected buckets (bounded rewrite at 1e10-event
  * scale); readers prune by bucket without listing directories.
  */
object GraftLake {
  final case class FileEntry(path: String, bucket: Int, schemaVersion: Int,
      rows: Long)
  final case class Snapshot(
      id: Long,
      batchId: Long,
      /** DataType.json of every schema version ever committed (files are
        * read with their own version, then cast to current — widening-safe) */
      schemas: Map[String, String],
      schemaVersion: Int,
      files: Seq[FileEntry],
      lastOffset: Option[Offset],
      /** per-bucket rows applied this commit + scalar batch metrics */
      metrics: Map[String, Long],
      parentId: Long,
      /** checkpoint-lineage id that produced this commit: streaming
        * batchIds are only monotonic within one checkpoint lineage, so the
        * exactly-once replay fence compares batchIds only when the lineage
        * matches (a fresh checkpoint over an existing lake restarts ids at
        * 0 — fencing on the bare number would silently drop those batches). */
      lineage: String = "")

  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def bucketExpr(nBuckets: Int) =
    pmod(hash(col("repo"), col("path")), lit(nBuckets))

  /** Row count from a parquet footer — a pure metadata read (no data IO).
    * Static so executor-side metadata jobs don't capture the lake. */
  def footerRows(p: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(java.nio.file.Paths.get(p).toUri),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}

final class GraftLake(val root: String, val nBuckets: Int) {
  import GraftLake._

  private def logDir: Path = Paths.get(root, "_graft_log")
  private def dataDir: Path = Paths.get(root, "data")
  private def snapPath(id: Long): Path = logDir.resolve(f"snapshot-$id%011d.json")

  def init(schema: StructType): Snapshot = {
    Files.createDirectories(logDir)
    Files.createDirectories(dataDir)
    latest().getOrElse {
      val s = Snapshot(0L, -1L, Map("0" -> schema.json), 0, Nil, None,
        Map.empty, -1L)
      commit(s); s
    }
  }

  /** Current snapshot = max id in the log (rename-atomic publish means the
    * max-id file is always a complete commit). */
  def latest(): Option[Snapshot] = {
    if (!Files.isDirectory(logDir)) return None
    val snaps = Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("snapshot-\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    snaps.lastOption.map(p => mapper.readValue(Files.readString(p), classOf[Snapshot]))
  }

  def schemaOf(s: Snapshot, version: Int): StructType =
    DataType.fromJson(s.schemas(version.toString)).asInstanceOf[StructType]
  def currentSchema(s: Snapshot): StructType = schemaOf(s, s.schemaVersion)

  /** Read table rows for the given buckets (None = all), casting every file
    * group to the current schema (added columns → null, widened → cast). */
  def read(spark: SparkSession, s: Snapshot, buckets: Option[Set[Int]] = None,
      includeTombstones: Boolean = false): DataFrame = {
    val cur = currentSchema(s)
    val wanted = buckets match {
      case Some(bs) => s.files.filter(f => bs.contains(f.bucket))
      case None => s.files
    }
    val byVer = wanted.groupBy(_.schemaVersion)
    val parts = byVer.toSeq.sortBy(_._1).map { case (ver, files) =>
      val vSchema = schemaOf(s, ver)
      val df = spark.read.schema(vSchema).parquet(files.map(_.path): _*)
      // align to current schema: missing columns null, types cast (widen)
      df.select(cur.fields.map { f =>
        if (vSchema.fieldNames.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }
    val all = parts.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cur))
    if (includeTombstones) all else all.filter(!col("_deleted"))
  }

  /** Write `df` (must match `schema`, with an `_bucket` int column) as new
    * data files for this commit; returns the file entries, one bucket per
    * directory so the manifest maps file→bucket exactly.
    * `prePartitioned = true` promises the input is already hash-partitioned
    * by `_bucket` (e.g. straight out of the merge reduction) — skips the
    * exchange. */
  def writeData(df: DataFrame, batchId: Long,
      prePartitioned: Boolean = false): Seq[FileEntry] = {
    val commitDir = dataDir.resolve(s"commit-$batchId-${UUID.randomUUID().toString.take(8)}")
    // pre-sorting by the partition dir keeps the dynamic-partition writer
    // single-file-at-a-time (no writer-per-key fanout/sort-spill pass);
    // RENAME (not copy) to _bdir: partitionBy consumes the column, so the
    // bucket id lives only in the directory name + manifest — storing it
    // again in every data file would be permanent dead weight.
    val part = if (prePartitioned) df else df.repartition(col("_bucket"))
    part.withColumnRenamed("_bucket", "_bdir")
      .sortWithinPartitions(col("_bdir"))
      .write.partitionBy("_bdir").parquet(commitDir.toString)
    listCommitFiles(df.sparkSession, commitDir)
  }

  private def listCommitFiles(spark: SparkSession, commitDir: Path): Seq[FileEntry] = {
    if (!Files.isDirectory(commitDir)) return Nil
    val entries = Files.list(commitDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("_bdir="))
      .flatMap { bdir =>
        val b = bdir.getFileName.toString.stripPrefix("_bdir=").toInt
        Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => (p.toString, b))
      }.toSeq
    // footer reads are independent metadata fetches. Up to a few hundred
    // files, parallel driver-side futures are cheapest (no job scheduling);
    // past that — the thousands of buckets a 100 TB table needs — the reads
    // go to the executors as one tiny metadata job, so commit-time driver
    // IO stays O(1) in the file count.
    if (entries.size <= 256) {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(
        Future.traverse(entries) { case (p, b) =>
          Future(FileEntry(p, b, -1, GraftLake.footerRows(p)))
        }, 5.minutes)
    } else {
      spark.sparkContext
        .parallelize(entries, math.min(entries.size, 64))
        .map { case (p, b) => (p, b, GraftLake.footerRows(p)) }
        .collect().toSeq
        .map { case (p, b, n) => FileEntry(p, b, -1, n) }
    }
  }

  /** Atomic publish: tmp write + POSIX rename. Fencing: refuses to commit a
    * batchId already in the log (the caller skips replayed batches). */
  def commit(s: Snapshot): Snapshot = {
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, mapper.writeValueAsString(s))
    val dst = snapPath(s.id)
    if (Files.exists(dst))
      throw new IllegalStateException(s"snapshot ${s.id} already committed (fenced)")
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    s
  }

  /** Snapshot expiry (retention R1 analog — reference
    * server/infoPersistent/BinlogDataStorageWithLevelDB.java:291-352):
    * keep the last `keep` snapshots, delete older snapshot JSONs and any
    * data file no kept snapshot references (also collects orphans from
    * crashed commits). */
  def expire(keep: Int): Unit = {
    val snaps = Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.matches("snapshot-\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    if (snaps.size <= keep) ()
    else {
      val (drop, kept) = snaps.splitAt(snaps.size - keep)
      val referenced = kept.flatMap { p =>
        mapper.readValue(Files.readString(p), classOf[Snapshot]).files.map(_.path)
      }.toSet
      drop.foreach(Files.deleteIfExists(_))
      if (Files.isDirectory(dataDir)) {
        Files.walk(dataDir).iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") && !referenced(p.toString))
          .foreach(Files.deleteIfExists(_))
        // remove now-empty commit dirs
        Files.walk(dataDir).iterator().asScala.toSeq.reverse
          .filter(p => Files.isDirectory(p) && p != dataDir &&
            !Files.list(p).iterator().hasNext)
          .foreach(Files.deleteIfExists(_))
      }
    }
  }
}
