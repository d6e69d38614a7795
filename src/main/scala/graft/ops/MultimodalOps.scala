package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decode / feature-extract / frame-sample as per-partition batch
  * transforms.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[FakeCodec]]), but everything
  * Spark-side is real and tested: binary column handling, schema,
  * partition-batched processing (`mapPartitions` — the Scala analog of
  * `mapInPandas` batch shape), and downstream joins on extracted metadata.
  */
object MultimodalOps {

  /** One media blob row (the shape a real pipeline would carry). */
  final case class MediaBlob(doc_id: Long, kind: String, bytes: Array[Byte])
  /** Extracted metadata/features (decode output schema). */
  final case class MediaMeta(doc_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** STUB decoder: stands in for an image/audio codec (none in this
    * container). Deterministic in the bytes — the "decoded" dimensions and
    * features derive from a 60-bit sha256 prefix of the payload, the same
    * engine-portable hash the text operators use, so the DuckDB oracle
    * reproduces every output bit-for-bit. A real deployment swaps this
    * object only; the Spark-side plumbing (binary column, partition-batched
    * mapPartitions, output schema) is what the operator actually tests. */
  object FakeCodec {
    def decode(b: MediaBlob): MediaMeta = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(b.bytes).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(sha.substring(0, 15), 16) // 60-bit, >=0
      val w = 64 + (h % 1856L).toInt
      val hgt = 64 + ((h >>> 17) % 1016L).toInt
      val frames = 1 + (b.bytes.length / 256)
      // fake 8-dim feature: deterministic hash moments
      val feat = Array.tabulate(8)(j => ((h >>> (j * 7)) % 1000L).toFloat / 1000f)
      MediaMeta(b.doc_id, b.kind, b.bytes.length.toLong, w, hgt, frames, feat)
    }
  }

  /** Treat each document's text bytes as an opaque media blob (the driver
    * testdata has no real media; the plumbing is identical). */
  def blobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaBlob]
  }

  /** Decode + feature-extract, batched per partition (mapPartitions = the
    * batch shape a vectorized codec wants; one codec init per partition). */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs(spark, dir).mapPartitions { it =>
      // real codecs init here once per partition/batch
      it.map(FakeCodec.decode)
    }
  }

  /** SQL-facing metadata extraction — byte length, content hash, fake
    * dimensions derived with engine-portable arithmetic (this variant is
    * DuckDB-verifiable end-to-end, unlike the codec stub). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
        sha2(col("text"), 256).as("content_sha"),
        (TextOps.shaLong(col("text")) % 1856L + 64L).as("fake_width"),
        (TextOps.shaLong(reverse(col("text"))) % 1016L + 64L).as("fake_height"),
        (length(encode(col("text"), "UTF-8")) / 256 + 1).cast("long").as("n_frames"))
      .orderBy("doc_id")

  /** Frame sampling: one row per sampled frame index (every 4th frame) —
    * generator-style explode, the video-pipeline shape. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    binaryMeta(spark, dir)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  val oracles: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  (64 + ('0x' || substr(sha256(text), 1, 15))::BIGINT % 1856)::INTEGER AS width,
        |  (64 + (('0x' || substr(sha256(text), 1, 15))::BIGINT // 131072) % 1016)::INTEGER AS height,
        |  (octet_length(encode(text)) // 256 + 1)::INTEGER AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text))::BIGINT AS byte_len,
        |  sha256(text) AS content_sha,
        |  (('0x' || substr(sha256(text), 1, 15))::BIGINT % 1856 + 64) AS fake_width,
        |  (('0x' || substr(sha256(reverse(text)), 1, 15))::BIGINT % 1016 + 64) AS fake_height,
        |  (octet_length(encode(text)) // 256 + 1)::BIGINT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id, (octet_length(encode(text)) // 256 + 1)::BIGINT AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS frame_idx
        |FROM meta ORDER BY doc_id, frame_idx""".stripMargin)
}
