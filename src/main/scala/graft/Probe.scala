package graft
import graft.stream.{CdcIngestJob, IngestConfig}
import org.apache.spark.sql.SparkSession
object Probe {
  def run(cpus: Int): Unit = {
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled","false").appName(s"rep$cpus").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files.createTempDirectory(s"probe$cpus-").toString
    val t0 = System.nanoTime()
    val m = CdcIngestJob.replayBatch(spark, IngestConfig(
      "/tmp/graft-bench-feed-8000000", s"$base/lake", s"$base/cp",
      nBuckets = 64, salt = 1))
    println(f"[probe] p$cpus total ${(System.nanoTime()-t0)/1e9}%.2f s  $m")
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val g = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled","false").getOrCreate()
    g.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File("/tmp/graft-bench-feed-8000000/_SUCCESS").exists())
      graft.feed.BinlogFeedGen.writeFeed(g, graft.feed.BinlogFeedGen.FeedConfig(
        nEvents = 8000000L, nKeys = 800000, eventsPerFile = 125000,
        skew = 0.2, noopFrac = 0.05, decoyFrac = 0.02, contentChars = 160),
        "/tmp/graft-bench-feed-8000000")
    g.stop()
    run(8) // warmup
    for (c <- Seq(4, 16, 4, 16, 32)) run(c)
  }
}
