package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import java.nio.file.{Files, Path}

/** Shared Spark test harness: one local session per suite, temp workspace. */
abstract class SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("ERROR") }

  lazy val tmpRoot: Path = {
    val p = Files.createTempDirectory(s"graft-${getClass.getSimpleName}-")
    p.toFile.deleteOnExit(); p
  }
  def tmp(name: String): String = {
    val p = tmpRoot.resolve(name)
    p.toString
  }

  /** Root seed for a fuzz suite: the pinned `default` normally (CI runs
    * stay deterministic), or `default ^ GRAFT_FUZZ_SEED` when the env var
    * is set — one knob sweeps EVERY fuzz suite onto a fresh point set
    * while each failure stays reproducible (labels carry the per-point
    * derived seeds; the XOR keeps the suites' streams distinct under a
    * shared knob value). */
  def fuzzSeed(default: Long): Long =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.trim.toLong ^ default)
      .getOrElse(default)

  override def afterAll(): Unit = {
    // leave the session for sibling suites (shared JVM under sbt test/fork)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(tmpRoot.toFile)
    super.afterAll()
  }
}
