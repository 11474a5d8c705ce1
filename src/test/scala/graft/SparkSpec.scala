package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (Spark sessions are
  * expensive; ScalaTest suites run sequentially in one JVM under sbt).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the production extensions (native functions + the bounded-dim
      // broadcast rule) — tests must see the same planner users do
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror GraftSession: keep a TIMESTAMP(NANOS) events regen readable
      // so Tables.events' LongType branch stays live (see GraftSession)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror GraftSession: the TxLog SQL catalog must be testable
      .config("spark.sql.catalog.graft", "graft.sources.TxLogCatalog")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  /** sf0.001 keeps unit tests fast; sf0.01 is the driver's oracle SF. */
  val sfTiny = "/root/testdata/sf0.001"
  val sfSmall = "/root/testdata/sf0.01"
}
