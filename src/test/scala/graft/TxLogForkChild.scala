package graft

import org.apache.spark.sql.SparkSession

/** Child process for TxLogSpec's cross-process OCC case: a SEPARATE JVM
  * (its own SparkSession, its own filesystem handles) appending `count`
  * commits to a shared table. The in-JVM OCC races prove thread safety;
  * this proves the hard-link commit claim holds between PROCESSES —
  * the actual multi-writer deployment shape. Exits nonzero on any
  * failure so the parent assertion is loud. */
object TxLogForkChild {
  def main(args: Array[String]): Unit = {
    val Array(table, baseStr, countStr) = args
    val base = baseStr.toLong
    val count = countStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"txlog-fork-child-$base")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      import spark.implicits._
      (0 until count).foreach { i =>
        val ids = Seq(base + i) // one distinctive row per commit
        graft.sources.TxLog.append(spark, table, ids.toDF("id"))
      }
    } finally spark.stop()
  }
}
