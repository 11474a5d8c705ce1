package graft

import org.apache.spark.sql.functions._
import graft.sources.TxLog

/** Measures driver-side snapshot-replay latency, text vs parquet
  * checkpoints, at a 64× commit count (640 commits, 8 files each →
  * 5,120 live files; the round-13 scale-hygiene task). Run manually:
  * `sbt "Test/runMain graft.CkptReplayProbe"`; results go to PERF.md. */
object CkptReplayProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    import spark.implicits._
    val commits = 640
    def build(fmt: String): String = {
      val t = java.nio.file.Files
        .createTempDirectory(s"graft-ckptprobe-$fmt").toString + "/t"
      spark.conf.set(TxLog.CheckpointFormatKey, fmt)
      // each commit: 8 tiny files (streaming-micro-batch shape)
      (0 until commits).foreach { i =>
        TxLog.append(spark, t,
          (0 until 8).map(j => (i.toLong * 8 + j, s"r$i-$j"))
            .toDF("id", "s").repartition(8))
      }
      spark.conf.unset(TxLog.CheckpointFormatKey)
      t
    }
    def measure(t: String, what: String): Unit = {
      // warm
      TxLog.snapshotFiles(spark, t)
      val n = 20
      val t0 = System.nanoTime()
      var files = 0
      (0 until n).foreach(_ => files = TxLog.snapshotFiles(spark, t).size)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[ckpt-probe] $what%-8s live=$files%5d commits=$commits replay=$ms%8.2f ms")
    }
    val txt = build("text")
    val pq = build("parquet")
    measure(txt, "text")
    measure(pq, "parquet")
    // and the no-checkpoint worst case: delete the last checkpoint so the
    // replay walks the full 640-commit suffix
    val f = new org.apache.hadoop.fs.Path(txt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    TxLog.checkpointVersions(spark, txt).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(txt, f"_log/$v%08d.ckpt"), false)
    }
    measure(txt, "none")
  }
}
