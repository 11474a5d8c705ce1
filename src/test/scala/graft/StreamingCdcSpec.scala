package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingCdc

class StreamingCdcSpec extends SparkSpec {
  import spark.implicits._

  case class Change(k: Long, p: String, v: Double, seq: Long, del: Boolean)

  private def table(dir: String): Map[Long, (String, Double)] =
    spark.read.parquet(dir).select("k", "p", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("CDC stream maintains the table: upserts, deletes, in-batch sequence compaction") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    Seq((1L, "p1", 10.0), (2L, "p2", 20.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val stream = MemoryStream[Change](spark)
    val q = StreamingCdc.applyChanges(stream.toDF(), dir,
      keys = Seq("k"), partitionCol = "p", seqCol = "seq", deleteCol = "del")
    try {
      // batch 1: update k=1, insert k=3 — and k=3 carries TWO changes in
      // one batch; the later sequence number must win
      stream.addData(
        Change(1L, "p1", 11.0, seq = 1L, del = false),
        Change(3L, "p1", 99.0, seq = 2L, del = false),
        Change(3L, "p1", 30.0, seq = 3L, del = false))
      q.processAllAvailable()
      assert(table(dir) == Map(1L -> ("p1", 11.0), 2L -> ("p2", 20.0),
        3L -> ("p1", 30.0)))

      // batch 2: delete k=1, insert into a brand-new partition
      stream.addData(
        Change(1L, "p1", 0.0, seq = 4L, del = true),
        Change(4L, "p3", 40.0, seq = 5L, del = false))
      q.processAllAvailable()
      assert(table(dir) == Map(2L -> ("p2", 20.0), 3L -> ("p1", 30.0),
        4L -> ("p3", 40.0)))
    } finally q.stop()
  }

  test("CDC apply only rewrites partitions the batch touches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-prune").toString
    Seq((1L, "p1", 10.0), (2L, "p2", 20.0)).toDF("k", "p", "v")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    def p2Files: Map[String, Long] = {
      val d = new java.io.File(s"$dir/p=p2")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = p2Files
    val stream = MemoryStream[Change](spark)
    val q = StreamingCdc.applyChanges(stream.toDF(), dir,
      keys = Seq("k"), partitionCol = "p", seqCol = "seq", deleteCol = "del")
    try {
      stream.addData(Change(1L, "p1", 12.0, seq = 1L, del = false))
      q.processAllAvailable()
      assert(p2Files == before, "a p1-only change batch rewrote p2")
      assert(table(dir) == Map(1L -> ("p1", 12.0), 2L -> ("p2", 20.0)))
    } finally q.stop()
  }
}
