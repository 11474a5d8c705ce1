package graft

import org.apache.spark.sql.functions.col
import graft.operators.{TextAnalysis, TextIndex}
import graft.sources.{Tables, TxLog}
import graft.streaming.StreamingIndex

class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val workload = TextAnalysis.Bm25MultiWorkload.toDF("query_id", "term")

  private def serve(h: TextIndex.Handle) =
    TextIndex.serve(h, workload, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq

  test("corpus stream → TxLog commits → change stream → incrementally-maintained index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files.createTempDirectory("graft-si").toString
    val corpus = s"$base/corpus"
    val index = s"$base/index"
    val docs = Tables.documents(spark, sfSmall)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // documents arrive as a stream and LAND as TxLog commits
    val ingest = MemoryStream[(Long, String)](spark)
    val qIngest = ingest.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", s"$base/ckpt-ingest")
      .foreachBatch(TxLog.appendSink(corpus)).outputMode("append").start()
    // ...and the maintenance stream trails the corpus commits
    def startMaintain() =
      StreamingIndex.maintain(spark, corpus, index, s"$base/ckpt-index")
    try {
      ingest.addData(docs.take(200).toSeq: _*)
      qIngest.processAllAvailable()
      val qIdx = startMaintain()
      try {
        qIdx.processAllAvailable()
        // the streamed index serves exactly what a from-scratch build
        // over the current corpus serves
        val dir1 = java.nio.file.Files.createTempDirectory("graft-si-r1").toString
        TextIndex.save(TxLog.read(spark, corpus), dir1)
        assert(serve(TextIndex.loadVersioned(spark, index)) ==
          serve(TextIndex.load(spark, dir1)))
        // more documents arrive; both streams advance
        ingest.addData(docs.drop(200).toSeq: _*)
        qIngest.processAllAvailable()
        qIdx.processAllAvailable()
        val dir2 = java.nio.file.Files.createTempDirectory("graft-si-r2").toString
        TextIndex.save(TxLog.read(spark, corpus), dir2)
        assert(serve(TextIndex.loadVersioned(spark, index)) ==
          serve(TextIndex.load(spark, dir2)),
          "index must trail the corpus exactly after the second batch")
        // index versions map to corpus commits (lockstep with history)
        assert(TxLog.versions(spark, s"$index/postings").size ==
          TxLog.versions(spark, corpus).size)
      } finally qIdx.stop()
      // restart the maintenance stream: nothing new → no new versions
      val before = TxLog.versions(spark, s"$index/postings")
      val qIdx2 = startMaintain()
      try qIdx2.processAllAvailable() finally qIdx2.stop()
      assert(TxLog.versions(spark, s"$index/postings") == before,
        "an idle restart must not create index versions")
    } finally qIngest.stop()
  }
}
