package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Classifier
import graft.streaming.StreamingClassifier

case class ClfDoc(doc_id: Long, text: String, ts: Timestamp)

/** Train-offline / score-online: weights trained by the batch perceptron
  * gate a stream through the SAME scoring expression, so the streamed
  * accept set and the batch twin must agree doc-for-doc. */
class StreamingClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("streamed gate == batch twin on real-corpus docs, scores bit-equal") {
    val w = Classifier.train(spark, sfTiny)
    assert(w.exists(_ != 0L), "training must move the weights")
    // real corpus text through the stream, in two micro-batches
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").orderBy("doc_id").limit(40).collect()
      .zipWithIndex.map { case (r, i) => ClfDoc(r.getLong(0), r.getString(1), ts(i)) }
    // median-ish threshold so BOTH fates occur (a gate that accepts or
    // rejects everything proves nothing)
    val batchAll = StreamingClassifier.gate(
      docs.toSeq.toDF(), w, Long.MinValue).collect()
    val threshold = batchAll.map(_.getLong(1)).sorted.apply(batchAll.length / 2)

    val stream = MemoryStream[ClfDoc](spark)
    val gated = StreamingClassifier.gate(
      stream.toDF().withWatermark("ts", "10 seconds"), w, threshold)
    val q = gated.writeStream.format("memory")
      .queryName("clf_gate").outputMode("append").start()
    try {
      stream.addData(docs.take(25).toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(docs.drop(25).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("clf_gate").select("doc_id", "s")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val twin = StreamingClassifier.gate(docs.toSeq.toDF(), w, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == twin, s"gate drift: streamed ${got.size} vs batch ${twin.size}")
      assert(got.nonEmpty && got.size < docs.length,
        s"threshold must split the corpus, accepted ${got.size}/${docs.length}")
    } finally q.stop()
  }

  /** The curation loop end-to-end: docs stream through the trained
    * gate, accepted rows land as versioned TxLog commits — so "the
    * gated corpus as of version V" is pinned forever while the stream
    * keeps appending. The composite the pieces individually promise. */
  test("gate -> TxLog landing: versioned gated corpus, pinned reads stable") {
    import graft.sources.TxLog
    val w = Classifier.train(spark, sfTiny)
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").orderBy("doc_id").limit(40).collect()
      .zipWithIndex.map { case (r, i) => ClfDoc(r.getLong(0), r.getString(1), ts(i)) }
    val scores = StreamingClassifier.gate(docs.toSeq.toDF(), w, Long.MinValue)
      .collect().map(_.getLong(1)).sorted
    val threshold = scores(scores.length / 2)

    val dir = java.nio.file.Files.createTempDirectory("clf_land").toString
    val table = s"$dir/gated"
    val stream = MemoryStream[ClfDoc](spark)
    val gated = StreamingClassifier.gate(
      stream.toDF().withWatermark("ts", "10 seconds"), w, threshold)
    val q = gated.writeStream.foreachBatch(TxLog.appendSink(table))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      stream.addData(docs.take(25).toIndexedSeq: _*)
      q.processAllAvailable()
      val v0 = TxLog.versions(spark, table).last
      val atV0 = TxLog.read(spark, table, asOf = Some(v0))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      stream.addData(docs.drop(25).toIndexedSeq: _*)
      q.processAllAvailable()

      val twin = StreamingClassifier.gate(docs.toSeq.toDF(), w, threshold)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val latest = TxLog.read(spark, table)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(latest == twin, s"landed gated corpus drift: ${latest.size} vs ${twin.size}")
      // the pinned version still reads exactly the first batch's accepts
      val atV0Again = TxLog.read(spark, table, asOf = Some(v0))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(atV0Again == atV0 && atV0.subsetOf(latest) && atV0.size < latest.size,
        s"pinned version must be stable and strictly precede the latest")
    } finally q.stop()
  }

  test("windowed monitor == batch windowed aggregate (complete mode)") {
    val w = Classifier.train(spark, sfTiny)
    val docs = graft.sources.Tables.documents(spark, sfTiny)
      .select("doc_id", "text").orderBy("doc_id").limit(30).collect()
      // 3 per 10-second window
      .zipWithIndex.map { case (r, i) => ClfDoc(r.getLong(0), r.getString(1), ts(4 * i)) }
    val threshold = 0L

    val stream = MemoryStream[ClfDoc](spark)
    val mon = StreamingClassifier.monitor(
      stream.toDF().withWatermark("ts", "1 minute"), w, threshold)
    val q = mon.writeStream.format("memory")
      .queryName("clf_mon").outputMode("complete").start()
    try {
      stream.addData(docs.take(13).toIndexedSeq: _*)
      q.processAllAvailable()
      stream.addData(docs.drop(13).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("clf_mon")
        .select(col("window.start"), col("n_docs"), col("n_accepted"),
          col("min_s"), col("max_s"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val twin = StreamingClassifier.monitor(docs.toSeq.toDF(), w, threshold)
        .select(col("window.start"), col("n_docs"), col("n_accepted"),
          col("min_s"), col("max_s"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == twin, s"monitor drift:\n got=$got\ntwin=$twin")
      assert(got.size > 1, "must cover multiple windows")
    } finally q.stop()
  }
}
