package graft

import org.apache.spark.sql.functions.col
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch probe: measure LSH ANN recall vs exact top-k across parameter
  * settings (dev aid for pinning SimilaritySpec thresholds). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteTopK(e, q, 10)
      .filter(col("qid") =!= col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((t, b) <- Seq((16, 8), (16, 6), (32, 6), (16, 5), (8, 6))) {
      val t0 = System.nanoTime()
      val ann = Similarity.annTopK(e, q, 10, t, b)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE tables=$t bits=$b recall=${(exact & ann).size.toDouble / exact.size}%.3f time=$dt%.1fs")
    }
  }
}
