package graft

import org.apache.spark.sql.functions.col
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch probe: per-query exact-top-k hits of the qs_ann_lsh setting
  * (dev aid for pinning the certified recall floor the oracle row
  * asserts). */
object AnnBoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, d)
      val q = e.filter(col("vec_id") < 5)
      val exact = Similarity.bruteTopK(e, q, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((t, b) <- Seq((32, 6), (48, 6), (64, 6), (48, 5))) {
        val ann = Similarity.annTopK(e, q, 10, numTables = t, numBits = b)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = (exact & ann).groupBy(_._1).view.mapValues(_.size).toMap
        val perQ = (0L until 5L).map(i => i -> hits.getOrElse(i, 0)).toMap
        println(s"PROBE $d t=$t b=$b perQueryHits=$perQ min=${perQ.values.min} total=${perQ.values.sum}")
      }
    }
  }
}
