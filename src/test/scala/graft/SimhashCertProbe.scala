package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch probe: can qd_simhash self-certify? Measures, per SF, whether
  * every identical-text pair lands at hamming 0 (mathematical) and
  * whether every exact-Jaccard ≥ 0.9 pair is inside radius 3 on this
  * corpus (empirical — needs to hold at every driver SF to certify). */
object SimhashCertProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = Tables.documents(spark, d)
      val sim = Dedup.simhashPairs(docs, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val dupPairs = docs.select(col("text"), col("doc_id"))
        .groupBy("text").agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")) > 1)
        .collect().flatMap { r =>
          val ids = r.getAs[Seq[Long]]("ids").sorted
          for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
        }.toSet
      val j09 = Dedup.ngramJaccardPairs(docs, minJ = 0.9, maxDocFreq = Dedup.NgramMaxDocFreq)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dupAtZero = dupPairs.forall(p => sim.get(p).contains(0L))
      val j09Found = j09.count(sim.contains)
      println(s"PROBE $d simPairs=${sim.size} exactDup=${dupPairs.size} dupAtZero=$dupAtZero " +
        s"j09=${j09.size} j09Found=$j09Found hammingOfJ09missing=${j09.filterNot(sim.contains).take(3)}")
    }
  }
}
