package graft

import graft.operators.Bpe
import graft.sources.Tables

/** Scratch probe: delta-vs-recount trainer cost and the deep-merge
  * smoke (dev aid; PERF.md records the results). */
object BpeDeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Tables.documents(spark, sf)
    println(s"PROBE docs=${docs.count()} sf=$sf")
    for (steps <- Seq(8, 16)) {
      val t0 = System.nanoTime()
      Bpe.learnMerges(docs, steps).collect()
      val tRecount = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Bpe.learnMergesDelta(docs, steps).collect()
      val tDelta = (System.nanoTime() - t1) / 1e9
      println(f"PROBE steps=$steps recount=$tRecount%.1fs delta=$tDelta%.1fs")
    }
    val t2 = System.nanoTime()
    val deep = Bpe.learnMergesDelta(docs, 256).collect()
    val tDeep = (System.nanoTime() - t2) / 1e9
    println(f"PROBE steps=256 delta=$tDeep%.1fs perRound=${tDeep / 256}%.3fs " +
      s"lastMerge=${deep.last.mkString(",")}")
  }
}
