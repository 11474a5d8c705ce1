package graft
import graft.operators.Bpe
import graft.sources.Tables
object BpeRoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SharedSpark.spark
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Bpe.learnMergesDelta(docs, 16, verbose = true).collect()
  }
}
