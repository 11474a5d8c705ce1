package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions

/** Streaming near-duplicate detection: the online twin of
  * [[graft.operators.Dedup.minhashPairs]].
  *
  * Incoming documents are minhash-signed at the scan (native
  * `minhash_signature`), banded, and routed to per-(band, bucket) keyed
  * state holding the signatures seen in that bucket. A new document is
  * compared against its bucket's residents — estimated Jaccard = the
  * fraction of matching signature elements — and emits a hit when it
  * crosses the threshold. State is bounded per bucket (`maxPerBucket`,
  * FIFO eviction), so total state ≤ buckets × maxPerBucket signatures
  * regardless of stream length — the keyed-state analogue of a
  * watermark bound.
  *
  * A true pair collides in several buckets and so may emit more than
  * once; consumers that need exactly-one-hit semantics de-duplicate on
  * (doc_id, dup_of) downstream.
  */
object StreamingDedup {

  case class DocEvent(doc_id: Long, text: String)
  case class DupHit(doc_id: Long, dup_of: Long, est_j: Double)

  /** Bucket-state entry (public: the state encoder's generated code must
    * reach the constructor). */
  case class Resident(id: Long, sig: Seq[Long])

  def nearDupHits(docs: DataFrame, minJ: Double, n: Int = 3, k: Int = 64,
                  r: Int = 4, maxPerBucket: Int = 64): Dataset[DupHit] = {
    val spark = docs.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val nBands = k / r
    val banded = docs
      .withColumn("sig", expr(s"minhash_signature(text, $n, $k)"))
      .select(col("doc_id"), col("sig"),
        posexplode(expr(s"transform(sequence(0, ${nBands - 1}), " +
          s"j -> xxhash64(slice(sig, j * $r + 1, $r)))"))
          .as(Seq("band_idx", "bucket")))
      .select(col("doc_id"), col("sig"),
        concat_ws(":", col("band_idx"), col("bucket")).as("bkey"))
      .as[(Long, Seq[Long], String)]

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[Resident], DupHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Seq[Long], String)],
         state: GroupState[List[Resident]]) =>
          var residents = state.getOption.getOrElse(Nil)
          val hits = scala.collection.mutable.ListBuffer[DupHit]()
          rows.foreach { case (id, sig, _) =>
            residents.foreach { res =>
              var same = 0
              var i = 0
              while (i < sig.length) { if (sig(i) == res.sig(i)) same += 1; i += 1 }
              val est = same.toDouble / sig.length
              if (est >= minJ && res.id != id) hits += DupHit(id, res.id, est)
            }
            residents = (Resident(id, sig) :: residents).take(maxPerBucket)
          }
          state.update(residents)
          hits.iterator
      }
  }
}
