package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftFunctions

/** Streaming approximate similarity search: the online twin of
  * [[graft.operators.Similarity.annTopK]] — each arriving vector is
  * matched against the similar vectors ALREADY SEEN on the stream.
  *
  * Same architecture as [[StreamingDedup]] (one keyed-state shape serves
  * both modalities): vectors are sign-random-projection sketched at the
  * scan (native `cosine_lsh_sketch`), each (table, bucket) key holds the
  * recent residents of that bucket, and an arrival is exact-cosine
  * scored against its bucket's residents only — never against the whole
  * history. Recall follows the batch ANN math (1-(1-p^bits)^tables,
  * p = 1-θ/π): near-parallel vectors agree on some table's signature
  * w.h.p.; an accidental collision of unrelated vectors is filtered by
  * the exact `minCos` verify.
  *
  * State bounds mirror [[StreamingDedup]]: depth per bucket is
  * `maxPerBucket` (FIFO); bucket-key COUNT is bounded only with
  * `stateTtlMs` > 0 (event-time TTL; requires a watermarked `ts` column)
  * — without it, keys grow with distinct content over an infinite
  * stream. A pair colliding in several tables may emit more than once;
  * de-duplicate on (vec_id, neighbor_id) downstream if needed.
  */
object StreamingSimilarity {

  case class VecEvent(vec_id: Long, embedding: Seq[Float])
  case class VecEventTs(vec_id: Long, embedding: Seq[Float], ts: java.sql.Timestamp)
  case class Neighbor(vec_id: Long, neighbor_id: Long, cos: Double)

  /** Bucket-state entry (public for the state encoder's generated code). */
  case class VecResident(id: Long, vec: Seq[Float])

  private[graft] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  def neighborsSeen(vecs: DataFrame, minCos: Double, numTables: Int = 16,
                    numBits: Int = 8, maxPerBucket: Int = 64,
                    stateTtlMs: Long = 0L): Dataset[Neighbor] = {
    val spark = vecs.sparkSession
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    require(stateTtlMs <= 0 || vecs.columns.contains("ts"),
      "stateTtlMs > 0 needs a watermarked 'ts' event-time column")
    val tsCol = if (stateTtlMs > 0) col("ts") else lit(null).cast("timestamp")
    val banded = vecs
      .select(col("vec_id"), col("embedding"), tsCol.as("ts"),
        posexplode(expr(s"cosine_lsh_sketch(embedding, $numTables, $numBits)"))
          .as(Seq("t", "bucket")))
      .select(col("vec_id"), col("embedding"),
        concat_ws(":", col("t"), col("bucket")).as("bkey"), col("ts"))
      .as[(Long, Seq[Float], String, java.sql.Timestamp)]

    val timeout =
      if (stateTtlMs > 0) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    banded
      .groupByKey(_._3)
      .flatMapGroupsWithState[List[VecResident], Neighbor](
        OutputMode.Update, timeout) {
        (_: String, rows: Iterator[(Long, Seq[Float], String, java.sql.Timestamp)],
         state: GroupState[List[VecResident]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil)
            var maxTs = Long.MinValue
            val hits = scala.collection.mutable.ListBuffer[Neighbor]()
            rows.foreach { case (id, vec, _, ts) =>
              if (ts != null && ts.getTime > maxTs) maxTs = ts.getTime
              residents.foreach { res =>
                val c = cosine(vec, res.vec)
                if (c >= minCos && res.id != id)
                  hits += Neighbor(id, res.id, math.rint(c * 1e6) / 1e6)
              }
              residents = (VecResident(id, vec) :: residents).take(maxPerBucket)
            }
            state.update(residents)
            if (stateTtlMs > 0)
              state.setTimeoutTimestamp(
                math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            hits.iterator
          }
      }
  }
}
