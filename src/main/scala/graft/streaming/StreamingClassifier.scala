package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Classifier

/** Online serving of the batch-trained quality probe
  * ([[graft.operators.Classifier]]): the train-offline / score-online
  * split every production gate runs. The weights arrive as an ARTIFACT
  * (five longs) and enter the plan as literals via
  * [[Classifier.scoreExpr]], so scoring a stream is a stateless
  * codegen'd projection — zero state rows, zero joins, zero shuffles;
  * at 100 TB/day of arrivals the gate's cost is exactly the scan.
  *
  * [[monitor]] adds the piece an online gate cannot ship without: a
  * watermarked per-window accept-rate report (docs, accepted, score
  * range). Drifting input shows up as a moving accept rate long before
  * anyone reads the gated corpus — the online twin of the batch decile
  * report (`qc_score_sweep`), bounded-state by the watermark.
  */
object StreamingClassifier {

  /** Score each arriving doc and keep those with `s >= threshold`.
    * Input carries (doc_id, text, ts); output (doc_id, s, ts).
    * Works identically on a static relation — the batch twin the spec
    * pins is this same function applied to the same rows. */
  def gate(docs: DataFrame, w: Array[Long], threshold: Long): DataFrame =
    docs.select(col("doc_id"), Classifier.scoreExpr(w).as("s"), col("ts"))
      .filter(col("s") >= threshold)

  /** Per-window gate telemetry over ALL arrivals (kept and dropped):
    * (window, n_docs, n_accepted, min_s, max_s). Input must already
    * carry a watermark on `ts` when streaming; state is one row per
    * open window. */
  def monitor(docs: DataFrame, w: Array[Long], threshold: Long,
              windowLen: String = "10 seconds"): DataFrame =
    docs.select(Classifier.scoreExpr(w).as("s"), col("ts"))
      .groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("s") >= threshold, 1)).as("n_accepted"),
        min("s").as("min_s"), max("s").as("max_s"))
}
