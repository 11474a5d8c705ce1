package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: online top-token tracking with HARD-bounded
  * state — the streaming answer to [[graft.operators.TextAnalysis.qtVocab]]
  * (batch top-k vocabulary).
  *
  * A naive streaming `groupBy(token).count` keeps one state row per
  * DISTINCT token — unbounded on an open vocabulary. Instead each token
  * is hashed to one of `shards` keys and each shard runs a Misra-Gries
  * summary of `capacity` counters: arrivals of tracked tokens increment;
  * an untracked arrival with a full table decrements every counter
  * (dropping zeros) and records one global decrement. Total state is
  * EXACTLY ≤ shards × capacity counters forever.
  *
  * Guarantee (classic MG, per shard): counter ≤ true count ≤ counter +
  * decrements, and any token with true count > decrements is present in
  * the table. Sharding by token hash splits the stream into disjoint
  * sub-streams, so per-shard bounds apply to each token's full count
  * (a token lives in exactly one shard) — the union of shard tables
  * contains every token above any shard's decrement count, and
  * estimates carry their shard's error bound (`err`). Each batch emits
  * the shard's current table (update mode); [[currentTopK]] consolidates
  * an accumulated sink into the current global top-k.
  */
object StreamingHeavyHitters {

  case class TokenEvent(token: String)
  /** At EMISSION time: est ≤ true count ≤ est + err. `seq` is the
    * emitting shard's flush counter: a token lives in exactly one shard,
    * so its latest estimate is its max-`seq` row — the relational
    * "latest" key [[currentTopK]] consolidates on (sink row order is not
    * a contract). A row can go STALE between emissions — if its token is
    * later evicted, arrivals keep counting into the shard's decrement
    * total with no new row emitted — so a CURRENT bound must widen `err`
    * to the shard's latest decrement count ([[currentTopK]] does; `est`
    * stays a valid lower bound forever, counts only grow). */
  case class HitterEstimate(token: String, est: Long, err: Long, seq: Long,
                            shard: Long)

  case class MGState(counts: Map[String, Long], decrements: Long, seq: Long)

  def topTokens(tokens: DataFrame, shards: Int = 32,
                capacity: Int = 256): Dataset[HitterEstimate] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val sharded = tokens
      .select(col("token"), pmod(xxhash64(col("token")), lit(shards)).as("shard"))
      .as[(String, Long)]
    sharded
      .groupByKey(_._2)
      .flatMapGroupsWithState[MGState, HitterEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[(String, Long)], state: GroupState[MGState]) =>
          val st = state.getOption.getOrElse(MGState(Map.empty, 0L, 0L))
          var counts = scala.collection.mutable.Map[String, Long](st.counts.toSeq: _*)
          var dec = st.decrements
          val seq = st.seq + 1
          rows.foreach { case (tok, _) =>
            counts.get(tok) match {
              case Some(c) => counts(tok) = c + 1
              case None if counts.size < capacity => counts(tok) = 1L
              case None =>
                // Misra-Gries step: one arrival cancels one unit of every
                // tracked token; zeros drop out to make room
                dec += 1
                counts = counts.collect {
                  case (t, c) if c > 1 => (t, c - 1)
                }
            }
          }
          state.update(MGState(counts.toMap, dec, seq))
          counts.iterator.map { case (t, c) => HitterEstimate(t, c, dec, seq, shard) }
      }
  }

  /** Consolidate an accumulated [[topTokens]] sink into the CURRENT
    * global top-k: latest estimate per token (max `seq` within its
    * shard's emissions), ranked by `est` desc with a token tiebreak —
    * the same order as the batch vocabulary top-k, so when capacity
    * covers the vocabulary (err = 0) this equals
    * [[graft.operators.TextAnalysis.qtVocab]] exactly.
    *
    * The reported `err` is the token's SHARD's latest decrement count,
    * not the (possibly stale) row's own: a token evicted after its last
    * emission keeps counting into the shard's decrements with no new row
    * emitted, so only the shard-current slack bounds it now. For every
    * reported token, tracked or since-evicted: est ≤ true count ≤ est +
    * err (est was ≤ the count when emitted and counts only grow; an
    * evicted token's count is ≤ the current decrement total, a tracked
    * token's row is from the latest flush where counter + dec bounds it).
    *
    * Plan shape: per-token latest is a partitioned window (partial
    * WindowGroupLimit before the shuffle), the shard decrement table is
    * a bounded broadcast (≤ `shards` rows), the global rank is
    * TakeOrderedAndProject — no full sort, no driver-side vocabulary.
    */
  def currentTopK(hits: DataFrame, k: Int): DataFrame = {
    val latest = org.apache.spark.sql.expressions.Window
      .partitionBy("token").orderBy(col("seq").desc)
    // re-alias to mint fresh attribute ids: both join sides otherwise
    // share the sink plan's attributes and analysis rejects the self-join
    val shardDec = hits
      .select(col("shard").as("shard"), col("err").as("_sd_err"), col("seq").as("_sd_seq"))
      .groupBy("shard")
      .agg(max_by(col("_sd_err"), col("_sd_seq")).as("cur_dec"))
    hits
      .withColumn("_rn", row_number().over(latest))
      .filter(col("_rn") === 1)
      .join(broadcast(shardDec), "shard")
      .orderBy(col("est").desc, col("token"))
      .limit(k)
      .select(col("token"), col("est"), col("cur_dec").as("err"))
  }
}
