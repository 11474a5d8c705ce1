package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over `events`-shaped data (SURVEY.md §2.2
  * "Streaming" row; the streaming twin of [[graft.operators.Relational.q13TimeWindow]]).
  *
  * Design for scale: every stateful operator is watermarked so state is
  * bounded (an unwatermarked streaming agg grows state forever — the
  * streaming analogue of the driver-side collect anti-pattern). State is
  * keyed by (window, event_type) or user_id, so it partitions across
  * executors like any shuffle.
  */
object EventStreams {

  /** Schema of the events table as a streaming file source sees it
    * (micro-second timestamps; the batch reader's nanos normalization in
    * [[graft.sources.Tables.events]] applies only to the nanos parquet). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Stream a directory of event files written with TIMESTAMP(NANOS)
    * (the driver's `events` table): nanos arrive as a long under
    * `spark.sql.legacy.parquet.nanosAsLong` — normalize to microsecond
    * timestamps exactly like the batch loader
    * ([[graft.sources.Tables.events]]), so stream and batch agree. */
  def readEventStreamNanos(spark: SparkSession, dir: String): DataFrame = {
    val nanosSchema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = LongType) else f))
    spark.readStream.schema(nanosSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Streaming twin of Q13: event-time tumbling 1-hour window per
    * event_type, late data dropped past the watermark. In append mode a
    * window emits exactly once, when the watermark passes its end. */
  def hourlyWindowedAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"),
        round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("s"))
      .select(col("window.start").as("w"), col("event_type"), col("c"), col("s"))

  /** Session windows: events of one user group into sessions separated by
    * `gap` of inactivity — the built-in session_window keeps state only
    * until watermark + gap. */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("events"),
        round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("total"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("events"), col("total"))

  /** Streaming exact dedup: drops rows whose `keys` were already seen,
    * keeping the seen-set only within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — without the bound the state grows
    * forever; the streaming twin of [[graft.operators.Dedup.exactDedup]]). */
  def dedupedStream(events: DataFrame, keys: Seq[String],
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserStat(user_id: Long, events: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState (the `Reducer`-with-state
    * generalization): running per-user event count + value total.
    *
    * `idleTimeout = Some(d)` expires idle users after a processing-time
    * timeout so state stays bounded without an event-time watermark —
    * note that a processing-time timeout makes the engine schedule
    * micro-batches continuously even with no incoming data (it must fire
    * timers), which is correct on a cluster but turns test harnesses that
    * wait for quiescence into busy loops; pass None there.
    */
  def runningUserStats(events: Dataset[UserEvent],
                       idleTimeout: Option[String] = Some("1 hour")): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](timeoutConf) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserStat]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            var n = 0L; var tot = 0.0
            batch.foreach { e => n += 1; tot += e.value }
            val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
            val next = UserStat(uid, prev.events + n,
              math.rint((prev.total + tot) * 100) / 100)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}
