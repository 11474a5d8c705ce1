package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Temporal join operators over the `events` table: as-of join and
  * bounded interval join — the two time-series shapes a training-data /
  * clickstream pipeline needs that plain equi-joins can't express.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), so [[asofJoin]]
  * composes it from built-ins — the preferred path before custom plans:
  * union the two sides, one shuffle by key, in-partition sort by time,
  * and a running `last(value, ignoreNulls)` window. Each partition
  * streams once; no per-row probe, no range join explosion. Skew note: a
  * hot key's rows meet in one task (like any partitioned window) — the
  * window is a simple running carry, so cost is linear in the key's rows
  * and spills at worst; salt the key upstream if a single key exceeds a
  * task's disk.
  */
object Temporal {
  private val T = Tables

  /** As-of join: attach to each `left` row the `valueCol` of the LATEST
    * `right` row with `right.ts <= left.ts` for the same `key` (null when
    * no prior right row exists — i.e. ASOF LEFT JOIN, `>=` semantics).
    *
    * Contract: both sides carry (`key`, `ts`); `right` rows must be
    * unique per (key, ts) — pre-aggregate otherwise (ties would make the
    * match nondeterministic in ANY engine). Right rows order BEFORE left
    * rows at the same timestamp, so an exactly-simultaneous right row IS
    * matched, mirroring the `>=` of `ASOF JOIN ... ON l.ts >= r.ts`.
    * Output: `left`'s columns plus `asof_<valueCol>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String): DataFrame = {
    // The carried value is WRAPPED in a struct: `last(_, ignoreNulls)`
    // must skip only the left rows' padding, never a right row whose
    // value happens to BE null — a bare nullable column can't tell the
    // two apart (a null-valued right row would leak the previous row's
    // value instead of the latest row's null, diverging from ASOF LEFT
    // JOIN). A struct is null only for the padding; a matched null value
    // arrives as a non-null struct with a null field.
    val vType = right.schema(valueCol).dataType
    val rTagged = right.select(col(key), col(ts),
        struct(col(valueCol).as("v")).as("_asof_v"))
      .withColumn("_kind", lit(0))
    val lTagged = left
      .withColumn("_asof_v",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          Seq(org.apache.spark.sql.types.StructField("v", vType)))))
      .withColumn("_kind", lit(1))
    // right rows sort first at equal ts (kind 0 < 1): >= match semantics
    val w = Window.partitionBy(key).orderBy(col(ts), col("_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_m", last(col("_asof_v"), ignoreNulls = true).over(w))
      .filter(col("_kind") === 1)
      .withColumn(s"asof_$valueCol", col("_m.v"))
      .drop("_asof_v", "_kind", "_m")
  }

  // ---- query-pack entries ----

  /** QE1 — as-of join: each click matched to the user's most recent view
    * at or before it. Views are pre-deduped to one per (user, ts) — the
    * determinism contract of [[asofJoin]] — and the oracle is DuckDB's
    * native ASOF LEFT JOIN, a genuine cross-engine differential for an
    * operator Spark lacks. */
  def qeAsof(spark: SparkSession, d: String): DataFrame = {
    val e = T.events(spark, d)
    val views = e.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    asofJoin(clicks, views, "user_id", "ts", "view_id")
      .select(col("click_id"), col("user_id"), col("asof_view_id").as("view_id"))
      .orderBy("click_id")
  }

  /** QE2 — bounded interval join, batch form: every (view, click) pair of
    * one user with the click inside [view_ts, view_ts + 60 min]. Exactly
    * [[graft.streaming.EventStreams.clickViewAttribution]] run on a batch
    * frame (withWatermark is a no-op there) — the batch/stream pair share
    * one code path, and this entry pins it against a DuckDB oracle.
    * Plans as an equi-join on user_id with the time bounds as post-join
    * filters — no range-join explosion. */
  def qeAttribution(spark: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.clickViewAttribution(T.events(spark, d))
      .select("user_id", "view_id", "click_id")
      .orderBy("click_id", "view_id")

  /** QE3 — batch sessionization: Spark's `session_window` (via the
    * shared [[graft.streaming.EventStreams.userSessions]] code path —
    * watermark is a no-op in batch) checked against the classic
    * gaps-and-islands SQL formulation (LAG → boundary flag → running sum
    * → group). Two entirely different algorithms, one contract: events
    * of a user belong to one session iff consecutive gaps < 30 min;
    * session_end = last event + gap. */
  def qeSessions(spark: SparkSession, d: String): DataFrame =
    graft.streaming.EventStreams.userSessions(T.events(spark, d))
      .orderBy("user_id", "session_start")

  /** Point-in-interval lookup join with NO equi key (the IP-to-geo /
    * value-to-band class): Spark plans a bare `v BETWEEN lo AND hi` join
    * as BroadcastNestedLoopJoin — O(points × ranges) per partition, the
    * plan that dies first at 100 TB. The Spark-first rewrite BUCKETIZES:
    * each range explodes to the fixed-width buckets it intersects, each
    * point maps to exactly one bucket, and the join becomes a plain
    * hash-partitioned equi-join on the bucket id + a residual BETWEEN
    * filter. A point lives in one bucket, so no pair can duplicate.
    *
    * `bucketWidth` trades explode fan-out (≈ avg range width / bucket
    * width rows per range) against bucket selectivity (ranges sharing a
    * bucket that don't match the point). Both sides stay declarative —
    * Catalyst still pushes filters, AQE still picks broadcast when the
    * exploded range side is small.
    *
    * `maxFanout` is the foot-gun guard: one sentinel-wide range (say
    * `[0, Long.MaxValue]`) would otherwise explode to billions of bucket
    * rows — Spark's `sequence` only rejects it AFTER planning, and a
    * merely-huge range fans out silently. Any range spanning more than
    * `maxFanout` buckets fails the job loudly (per-row `raise_error`
    * naming the offending bounds) instead of melting the shuffle; widen
    * `bucketWidth` or raise the cap deliberately. The guard is woven
    * into the `sequence` upper bound so column pruning can never drop
    * it. Inputs must not share column names (the residual BETWEEN would
    * be ambiguous) — checked up front. */
  def rangeLookupJoin(points: DataFrame, pointCol: String,
                      ranges: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, maxFanout: Long = 1 << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxFanout > 0, s"maxFanout must be positive: $maxFanout")
    val shared = points.columns.toSet.intersect(ranges.columns.toSet)
    require(shared.isEmpty,
      s"rangeLookupJoin: points and ranges share column names ${shared.mkString(", ")} — " +
        "rename one side; the residual BETWEEN filter would be ambiguous")
    val bkt = "_graft_range_bkt"
    require(!points.columns.contains(bkt) && !ranges.columns.contains(bkt),
      s"rangeLookupJoin: inputs may not already carry the internal column $bkt")
    val rb = ranges.withColumn(bkt, explode(guardedBuckets(
      "rangeLookupJoin", startCol, endCol, bucketWidth, maxFanout)))
    val pb = points.withColumn(bkt, expr(s"CAST($pointCol AS BIGINT) div $bucketWidth"))
    pb.join(rb, bkt)
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop(bkt)
  }

  /** The fan-out-guarded bucket array shared by [[rangeLookupJoin]] and
    * [[intervalOverlapJoin]]. The guard rides the bucket array itself —
    * an unused side column holding assert_true would be pruned away with
    * the assertion. Order matters: an INVERTED range (hi < lo) must
    * translate to zero buckets — its residual predicate matches nothing
    * under the closed-interval contract — and must not reach `sequence`,
    * which would generate a DESCENDING sequence and bypass the fan-out
    * cap with a negative span (a corrupted sentinel row would otherwise
    * explode over the whole domain unguarded). */
  private def guardedBuckets(opName: String, startCol: String, endCol: String,
                             bucketWidth: Long, maxFanout: Long)
      : org.apache.spark.sql.Column = {
    val loB = expr(s"CAST($startCol AS BIGINT) div $bucketWidth")
    val hiB = expr(s"CAST($endCol AS BIGINT) div $bucketWidth")
    val span = hiB - loB
    when(span < 0, typedlit(Seq.empty[Long]))
      .when(span < lit(maxFanout), sequence(loB, hiB))
      .otherwise(raise_error(format_string(
        s"$opName: range [%s, %s] spans %s buckets at bucketWidth=$bucketWidth, " +
          s"over maxFanout=$maxFanout — widen bucketWidth or raise maxFanout",
        col(startCol), col(endCol), span + lit(1))).cast("array<bigint>"))
  }

  /** Interval-OVERLAP join (range × range, no equi key): all (left,
    * right) pairs whose closed intervals intersect —
    * `l.lo <= r.hi AND r.lo <= l.hi` — the campaigns-vs-sessions /
    * genomic-intervals class. Spark plans the bare predicate as a
    * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons); at 100 TB that is
    * the first plan to die. Same bucketization as [[rangeLookupJoin]],
    * but BOTH sides explode to the fixed-width buckets they cover, the
    * join becomes a hash equi-join on bucket id, and a residual overlap
    * filter removes bucket-mates that don't intersect.
    *
    * Unlike the point case, an overlapping pair shares EVERY bucket in
    * the intersection of the two covers, so the join would duplicate it
    * once per shared bucket. The dedup is responsibility assignment, not
    * a `distinct()`: the shared cover starts at
    * `max(floor(l.lo/w), floor(r.lo/w))`, so the pair is kept only in
    * that one bucket — pure per-row arithmetic, no extra shuffle.
    *
    * Contract mirrors [[rangeLookupJoin]]: disjoint column sets, bounds
    * castable to BIGINT, per-side fan-out capped loudly by `maxFanout`,
    * and an inverted interval (hi < lo) is EMPTY — it joins nothing,
    * diverging from what the raw SQL predicate would do with it (the
    * predicate accidentally matches inverted intervals nested inside
    * wide ones). */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                          right: DataFrame, rStart: String, rEnd: String,
                          bucketWidth: Long, maxFanout: Long = 1 << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(maxFanout > 0, s"maxFanout must be positive: $maxFanout")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlapJoin: inputs share column names ${shared.mkString(", ")} — " +
        "rename one side; the residual overlap filter would be ambiguous")
    val bkt = "_graft_iv_bkt"
    val lLoB = "_graft_iv_llo"
    val rLoB = "_graft_iv_rlo"
    val taken = Seq(bkt, lLoB, rLoB)
    require(!taken.exists(c => left.columns.contains(c) || right.columns.contains(c)),
      s"intervalOverlapJoin: inputs may not carry the internal columns ${taken.mkString(", ")}")
    val lb = left
      .withColumn(lLoB, expr(s"CAST($lStart AS BIGINT) div $bucketWidth"))
      .withColumn(bkt, explode(guardedBuckets(
        "intervalOverlapJoin", lStart, lEnd, bucketWidth, maxFanout)))
    val rb = right
      .withColumn(rLoB, expr(s"CAST($rStart AS BIGINT) div $bucketWidth"))
      .withColumn(bkt, explode(guardedBuckets(
        "intervalOverlapJoin", rStart, rEnd, bucketWidth, maxFanout)))
    lb.join(rb, bkt)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col(bkt) === greatest(col(lLoB), col(rLoB)))
      .drop(taken: _*)
  }

  /** SCD2 history build — the warehouse-side temporal versioning op
    * (Kimball type-2 slowly-changing dimension): a change log of
    * (key, ts, attr) becomes validity INTERVALS — one row per state,
    * `[valid_from, valid_to)`, open-ended for the current state — the
    * table an [[asofJoin]] or point-in-time query reads. Two window
    * passes over the same (key, ts) partitioning (so ONE shuffle —
    * Spark reuses the sort): (1) change compression: a row whose attr
    * null-safely equals the previous row's is a no-change update and
    * drops; (2) `lead(ts)` closes each surviving interval.
    *
    * Contract: one row per (key, ts) — pre-aggregate ties upstream
    * (the query below uses max_by(event_id) as the deterministic
    * tie-break). Nulls in `attr` are states like any other (null-safe
    * comparison), not gaps. */
  def scd2Build(changes: DataFrame, key: String, ts: String,
                attr: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    changes
      .withColumn("_prev", lag(col(attr), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      // null-safe: attr going null→null is NO change; x→null and
      // null→x are changes; the first row always opens an interval
      .filter(col("_first") || !(col(attr) <=> col("_prev")))
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_prev", "_first", ts)
  }

  /** QE6 — SCD2 over each user's event-type state: consecutive
    * same-type events compress away; what remains is the transition
    * history with validity intervals. Oracle = the same two-window
    * formulation in DuckDB (IS DISTINCT FROM mirrors the null-safe
    * compare). */
  def qeScd2(spark: SparkSession, d: String): DataFrame =
    scd2Build(
      T.events(spark, d)
        .groupBy("user_id", "ts")
        .agg(max_by(col("event_type"), col("event_id")).as("state")),
      key = "user_id", ts = "ts", attr = "state")
      .select("user_id", "state", "valid_from", "valid_to", "is_current")
      .orderBy("user_id", "valid_from")

  /** QE4 — the bucketized range lookup end to end: synthetic disjoint
    * value bands from `supplier`, order keys hashed into the band space,
    * per-band hit counts. Oracle = DuckDB's plain BETWEEN join — exact
    * row parity proves the bucket rewrite loses and duplicates nothing. */
  def qeRangeLookup(spark: SparkSession, d: String): DataFrame = {
    val ranges = T.supplier(spark, d).select(
      col("s_suppkey").as("range_id"),
      (col("s_suppkey") * 97).as("lo"),
      (col("s_suppkey") * 97 + 53).as("hi"))
    val points = T.orders(spark, d).select((col("o_orderkey") % 7919).as("v"))
    rangeLookupJoin(points, "v", ranges, "lo", "hi", bucketWidth = 64)
      .groupBy("range_id")
      .agg(count(lit(1)).as("hits"))
      .orderBy("range_id")
  }

  /** QE5 — the interval-overlap join end to end: order-derived intervals
    * (width 0–22) against supplier value bands (width 53), per-band pair
    * count and total interval span. Oracle = DuckDB's plain overlap join
    * (`l_lo <= r_hi AND r_lo <= l_hi`) — exact parity proves the
    * two-sided bucket rewrite with responsibility dedup loses and
    * duplicates nothing. */
  def qeIntervalJoin(spark: SparkSession, d: String): DataFrame = {
    val l = T.orders(spark, d).select(
      (col("o_orderkey") % 7919).as("l_lo"),
      (col("o_orderkey") % 7919 + col("o_orderkey") % 23).as("l_hi"))
    val r = T.supplier(spark, d).select(
      col("s_suppkey").as("range_id"),
      (col("s_suppkey") * 97).as("r_lo"),
      (col("s_suppkey") * 97 + 53).as("r_hi"))
    intervalOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", bucketWidth = 64)
      .groupBy("range_id")
      .agg(count(lit(1)).as("hits"),
        sum(col("l_hi") - col("l_lo")).as("span_sum"))
      .orderBy("range_id")
  }

  /** QE-FUNNEL — ordered conversion funnel (view → click → purchase):
    * a user counts at step k only if the step-k event happens STRICTLY
    * AFTER their step-(k-1) entry time — the sequencing that separates
    * a funnel from three independent filters (a purchase before the
    * first view must not convert). Formulated as per-step min-timestamp
    * tables chained by (user, ts > prev) joins: each step's table is
    * one row per surviving user, so the chain is user-dimension-sized
    * hash equi-joins (never event×event), partial-aggregable, and the
    * final counts are three 1-row aggregates stitched by broadcast
    * cross joins. Conversion ratios are divisions of exact longs,
    * rounded 1e-6. */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    // per-user entry time per step: t_k = min ts of a step-k event with
    // ts > t_{k-1}
    var entered = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    var tables = Vector(entered)
    for (s <- steps.tail) {
      entered = events.filter(col("event_type") === s)
        .join(entered.select(col("user_id"), col("t").as("prev_t")), "user_id")
        .filter(col("ts") > col("prev_t"))
        .groupBy("user_id").agg(min("ts").as("t"))
      tables = tables :+ entered
    }
    val counts = tables.zipWithIndex.map { case (t, i) =>
      t.agg(count(lit(1)).as(s"u$i"))
    }
    val wide = counts.map(broadcast).reduce(_ crossJoin _)
    val rows = steps.indices.map { i =>
      wide.select(lit(i + 1).as("step"), lit(steps(i)).as("label"),
        col(s"u$i").as("users"),
        round(col(s"u$i").cast("double") / col("u0"), 6).as("conv"))
    }
    rows.reduce(_ unionByName _).orderBy("step")
  }

  /** QE5 — [[funnel]] over `events` with the view→click→purchase path. */
  def qeFunnel(spark: SparkSession, d: String): DataFrame =
    funnel(T.events(spark, d))

  /** QE-COHORT — weekly cohort retention: users grouped by the week of
    * their first event (the cohort), counted as active in each later
    * week they emit any event. Both halves are aggregates with map-side
    * combine (first-event per user; distinct user-weeks), joined on the
    * user dimension; the output is cohorts × weeks — tiny — while no
    * intermediate ever exceeds the distinct (user, week) set. The
    * classic growth-analytics matrix, and at 100 TB the shape that
    * matters: events stream through one aggregate, never self-join. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firstWeek = events.groupBy("user_id")
      .agg(date_trunc("week", min("ts")).as("cohort_week"))
    val activeWeeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    activeWeeks.join(firstWeek, "user_id")
      // week-aligned dates make the day diff an exact multiple of 7;
      // integer `div` sidesteps DuckDB's round-on-cast vs Spark's
      // truncate divergence entirely
      .withColumn("week_offset", expr("datediff(week, cohort_week) div 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** QE6 — [[cohortRetention]] over `events`. */
  def qeCohort(spark: SparkSession, d: String): DataFrame =
    cohortRetention(T.events(spark, d))

  /** Rolling z-score anomaly detection: each event is scored against the
    * mean/stddev of its own TRAILING window — the `lookback` rows before
    * it, never itself (a self-inclusive window leaks the outlier into
    * its own baseline and mutes exactly the spikes being hunted). Rows
    * whose |z| exceeds `zThresh` are flagged; rows with a degenerate
    * baseline (fewer than 2 prior events, or zero variance) can't be
    * scored and are skipped.
    *
    * Shape at 100 TB: one shuffle by key, each partition streamed once
    * in time order by the window operator — linear per key, no
    * self-join, no collect. Skew = one hot key's rows in one task, same
    * bound as any per-key window (salt upstream if a key outgrows a
    * task). z is rounded to 4 decimals and the threshold applied to the
    * ROUNDED value, so the oracle comparison is bit-stable across
    * engines' summation orders. */
  def rollingAnomalies(events: DataFrame, lookback: Int, zThresh: Double,
                       key: String = "user_id", ts: String = "ts",
                       value: String = "value"): DataFrame = {
    require(lookback >= 2, s"rollingAnomalies: lookback must be >= 2, got $lookback")
    val w = Window.partitionBy(key).orderBy(col(ts), col("event_id"))
      .rowsBetween(-lookback, -1)
    events
      .withColumn("mu", avg(value).over(w))
      .withColumn("sigma", stddev_samp(value).over(w))
      .withColumn("z", round((col(value) - col("mu")) / col("sigma"), 4))
      .filter(col("sigma") > 0 && abs(col("z")) > zThresh)
      .select(col("event_id"), col(key), col("z"))
  }

  /** QE7 — [[rollingAnomalies]] over `events`: 20-event trailing
    * baseline per user, |z| > 2.5. */
  def qeAnomaly(spark: SparkSession, d: String): DataFrame =
    rollingAnomalies(T.events(spark, d), lookback = 20, zThresh = 2.5)
      .orderBy("event_id")

  /** Exponentially-weighted moving average per key — the time-series
    * smoothing/feature-engineering primitive — as a `taps`-term FIR
    * truncation: ewma_t = Σ_j (1−α)^j·v_{t−j} / Σ_j (1−α)^j over the
    * lags that exist (series heads renormalize over the shorter
    * window, the standard `adjust=true` definition). Truncation error
    * is (1−α)^taps — for the default 8 taps at α = 0.3, < 6 % weight
    * beyond the window, and the result is EXACTLY reproducible, which
    * the recursive form never is across engines.
    *
    * One shuffle by key; the lag chain reads each partition once in
    * time order. Determinism: each weight is embedded as the same
    * decimal literal in the Spark plan and the oracle SQL, both parse
    * to the identical double, and the term order is fixed — so the
    * rounded output is bit-equal across engines. */
  def ewmaSmooth(events: DataFrame, alpha: Double = 0.3, taps: Int = 8,
                 key: String = "user_id", ts: String = "ts",
                 value: String = "value"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"ewmaSmooth: alpha in (0,1), got $alpha")
    require(taps >= 1, s"ewmaSmooth: taps must be >= 1, got $taps")
    val w = Window.partitionBy(key).orderBy(col(ts), col("event_id"))
    val weights = ewmaWeights(alpha, taps)
    val lags = weights.indices.map(j => lag(col(value), j).over(w))
    val num = weights.indices.map { j =>
      when(lags(j).isNotNull, lags(j) * expr(weights(j))).otherwise(lit(0.0))
    }.reduce(_ + _)
    val den = weights.indices.map { j =>
      when(lags(j).isNotNull, expr(weights(j))).otherwise(lit(0.0))
    }.reduce(_ + _)
    events.withColumn("ewma", round(num / den, 6))
      .select(col("event_id"), col(key), col(value), col("ewma"))
  }

  /** (1−α)^j as decimal literals — the SAME strings go into the Spark
    * expression and the DuckDB oracle, so both engines parse the
    * identical double and the FIR sums agree bit-for-bit. */
  private[graft] def ewmaWeights(alpha: Double, taps: Int): Seq[String] =
    (0 until taps).map { j =>
      // Locale.ROOT: a comma decimal separator would corrupt both plans
      val lit = String.format(java.util.Locale.ROOT, "%.17g", math.pow(1 - alpha, j))
      s"CAST($lit AS DOUBLE)"
    }

  /** QE8 — [[ewmaSmooth]] over `events` (α = 0.3, 8 taps). */
  def qeEwma(spark: SparkSession, d: String): DataFrame =
    ewmaSmooth(T.events(spark, d))
      .orderBy("event_id")

  /** Time-series regularization: gap-fill onto an hourly bucket grid +
    * forward fill — the resample/asfreq primitive (financial bars, IoT
    * sensor panels, feature-store point-in-time frames all need an
    * observation per (key, bucket), not per event). Per key: the last
    * observation of each bucket (by ts, then event_id — deterministic)
    * lands on a generated [min-bucket, max-bucket] grid, and empty
    * buckets carry the last prior observation forward
    * (`last(ignoreNulls)` over an unbounded-preceding frame; the first
    * grid bucket is always observed, so no leading nulls).
    *
    * Scale shape: the grid generates from ONE bounds row per key (never
    * from the events), so fan-out = span÷bucket per key — guarded by the
    * [[rangeLookupJoin]] idiom (the `raise_error` rides the sequence
    * bound itself: a corrupted sentinel timestamp fails loudly instead
    * of exploding the grid over the whole domain). One (key, bucket)
    * equi-join + one per-key ordered window — two shuffles total, both
    * on the key. */
  def gapFillForwardFill(events: DataFrame, key: String = "user_id",
                         ts: String = "ts", value: String = "value",
                         maxBucketsPerKey: Long = 8784L): DataFrame = {
    val obsW = Window.partitionBy(col(key), col("b"))
      .orderBy(col(ts).desc, col("event_id").desc)
    val lastObs = events
      .withColumn("b", date_trunc("hour", col(ts)))
      .withColumn("rn", row_number().over(obsW))
      .filter(col("rn") === 1)
      .select(col(key), col("b"), col(value).as("obs"))
    val bounds = lastObs.groupBy(key)
      .agg(min("b").as("mn"), max("b").as("mx"))
      .withColumn("loH", expr("unix_timestamp(mn) div 3600"))
      .withColumn("hiH", expr("unix_timestamp(mx) div 3600"))
    val span = col("hiH") - col("loH")
    val guardedGrid = when(span < lit(maxBucketsPerKey), sequence(col("loH"), col("hiH")))
      .otherwise(raise_error(format_string(
        s"gapFillForwardFill: key %s spans %s hourly buckets, over " +
          s"maxBucketsPerKey=$maxBucketsPerKey — coarsen the bucket or raise the cap",
        col(key), span + lit(1))).cast("array<bigint>"))
    val fillW = Window.partitionBy(key).orderBy("w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .select(col(key), explode(guardedGrid).as("h"))
      .withColumn("w", expr("timestamp_seconds(h * 3600)"))
      .join(lastObs.withColumnRenamed("b", "w"), Seq(key, "w"), "left")
      .withColumn("filled", col("obs").isNull)
      .withColumn("v", round(last(col("obs"), ignoreNulls = true).over(fillW), 6))
      .select(col(key), col("w"), col("v"), col("filled"))
  }

  /** QE9 — [[gapFillForwardFill]] over `events` for user_id < 50 (the
    * hourly panel: ~35k (key, hour) rows at sf0.01, ~75% filled). */
  def qeGapFill(spark: SparkSession, d: String): DataFrame =
    gapFillForwardFill(T.events(spark, d).filter(col("user_id") < 50))
      .orderBy("user_id", "w")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "qe_funnel" -> qeFunnel _,
    "qe_cohort" -> qeCohort _,
    "qe_asof" -> qeAsof _,
    "qe_attribution" -> qeAttribution _,
    "qe_sessions" -> qeSessions _,
    "qe_range_lookup" -> qeRangeLookup _,
    "qe_interval_join" -> qeIntervalJoin _,
    "qe_scd2" -> qeScd2 _,
    "qe_anomaly" -> qeAnomaly _,
    "qe_ewma" -> qeEwma _,
    "qe_gap_fill" -> qeGapFill _)

  val oracles: Map[String, String] = Map(
    // same chained per-step min-timestamp tables with strict ts ordering
    "qe_funnel" ->
      ("WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e " +
        "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t " +
        "WHERE e.event_type = 'click' GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e " +
        "JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t " +
        "WHERE e.event_type = 'purchase' GROUP BY e.user_id), " +
        "c AS (SELECT (SELECT COUNT(*) FROM s1) AS u0, " +
        "(SELECT COUNT(*) FROM s2) AS u1, (SELECT COUNT(*) FROM s3) AS u2) " +
        "SELECT * FROM (" +
        "SELECT 1 AS step, 'view' AS label, u0 AS users, " +
        "ROUND(CAST(u0 AS DOUBLE) / u0, 6) AS conv FROM c " +
        "UNION ALL SELECT 2, 'click', u1, ROUND(CAST(u1 AS DOUBLE) / u0, 6) FROM c " +
        "UNION ALL SELECT 3, 'purchase', u2, ROUND(CAST(u2 AS DOUBLE) / u0, 6) FROM c) " +
        "ORDER BY step"),
    // same first-week cohort + distinct user-weeks; `//` ≡ Spark's div
    // on the exact multiple-of-7 day diff
    "qe_cohort" ->
      ("WITH fw AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week " +
        "FROM events GROUP BY user_id), " +
        "aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events) " +
        "SELECT cohort_week, datediff('day', cohort_week, week) // 7 AS week_offset, " +
        "COUNT(DISTINCT user_id) AS active_users " +
        "FROM aw JOIN fw USING (user_id) " +
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"),
    "qe_range_lookup" ->
      ("WITH r AS (SELECT s_suppkey AS range_id, s_suppkey*97 AS lo, " +
        "s_suppkey*97 + 53 AS hi FROM supplier), " +
        "p AS (SELECT o_orderkey % 7919 AS v FROM orders) " +
        "SELECT range_id, COUNT(*) AS hits FROM p JOIN r " +
        "ON v BETWEEN lo AND hi GROUP BY range_id ORDER BY range_id"),
    "qe_interval_join" ->
      ("WITH l AS (SELECT o_orderkey % 7919 AS l_lo, " +
        "o_orderkey % 7919 + o_orderkey % 23 AS l_hi FROM orders), " +
        "r AS (SELECT s_suppkey AS range_id, s_suppkey*97 AS r_lo, " +
        "s_suppkey*97 + 53 AS r_hi FROM supplier) " +
        "SELECT range_id, COUNT(*) AS hits, " +
        "CAST(SUM(l_hi - l_lo) AS BIGINT) AS span_sum FROM l JOIN r " +
        "ON l_lo <= r_hi AND r_lo <= l_hi GROUP BY range_id ORDER BY range_id"),
    "qe_scd2" ->
      ("WITH u AS (SELECT user_id, ts, arg_max(event_type, event_id) AS state " +
        "FROM events GROUP BY user_id, ts), " +
        "c AS (SELECT user_id, ts, state, LAG(state) OVER w AS prev, " +
        "ROW_NUMBER() OVER w AS rn FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "ch AS (SELECT user_id, ts, state FROM c " +
        "WHERE rn = 1 OR state IS DISTINCT FROM prev) " +
        "SELECT user_id, state, ts AS valid_from, " +
        "LEAD(ts) OVER w AS valid_to, LEAD(ts) OVER w IS NULL AS is_current " +
        "FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts) " +
        "ORDER BY user_id, valid_from"),
    // same trailing frame, same exclusion of the current row, and the
    // threshold applied to the ROUNDED z on both engines — sliding-frame
    // stddev internals (segment tree vs streaming) differ only in last
    // ulps, far inside the 1e-4 rounding granularity
    "qe_anomaly" ->
      ("WITH b AS (SELECT event_id, user_id, value, " +
        "AVG(value) OVER w AS mu, STDDEV_SAMP(value) OVER w AS sigma " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)) " +
        "SELECT event_id, user_id, ROUND((value - mu) / sigma, 4) AS z " +
        "FROM b WHERE sigma > 0 AND ABS(ROUND((value - mu) / sigma, 4)) > 2.5 " +
        "ORDER BY event_id"),
    // the identical weight literals, lag terms, and left-to-right sum
    // order as the Spark expression tree — see ewmaWeights
    // same per-bucket last observation (ROW_NUMBER desc by ts, event_id),
    // same one-bounds-row-per-key hourly grid, same left join +
    // last_value IGNORE NULLS forward fill, values rounded identically
    "qe_gap_fill" ->
      ("WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS b, value, " +
        "ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts) " +
        "ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events WHERE user_id < 50), " +
        "lastobs AS (SELECT user_id, b, value AS obs FROM obs WHERE rn = 1), " +
        "bounds AS (SELECT user_id, MIN(b) AS mn, MAX(b) AS mx FROM lastobs GROUP BY user_id), " +
        "grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS w " +
        "FROM bounds), " +
        "j AS (SELECT g.user_id, g.w, l.obs, l.obs IS NULL AS filled " +
        "FROM grid g LEFT JOIN lastobs l ON g.user_id = l.user_id AND g.w = l.b) " +
        "SELECT user_id, w, " +
        "ROUND(last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY w " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v, filled " +
        "FROM j ORDER BY user_id, w"),
    "qe_ewma" -> {
      val ws = ewmaWeights(0.3, 8)
      def lagT(j: Int) = s"LAG(value, $j) OVER w"
      val num = ws.indices.map(j =>
        s"CASE WHEN ${lagT(j)} IS NOT NULL THEN ${lagT(j)} * ${ws(j)} " +
          "ELSE CAST(0 AS DOUBLE) END").mkString(" + ")
      val den = ws.indices.map(j =>
        s"CASE WHEN ${lagT(j)} IS NOT NULL THEN ${ws(j)} " +
          "ELSE CAST(0 AS DOUBLE) END").mkString(" + ")
      s"SELECT event_id, user_id, value, ROUND(($num) / ($den), 6) AS ewma " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
        "ORDER BY event_id"
    },
    "qe_asof" ->
      ("WITH views AS (SELECT user_id, ts, MAX(event_id) AS view_id FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id, ts), " +
        "clicks AS (SELECT event_id AS click_id, user_id, ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT c.click_id, c.user_id, v.view_id FROM clicks c " +
        "ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts " +
        "ORDER BY c.click_id"),
    "qe_attribution" ->
      ("WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts FROM events " +
        "WHERE event_type = 'view'), " +
        "c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events " +
        "WHERE event_type = 'click') " +
        "SELECT c.user_id, v.view_id, c.click_id FROM c JOIN v " +
        "ON c.user_id = v.user_id AND c.click_ts >= v.view_ts " +
        "AND c.click_ts <= v.view_ts + INTERVAL 60 MINUTE " +
        "ORDER BY click_id, view_id"),
    // gaps-and-islands: a row opens a new session when its gap from the
    // previous row is >= 30 min (mirrors session_window's strict-< merge);
    // the running sum of boundary flags is the session id
    "qe_sessions" ->
      ("WITH m AS (SELECT user_id, ts, value, " +
        "CASE WHEN LAG(ts) OVER w IS NULL " +
        "OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "s AS (SELECT user_id, ts, value, SUM(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid " +
        "FROM m) " +
        "SELECT MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end, " +
        "user_id, COUNT(*) AS events, " +
        "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"))
}
