package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hhmm: String) = Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("asofJoin: latest at-or-before match, >= tie semantics, null when no prior") {
    val right = Seq(
      (1L, ts("10:00"), 100L), (1L, ts("11:00"), 101L), (2L, ts("09:00"), 200L))
      .toDF("user_id", "ts", "view_id")
    val left = Seq(
      (1L, ts("10:30"), 900L), // between the two views -> earlier one
      (1L, ts("11:00"), 901L), // exactly simultaneous view -> matched (>=)
      (1L, ts("09:59"), 902L), // before any view -> null
      (3L, ts("12:00"), 903L)) // key absent from right -> null
      .toDF("user_id", "ts", "click_id")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", "view_id")
      .collect()
      .map(r => r.getAs[Long]("click_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_view_id"))) None
         else Some(r.getAs[Long]("asof_view_id"))))
      .toMap
    assert(got == Map(900L -> Some(100L), 901L -> Some(101L),
      902L -> None, 903L -> None))
  }

  test("asofJoin: a null-VALUED right row is matched as null, not skipped for a stale value") {
    // the latest right row's value being null must surface AS null —
    // leaking the previous row's value would diverge from ASOF LEFT JOIN
    val right = Seq(
      (1L, ts("09:00"), Some(500L)), (1L, ts("10:00"), None: Option[Long]))
      .toDF("user_id", "ts", "view_id")
    val left = Seq((1L, ts("10:30"), 900L)).toDF("user_id", "ts", "click_id")
    val r = Temporal.asofJoin(left, right, "user_id", "ts", "view_id").collect().head
    assert(r.isNullAt(r.fieldIndex("asof_view_id")),
      s"stale value leaked past a null-valued latest row: $r")
  }

  test("qe_asof on real events: every matched view is the max prior view (spot oracle)") {
    val out = SparkEntry.queries("qe_asof")(spark, sfTiny).collect()
    assert(out.nonEmpty)
    // independently recompute a handful of rows with a brute-force scan
    val e = graft.sources.Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type", "ts").collect()
    val views = e.filter(_.getAs[String]("event_type") == "view")
    val byClick = out.take(20).map { r =>
      val cid = r.getAs[Long]("click_id")
      val uid = r.getAs[Long]("user_id")
      val cts = e.find(_.getAs[Long]("event_id") == cid).get.getAs[Timestamp]("ts")
      val want = views.filter(v => v.getAs[Long]("user_id") == uid &&
          !v.getAs[Timestamp]("ts").after(cts))
        .sortBy(v => (v.getAs[Timestamp]("ts").getTime, v.getAs[Long]("event_id")))
        .lastOption.map(_.getAs[Long]("event_id"))
      val gotV = if (r.isNullAt(r.fieldIndex("view_id"))) None
                 else Some(r.getAs[Long]("view_id"))
      (cid, gotV, want)
    }
    byClick.foreach { case (cid, gotV, want) =>
      assert(gotV == want, s"click $cid: got $gotV want $want")
    }
  }

  test("qe_attribution == brute-force interval pairs on real events") {
    val got = SparkEntry.queries("qe_attribution")(spark, sfTiny).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("view_id"),
        r.getAs[Long]("click_id"))).toSet
    val e = graft.sources.Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type", "ts").collect()
    val views = e.filter(_.getAs[String]("event_type") == "view")
    val clicks = e.filter(_.getAs[String]("event_type") == "click")
    val want = (for {
      v <- views; c <- clicks
      if c.getAs[Long]("user_id") == v.getAs[Long]("user_id")
      dt = c.getAs[Timestamp]("ts").getTime - v.getAs[Timestamp]("ts").getTime
      if dt >= 0 && dt <= 60L * 60 * 1000
    } yield (c.getAs[Long]("user_id"), v.getAs[Long]("event_id"),
      c.getAs[Long]("event_id"))).toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("rangeLookupJoin == naive BETWEEN join; bucket width cannot change the result") {
    import spark.implicits._
    // overlapping ranges + boundary points: the cases a bucket rewrite
    // would get wrong first (a point on a bucket edge, a range spanning
    // many buckets, two ranges claiming one point)
    val ranges = Seq((1L, 0L, 100L), (2L, 50L, 149L), (3L, 140L, 160L), (4L, 1000L, 1063L))
      .toDF("range_id", "lo", "hi")
    val points = Seq(0L, 50L, 64L, 100L, 101L, 128L, 149L, 150L, 999L, 1000L, 1063L, 1064L)
      .toDF("v")
    val naive = points.join(ranges, col("v").between(col("lo"), col("hi")))
      .select("v", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 64L, 1000L)) {
      val got = Temporal.rangeLookupJoin(points, "v", ranges, "lo", "hi", w)
        .select("v", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w: missing=${naive -- got} extra=${got -- naive}")
    }
    // negative domains: `div` truncates toward zero rather than flooring,
    // but truncation is monotonic, so a range's bucket interval still
    // covers every point bucket inside it — pin that this holds
    val negRanges = Seq((1L, -100L, -60L), (2L, -10L, 10L)).toDF("range_id", "lo", "hi")
    val negPoints = Seq(-101L, -100L, -70L, -64L, -60L, -59L, -10L, -1L, 0L, 10L, 11L)
      .toDF("v")
    val negNaive = negPoints.join(negRanges, col("v").between(col("lo"), col("hi")))
      .select("v", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 64L)) {
      val got = Temporal.rangeLookupJoin(negPoints, "v", negRanges, "lo", "hi", w)
        .select("v", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == negNaive, s"neg width $w: missing=${negNaive -- got} extra=${got -- negNaive}")
    }
  }

  test("rangeLookupJoin: seeded randomized differential vs naive join (incl. negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42) // fixed seed: deterministic CI
    for (trial <- 0 until 8) {
      val ranges = (1 to 30).map { id =>
        val lo = rnd.nextInt(2000) - 1000L
        (id.toLong, lo, lo + rnd.nextInt(300)) // overlapping, random widths
      }.toDF("range_id", "lo", "hi")
      val points = (1 to 200).map(_ => rnd.nextInt(2600) - 1300L).toDF("v")
      val naive = points.join(ranges, col("v").between(col("lo"), col("hi")))
        .select("v", "range_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).view.mapValues(_.length).toMap
      val w = Seq(1L, 7L, 64L, 500L)(trial % 4)
      val got = Temporal.rangeLookupJoin(points, "v", ranges, "lo", "hi", w)
        .select("v", "range_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).view.mapValues(_.length).toMap
      // multiset equality: duplicated points must match multiplicities too
      assert(got == naive, s"trial $trial width $w")
    }
  }

  test("qe_range_lookup plans a hash join on the bucket id, never a nested loop") {
    val plan = Temporal.qeRangeLookup(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range lookup degraded to an all-pairs join:\n$plan")
    assert(plan.contains("Join"), s"expected a real join:\n$plan")
  }

  private def causeMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("rangeLookupJoin: a pathologically wide range fails LOUDLY, before the fan-out") {
    import spark.implicits._
    // one sentinel range — the row that would explode to 10^17 buckets
    val ranges = Seq((1L, 0L, Long.MaxValue), (2L, 10L, 20L)).toDF("range_id", "lo", "hi")
    val points = Seq(15L).toDF("v")
    val e = intercept[Throwable] {
      Temporal.rangeLookupJoin(points, "v", ranges, "lo", "hi", 64L).collect()
    }
    val msgs = causeMessages(e)
    assert(msgs.contains("maxFanout"), s"expected the guard's message, got: $msgs")
    // boundary: exactly maxFanout buckets passes, one more trips the guard
    val atCap = Seq((1L, 0L, 9L)).toDF("range_id", "lo", "hi") // 10 buckets at width 1
    assert(Temporal.rangeLookupJoin(points, "v", atCap, "lo", "hi",
      bucketWidth = 1L, maxFanout = 10L).count() == 0) // point 15 outside; plan executes
    val overCap = Seq((1L, 0L, 10L)).toDF("range_id", "lo", "hi") // 11 buckets
    val e2 = intercept[Throwable] {
      Temporal.rangeLookupJoin(points, "v", overCap, "lo", "hi",
        bucketWidth = 1L, maxFanout = 10L).collect()
    }
    assert(causeMessages(e2).contains("maxFanout"))
  }

  test("rangeLookupJoin: an INVERTED range matches nothing and cannot bypass the guard") {
    import spark.implicits._
    // hi < lo with a domain-wide negative span: a descending sequence
    // here would fan out over the whole domain UNDER the cap check
    val inverted = Seq((1L, Long.MaxValue, 0L), (2L, 10L, 20L)).toDF("range_id", "lo", "hi")
    val points = Seq(15L, 5L).toDF("v")
    val got = Temporal.rangeLookupJoin(points, "v", inverted, "lo", "hi",
      bucketWidth = 4L, maxFanout = 16L)
      .select("v", "range_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the valid range still matches; the inverted one contributes zero rows
    assert(got == Set((15L, 2L)), s"inverted range leaked or valid range lost: $got")
  }

  test("rangeLookupJoin: colliding column names are rejected up front") {
    import spark.implicits._
    val points = Seq(5L).toDF("v")
    // a column shared between the sides would make the residual BETWEEN ambiguous
    val sharing = Seq((1L, 0L, 10L)).toDF("v", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      Temporal.rangeLookupJoin(points, "v", sharing, "lo", "hi", 8L)
    }
    assert(e.getMessage.contains("share column names"))
    // a pre-existing internal bucket column would be silently shadowed
    val withInternal = Seq((5L, 1L)).toDF("v", "_graft_range_bkt")
    val ranges = Seq((1L, 0L, 10L)).toDF("range_id", "lo", "hi")
    val e2 = intercept[IllegalArgumentException] {
      Temporal.rangeLookupJoin(withInternal, "v", ranges, "lo", "hi", 8L)
    }
    assert(e2.getMessage.contains("_graft_range_bkt"))
  }

  test("intervalOverlapJoin == naive overlap join; bucket width cannot change the result") {
    import spark.implicits._
    // the cases a two-sided bucket rewrite gets wrong first: intervals
    // sharing exactly one boundary point, one nested inside another,
    // identical twins, a pair sharing MANY buckets (dup risk), negatives
    val left = Seq(
      (1L, 0L, 100L), (2L, 100L, 100L), (3L, 50L, 149L), (4L, 640L, 660L),
      (5L, -80L, -10L), (6L, 0L, 100L))
      .toDF("l_id", "l_lo", "l_hi")
    val right = Seq(
      (10L, 100L, 200L), (11L, 0L, 1000L), (12L, 60L, 61L), (13L, -100L, -80L),
      (14L, 661L, 700L))
      .toDF("r_id", "r_lo", "r_hi")
    val naive = left.crossJoin(right)
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Temporal.intervalOverlapJoin(left, "l_lo", "l_hi", right, "r_lo", "r_hi", w)
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w: missing=${naive -- got} extra=${got -- naive}")
    }
  }

  test("intervalOverlapJoin: seeded randomized differential vs naive (multiset-exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    for (trial <- 0 until 6) {
      val left = (1 to 80).map { id =>
        val lo = rnd.nextInt(2000) - 1000L
        (id.toLong, lo, lo + rnd.nextInt(150))
      }.toDF("l_id", "l_lo", "l_hi")
      val right = (1 to 40).map { id =>
        val lo = rnd.nextInt(2200) - 1100L
        (id.toLong, lo, lo + rnd.nextInt(400))
      }.toDF("r_id", "r_lo", "r_hi")
      val naive = left.crossJoin(right)
        .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).view.mapValues(_.length).toMap
      val w = Seq(1L, 13L, 64L, 512L)(trial % 4)
      val got = Temporal.intervalOverlapJoin(left, "l_lo", "l_hi", right, "r_lo", "r_hi", w)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity).view.mapValues(_.length).toMap
      // multiset equality: a pair sharing k buckets must appear ONCE, not k times
      assert(got == naive, s"trial $trial width $w")
    }
  }

  test("intervalOverlapJoin: inverted intervals are empty; wide intervals trip the guard") {
    import spark.implicits._
    val left = Seq((1L, 20L, 10L), (2L, 0L, 30L)).toDF("l_id", "l_lo", "l_hi")
    val right = Seq((10L, 0L, 40L)).toDF("r_id", "r_lo", "r_hi")
    val got = Temporal.intervalOverlapJoin(left, "l_lo", "l_hi", right, "r_lo", "r_hi", 8L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the inverted interval (1) joins nothing even though the raw SQL
    // predicate would match it nested inside [0, 40]
    assert(got == Set((2L, 10L)), s"inverted interval leaked: $got")
    val wide = Seq((1L, 0L, Long.MaxValue)).toDF("l_id", "l_lo", "l_hi")
    val e = intercept[Throwable] {
      Temporal.intervalOverlapJoin(wide, "l_lo", "l_hi", right, "r_lo", "r_hi", 64L).collect()
    }
    assert(causeMessages(e).contains("maxFanout"))
    // the guard covers the RIGHT side too
    val wideR = Seq((10L, 0L, Long.MaxValue)).toDF("r_id", "r_lo", "r_hi")
    val e2 = intercept[Throwable] {
      Temporal.intervalOverlapJoin(left, "l_lo", "l_hi", wideR, "r_lo", "r_hi", 64L).collect()
    }
    assert(causeMessages(e2).contains("maxFanout"))
  }

  test("scd2Build: change compression, null states, chained intervals, is_current") {
    import spark.implicits._
    val log = Seq(
      (1L, ts("09:00"), Some("a")),
      (1L, ts("10:00"), Some("a")), // no-change update: compressed away
      (1L, ts("11:00"), Some("b")), // change
      (1L, ts("12:00"), None),      // change to null (a real state)
      (1L, ts("13:00"), None),      // null -> null: no change
      (1L, ts("14:00"), Some("b")), // null -> b: change
      (2L, ts("09:30"), Some("x"))) // single-state key
      .toDF("k", "ts", "attr")
    val got = Temporal.scd2Build(log, "k", "ts", "attr")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getAs[Long]("k"), Option(r.getAs[String]("attr")),
        r.getAs[Timestamp]("valid_from"),
        Option(r.getAs[Timestamp]("valid_to")), r.getAs[Boolean]("is_current")))
    assert(got.toSeq == Seq(
      (1L, Some("a"), ts("09:00"), Some(ts("11:00")), false),
      (1L, Some("b"), ts("11:00"), Some(ts("12:00")), false),
      (1L, None, ts("12:00"), Some(ts("14:00")), false),
      (1L, Some("b"), ts("14:00"), None, true),
      (2L, Some("x"), ts("09:30"), None, true)), got.toSeq.toString)
    // intervals chain: each valid_to is the next row's valid_from
    got.toSeq.groupBy(_._1).values.foreach { rows =>
      rows.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3), s"gap between $a and $b")
        case _ =>
      }
    }
  }

  test("funnel: strict ordering gates each step; out-of-order events don't convert") {
    // u1: view 09:00 -> click 10:00 -> purchase 11:00  (full conversion)
    // u2: click 09:00 BEFORE first view 10:00 -> stalls at view
    // u3: view 09:00 -> purchase 10:00 (no click) -> stalls at view
    // u4: purchase only -> never enters
    // u5: view 09:00 -> click 10:00 -> purchase 09:30 (before click) -> step 2
    val events = Seq(
      (1L, ts("09:00"), "view"), (1L, ts("10:00"), "click"), (1L, ts("11:00"), "purchase"),
      (2L, ts("09:00"), "click"), (2L, ts("10:00"), "view"),
      (3L, ts("09:00"), "view"), (3L, ts("10:00"), "purchase"),
      (4L, ts("09:00"), "purchase"),
      (5L, ts("09:00"), "view"), (5L, ts("10:00"), "click"), (5L, ts("09:30"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val rows = Temporal.funnel(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1, "view", 4L, 1.0), (2, "click", 2L, 0.5), (3, "purchase", 1L, 0.25)),
      rows.mkString(", "))
  }

  test("cohortRetention: users land in their first-event week, activity counts by offset") {
    def t(d: String) = Timestamp.valueOf(s"$d 12:00:00")
    // 2026-01-05 and 2026-01-12 are Mondays (week starts).
    // u1: first event wk0, active wk0 and wk1. u2: first wk0 only.
    // u3: first wk1, active wk1.
    val events = Seq(
      (1L, t("2026-01-05")), (1L, t("2026-01-14")),
      (2L, t("2026-01-06")),
      (3L, t("2026-01-13")))
      .toDF("user_id", "ts")
    val rows = Temporal.cohortRetention(events).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      ("2026-01-05", 0L, 2L), ("2026-01-05", 1L, 1L), ("2026-01-12", 0L, 1L)),
      rows.mkString(", "))
  }

  test("rollingAnomalies flags a spike against its trailing baseline, skips unscorable rows") {
    // u1: gently varying baseline, then a spike — only the spike scores
    // past |z| > 2.5. The window is TRAILING (excludes self): the spike
    // cannot mute itself by inflating its own sigma.
    val events = Seq(
      (1L, 1L, ts("10:00"), 10.0), (2L, 1L, ts("10:01"), 11.0),
      (3L, 1L, ts("10:02"), 10.0), (4L, 1L, ts("10:03"), 11.0),
      (5L, 1L, ts("10:04"), 10.0), (6L, 1L, ts("10:05"), 100.0),
      // u2: constant values -> sigma 0 -> never scorable, never flagged
      (7L, 2L, ts("10:00"), 5.0), (8L, 2L, ts("10:01"), 5.0),
      (9L, 2L, ts("10:02"), 5.0), (10L, 2L, ts("10:03"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rollingAnomalies(events, lookback = 20, zThresh = 2.5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq == Seq(6L), got.mkString(", "))
    // baseline mu = 10.4, sigma_samp ~ 0.5477 -> z ~ +163
    assert(got.head._2 > 100.0, s"z = ${got.head._2}")
  }

  test("rollingAnomalies: first rows have no scorable baseline (trailing frame, n < 2)") {
    val events = Seq(
      (1L, 1L, ts("10:00"), 1000.0), (2L, 1L, ts("10:01"), 1.0),
      (3L, 1L, ts("10:02"), 2.0), (4L, 1L, ts("10:03"), 500.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.rollingAnomalies(events, lookback = 20, zThresh = 2.5)
      .collect().map(_.getLong(0)).toSet
    // row 1: empty frame; row 2: single-row frame (stddev_samp null) —
    // neither can score even though their values are extreme
    assert(!got.contains(1L) && !got.contains(2L), got.mkString(", "))
  }

  test("ewmaSmooth: constants pass through, heads renormalize, recent values dominate") {
    val events = Seq(
      (1L, 1L, ts("10:00"), 5.0), (2L, 1L, ts("10:01"), 5.0),
      (3L, 1L, ts("10:02"), 5.0),
      (4L, 2L, ts("10:00"), 0.0), (5L, 2L, ts("10:01"), 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.ewmaSmooth(events).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // constant series: weighted mean of constants is the constant
    assert(got(1L) == 5.0 && got(2L) == 5.0 && got(3L) == 5.0, got.toString)
    // series head: only its own value exists -> ewma = value (adjust=true)
    assert(got(4L) == 0.0)
    // one step later: (10 + 0.7*0) / 1.7 = 5.882353
    assert(got(5L) == 5.882353, got(5L).toString)
  }

  test("gapFillForwardFill: in-bucket last wins, gaps fill forward, grid is exactly [min,max]") {
    val rows = Seq(
      (1L, 1L, ts("10:00"), 1.0),
      (2L, 1L, ts("10:30"), 2.0), // same bucket as event 1: later ts wins
      (3L, 1L, ts("13:15"), 5.0), // 11:00 and 12:00 are gaps
      (4L, 2L, ts("09:05"), 7.0)) // single-observation key: one-bucket grid
      .toDF("event_id", "user_id", "ts", "value")
    val got = Temporal.gapFillForwardFill(rows).orderBy("user_id", "w").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getBoolean(3)))
    val want = Seq(
      (1L, ts("10:00"), 2.0, false),
      (1L, ts("11:00"), 2.0, true),
      (1L, ts("12:00"), 2.0, true),
      (1L, ts("13:00"), 5.0, false),
      (2L, ts("09:00"), 7.0, false))
    assert(got.toSeq == want, got.mkString("\n"))
  }

  test("gapFillForwardFill: a key spanning more buckets than the cap fails loudly") {
    val rows = Seq(
      (1L, 1L, ts("10:00"), 1.0), (2L, 1L, ts("15:00"), 2.0)) // span 6 buckets
      .toDF("event_id", "user_id", "ts", "value")
    val e = intercept[Exception] {
      Temporal.gapFillForwardFill(rows, maxBucketsPerKey = 3).collect()
    }
    assert(e.getMessage.contains("buckets"), e.getMessage)
  }

  test("qe_interval_join plans a hash join on the bucket id, never a nested loop") {
    val plan = Temporal.qeIntervalJoin(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degraded to an all-pairs join:\n$plan")
    assert(plan.contains("Join"), s"expected a real join:\n$plan")
  }
}
