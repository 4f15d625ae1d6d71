package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** EventOps invariants: the funnel fold equals the chained-first-occurrence
  * definition, transition rows normalize, the RANGE-frame trailing window
  * equals the (quadratic) self-join it replaces, and cohorts conserve users. */
class EventOpsSpec extends SparkSpec {

  // (user, ts, event_id, type) — hand-built to exercise out-of-order types,
  // pre-step noise, and ties on nothing (ids all distinct)
  private lazy val toyEvents = {
    import spark.implicits._
    Seq(
      // u1 completes the whole funnel, with noise between steps
      (1L, 10L, 1L, "signup"), (1L, 11L, 2L, "error"), (1L, 12L, 3L, "view"),
      (1L, 13L, 4L, "click"), (1L, 14L, 5L, "purchase"),
      // u2: view BEFORE signup must not count; stalls after view
      (2L, 20L, 6L, "view"), (2L, 21L, 7L, "signup"), (2L, 22L, 8L, "view"),
      // u3: signup only
      (3L, 30L, 9L, "signup"),
      // u4: purchase with no prior stages — reaches nothing
      (4L, 40L, 10L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
  }

  test("funnelSteps: greedy walk matches the hand-computed funnel") {
    val got = EventOps.funnelSteps(toyEvents, "user_id",
        Seq("ts", "event_id"), "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // u1 reaches 4, u2 reaches 2 (post-signup view), u3 reaches 1, u4 zero
    assert(got.toSeq == Seq((1, "signup", 3L), (2, "view", 2L),
      (3, "click", 1L), (4, "purchase", 1L)))
  }

  test("funnelSteps: stage counts are monotone non-increasing on real events") {
    val users = EventOps.funnelSteps(
        graft.core.EventTs.toNanos(spark.read.parquet(s"$sfDir/events.parquet")), "user_id",
        Seq("ts", "event_id"), "event_type",
        Seq("signup", "view", "purchase"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(users.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("eventTransitions: per-prev micro-probabilities sum to ~1e6") {
    val rows = EventOps.eventTransitions(
        graft.core.EventTs.toNanos(spark.read.parquet(s"$sfDir/events.parquet")), "user_id",
        Seq("ts", "event_id"), "event_type")
      .groupBy("prev_type")
      .agg(sum("p_micro").as("total"), count(lit(1)).as("k"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each row rounds independently: total within k half-units of 1e6
      assert(math.abs(r.getLong(1) - 1000000L) <= r.getLong(2),
        s"${r.getString(0)}: ${r.getLong(1)}")
    }
  }

  test("eventTransitions: adjacency counts match a hand walk") {
    val m = EventOps.eventTransitions(toyEvents, "user_id",
        Seq("ts", "event_id"), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("signup", "error")) == 1L) // u1
    assert(m(("view", "signup")) == 1L)  // u2
    assert(m(("signup", "view")) == 1L)  // u2's second hop
    assert(!m.contains(("purchase", "signup")))
  }

  test("trailingStats == brute-force time self-join") {
    import spark.implicits._
    val ev = graft.core.EventTs.toNanos(spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("ts_sec"), col("value"))
    val fast = EventOps.trailingStats(ev, "user_id", col("ts_sec"), "value", 3600L)
      .select(col("event_id"), col("n_trail"), round(col("sum_trail"), 6).as("s"))
    val a = ev.as("a")
    val b = ev.select(col("user_id"), col("ts_sec").as("ts_b"), col("value").as("v_b")).as("b")
    val brute = a.join(b, col("a.user_id") === col("b.user_id") &&
        col("ts_b").between(col("ts_sec") - 3600L, col("ts_sec")))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_trail"), round(sum(col("v_b")), 6).as("s"))
    assert(fast.count() == ev.count())
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }

  test("retentionCohorts: offset-0 cells hold every user exactly once") {
    val ev = graft.core.EventTs.toNanos(spark.read.parquet(s"$sfDir/events.parquet"))
    val cohorts = EventOps.retentionCohorts(ev, "user_id",
      expr("ts div 86400000000000"))
    val day0Total = cohorts.where(col("day_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val nUsers = ev.select(countDistinct("user_id")).collect()(0).getLong(0)
    assert(day0Total == nUsers)
    // no negative offsets (cohort day IS the min active day)
    assert(cohorts.where(col("day_offset") < 0).isEmpty)
  }

  test("linearAttribution: equal split across distinct prior channels, direct fallback") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click + view before a 10.0 purchase → 5.0 each
      (1L, 1L, "click", 0.0), (1L, 2L, "view", 0.0), (1L, 3L, "purchase", 10.0),
      // user 2: no prior touch → direct gets all 6.0
      (2L, 1L, "purchase", 6.0),
      // user 3: duplicate clicks collapse to ONE distinct channel
      (3L, 1L, "click", 0.0), (3L, 2L, "click", 0.0), (3L, 3L, "purchase", 4.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = EventOps.linearAttribution(ev, "user_id", Seq("ts"),
        "event_type", "value", Seq("click", "view"), "purchase")
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("click", 2L, 9.0), ("direct", 1L, 6.0), ("view", 1L, 5.0)))
  }

  test("lastTouchAttribution: last prior touch wins, no touch → direct") {
    import spark.implicits._
    val ev = Seq(
      // user 1: click then purchase → click credited
      (1L, 1L, "click", 0.0), (1L, 2L, "purchase", 10.0),
      // user 2: purchase with no prior touch → direct
      (2L, 1L, "purchase", 5.0),
      // user 3: view then click (plus an ignored error) — the LAST touch
      // (click) takes both purchases; a later view after the first purchase
      // reassigns only the second
      (3L, 1L, "view", 0.0), (3L, 2L, "click", 0.0), (3L, 3L, "error", 0.0),
      (3L, 4L, "purchase", 7.0), (3L, 5L, "view", 0.0),
      (3L, 6L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = EventOps.lastTouchAttribution(ev, "user_id", Seq("ts"),
        "event_type", "value", Seq("click", "view"), "purchase")
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("click", 2L, 17.0), ("direct", 1L, 5.0), ("view", 1L, 1.0)))
  }

  test("sessionTrigrams: counts within sessions, never across the gap") {
    import spark.implicits._
    val m = 60L * 1000000000L // one minute in nanos
    // u1 session A: v c v c → trigrams (v c v), (c v c); 31-min gap;
    // session B: v c p → (v c p). u2: only two events — no trigram.
    val ev = Seq(
      (1L, 0 * m, 1L, "v"), (1L, 1 * m, 2L, "c"), (1L, 2 * m, 3L, "v"),
      (1L, 3 * m, 4L, "c"),
      (1L, 34 * m, 5L, "v"), (1L, 35 * m, 6L, "c"), (1L, 36 * m, 7L, "p"),
      (2L, 0 * m, 8L, "v"), (2L, 1 * m, 9L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.sessionTrigrams(ev, "user_id", gapSec = 1800, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("c v c", 1L, 1L), ("v c p", 1L, 2L), ("v c v", 1L, 3L)))
  }

  test("sessionTrigrams: exactly-30-min gap starts a new session (q30 convention)") {
    import spark.implicits._
    val m = 60L * 1000000000L
    val ev = Seq(
      (1L, 0 * m, 1L, "a"), (1L, 1 * m, 2L, "b"), (1L, 31 * m, 3L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    // the third event is exactly 30 min after the second → new session →
    // the only candidate trigram straddles the boundary and must not count
    assert(EventOps.sessionTrigrams(ev, "user_id", gapSec = 1800, topK = 10)
      .count() == 0L)
    // one second inside the gap keeps the session together
    val ev2 = Seq(
      (1L, 0 * m, 1L, "a"), (1L, 1 * m, 2L, "b"),
      (1L, 31 * m - 1000000000L, 3L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.sessionTrigrams(ev2, "user_id", gapSec = 1800, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b c", 1L)))
  }

  test("positionAttribution: every U-shape branch hand-computed") {
    import spark.implicits._
    val ev = Seq(
      // u1: one channel → 100%
      (1L, 1L, 1L, "click", 0.0), (1L, 2L, 2L, "purchase", 10.0),
      // u2: two channels, no middle → 50/50
      (2L, 1L, 3L, "click", 0.0), (2L, 2L, 4L, "view", 0.0),
      (2L, 3L, 5L, "purchase", 10.0),
      // u3: click both ends (80%), view the lone middle (20%)
      (3L, 1L, 6L, "click", 0.0), (3L, 2L, 7L, "view", 0.0),
      (3L, 3L, 8L, "click", 0.0), (3L, 4L, 9L, "purchase", 9.0),
      // u4: strict U — 40 / 20 / 40
      (4L, 1L, 10L, "click", 0.0), (4L, 2L, 11L, "signup", 0.0),
      (4L, 3L, 12L, "view", 0.0), (4L, 4L, 13L, "purchase", 10.0),
      // u5: no prior touch → direct
      (5L, 1L, 14L, "purchase", 3.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.positionAttribution(ev, "user_id",
        Seq("ts", "event_id"), "event_type", "value",
        Seq("click", "view", "signup"), "purchase")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == Map(
      "click" -> ((4L, 10.0 + 5.0 + 7.2 + 4.0)),
      "view" -> ((3L, 5.0 + 1.8 + 4.0)),
      "signup" -> ((1L, 2.0)),
      "direct" -> ((1L, 3.0))))
  }

  test("positionAttribution conserves total conversion value on real events") {
    val ev = graft.core.EventTs.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val channels = EventOps.positionAttribution(ev, "user_id",
        Seq("ts", "event_id"), "event_type", "value",
        Seq("click", "view", "signup"), "purchase")
      .collect()
    val attributed = channels.map(_.getDouble(2)).sum
    val total = ev.where(col("event_type") === "purchase")
      .agg(sum(col("value"))).head.getDouble(0)
    // per-channel cent rounding is the only slack
    assert(math.abs(attributed - total) <= 0.01 * channels.length + 1e-9,
      s"$attributed vs $total")
  }

  test("decayScore: halving weights, window truncation, n_recent") {
    import spark.implicits._
    val ev =
      // u1: values 1, 2, 4 oldest→newest: 4·1 + 2·½ + 1·¼ = 5.25
      Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 2.0), (1L, 3L, 3L, 4.0)) ++
      // u2: 30 ones — only the trailing 24 count: Σ 2^-k = 2 − 2^-23 → 2.00
      (0 until 30).map(i => (2L, 10L + i, 100L + i, 1.0))
    val got = EventOps.decayScore(ev.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", window = 24)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == Map(1L -> ((3L, 5.25)), 2L -> ((24L, 2.0))))
  }

  test("decayScore: ignores events beyond the window entirely") {
    import spark.implicits._
    def score(n: Int): Double = {
      val ev = (0 until n).map(i => (1L, i.toLong, i.toLong, 7.5))
        .toDF("user_id", "ts", "event_id", "value")
      EventOps.decayScore(ev, "user_id", Seq("ts", "event_id"), "value")
        .head.getDouble(2)
    }
    assert(score(24) == score(40)) // identical trailing-24 content
  }

  test("cohortLtv: cells, offsets from first ANY-type event, exact cumulative") {
    import spark.implicits._
    val day = 86400000000000L
    val ev = Seq(
      // u1: cohort day 0 (a view), buys 10.00 on day 0 and 5.50 on day 2
      (1L, 0L, 1L, "view", 0.0), (1L, 1L, 2L, "purchase", 10.0),
      (1L, 2 * day, 3L, "purchase", 5.5),
      // u2: cohort day 2, buys 1.25 same day
      (2L, 2 * day, 4L, "purchase", 1.25)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventOps.cohortLtv(ev, "user_id", "event_type", "value",
        "purchase")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (0L, 0L, 1L, 10.0, 10.0),
      (0L, 2L, 1L, 5.5, 15.5),   // cumulative in micro space: exact 15.50
      (2L, 0L, 1L, 1.25, 1.25)))
  }

  test("botCandidates: metronome flagged, bursty human and short history not") {
    import spark.implicits._
    val sec = 1000000000L
    val ev =
      // u1: 12 events exactly 10 s apart → var_num = 0 → flagged
      (0 until 12).map(i => (1L, i * 10 * sec, 100L + i)) ++
      // u2: bursty (1 s, then 1000 s, alternating) → huge cv² → not flagged
      (0 until 12).map(i =>
        (2L, (0 until i).map(j => if (j % 2 == 0) 1L else 1000L).sum * sec,
          200L + i)) ++
      // u3: metronome but only 5 events → below minEvents
      (0 until 5).map(i => (3L, i * 10 * sec, 300L + i))
    val got = EventOps.botCandidates(
        ev.toDF("user_id", "ts", "event_id"), "user_id",
        Seq("ts", "event_id"), minEvents = 10, cvNum = 1, cvDen = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L)) // exactly the metronome, zero variance
  }

  test("dailyTrendSlopes: exact rational slope on hand-built series") {
    import spark.implicits._
    val day = 86400000000000L
    val ev = // "up": 1,2,3 events on days 0,1,2 → slope exactly 1/day;
             // "flat": 2,2 on days 0,1 → slope 0
      (Seq((1L, "up")) ++ Seq.fill(2)((day + 1, "up")) ++
        Seq.fill(3)((2 * day + 1, "up")) ++
        Seq.fill(2)((1L, "flat")) ++ Seq.fill(2)((day + 1, "flat")))
        .zipWithIndex.map { case ((t, ty), i) => (i.toLong, t, 1L, ty, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.dailyTrendSlopes(ev, "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // up: n=3 sx=3 sy=6 sxy=8 sxx=5 → num 6, den 6 → 1e6 micro
    assert(got("up") == ((3L, 6L, 6L, 1000000L)))
    assert(got("flat") == ((2L, 0L, 1L, 0L))) // den = 2·1 − 1² = 1
  }

  test("rfmScores: strictly-increasing metrics score the exact 1..5 ladder") {
    import spark.implicits._
    // user k: k purchases of value 10k, latest at ts 1000k → every metric
    // strictly increasing in k → threshold quintiles give (k, k, k)
    val ev = (1L to 5L).flatMap { k =>
      (1L to k).map(i => (100 * k + i, k * 1000L, k, "purchase", k * 10.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.rfmScores(ev, "user_id", "event_type", "value",
        "purchase")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == (1L to 5L).map(k =>
      (k, k, k, k, k, 111 * k)))
  }

  test("associationRules: hand-computed support/confidence/lift") {
    import spark.implicits._
    val baskets = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 4L),
      (5L, 5L)
    ).toDF("o", "p")
    val got = graft.operators.Association.pairRules(baskets, "o", "p",
        minSupport = 2, topK = 10)
      .select("a", "b", "s_ab", "s_a", "s_b", "conf_ab_micro",
        "conf_ba_micro", "lift_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    // only (1,2) reaches support 2: s_ab=3, s_1=3, s_2=3, N=5 →
    // conf both 1e6, lift = 15e6 div 9 = 1666666
    assert(got == Seq((1L, 2L, 3L, 3L, 3L, 1000000L, 1000000L, 1666666L)))
  }

  test("associationRules: duplicate (basket, item) rows don't inflate support") {
    import spark.implicits._
    val b = Seq((1L, 7L), (1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L))
      .toDF("o", "p")
    val got = graft.operators.Association.pairRules(b, "o", "p",
        minSupport = 1, topK = 10)
      .select("a", "b", "s_ab", "lift_micro").collect()
    assert(got.length == 1)
    // pair (7,8) in both baskets: s_ab=2, s_7=2, s_8=2, N=2 → lift 1.0
    assert(got(0).getLong(2) == 2L && got(0).getLong(3) == 1000000L)
  }

  test("peakConcurrency: overlap, midnight carry, instantaneous sessions") {
    import spark.implicits._
    val day = 86400000000000L
    val h = 3600000000000L
    val ev = Seq(
      // day 0: three overlapping sessions (u1 01:00-03:00 via two events,
      // u2 02:00-02:30, u3 02:15 instantaneous) → peak 3
      (1L, 1 * h, 1L), (1L, 3 * h, 2L),
      (2L, 2 * h, 3L), (2L, 2 * h + h / 2, 4L),
      (3L, 2 * h + h / 4, 5L),
      // u4 spans midnight: starts day 0 23:30, ends day 1 00:10 → day 1's
      // carry-in is 1, and its lone delta that day is the −1
      (4L, day - h / 2, 6L), (4L, day + h / 6, 7L)
    ).toDF("user_id", "ts", "event_id")
    // gap 7201 s: u1's exactly-2h stride stays one session (gap rule is >=)
    val got = EventOps.peakConcurrency(ev, "user_id", gapSec = 7201)
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // day 0: 4 starts, 3 ends, peak 3; day 1: 0 starts, 1 end, peak
    // carry(1) + in-day max(−1) = 0 (post-delta definition)
    assert(got == Seq((0L, 4L, 3L, 3L), (1L, 0L, 1L, 0L)))
  }

  test("peakConcurrency equals a brute-force per-instant count on real events") {
    val ev = graft.core.EventTs.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val got = EventOps.peakConcurrency(ev, "user_id", gapSec = 1800)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // brute force on the driver: global sweep over collected session bounds
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) < 1800000000000L, lit(0))
          .otherwise(lit(1)))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("s"), max("ts").as("e"))
      .select("s", "e").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deltas = (sess.map(x => (x._1, 1L)) ++ sess.map(x => (x._2, -1L)))
      .sortBy { case (ts, d) => (ts, -d) } // +1 before −1 at equal ts
    var conc = 0L
    val best = scala.collection.mutable.Map[Long, Long]()
    deltas.foreach { case (ts, d) =>
      conc += d
      val day = ts / 86400000000000L
      best(day) = math.max(best.getOrElse(day, Long.MinValue), conc)
    }
    assert(got == best.toMap)
  }
}
