package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics: funnels, transition matrices,
  * trailing time-window features, retention cohorts. The reference's event
  * tables stop at groupBy/pivot shapes (S1 final_agg); these are the
  * sequence-aware extensions a training-data/behavioral pipeline needs.
  *
  * Scale stance shared by every operator here: per-entity sequence work
  * happens inside ONE hash partition of the entity key (a single exchange),
  * never via self-joins on time predicates (quadratic) or driver-side
  * collection. Per-entity cardinality is the only memory bound — callers
  * with celebrity keys cap them upstream with [[ScaleOps.perKeyCap]].
  */
object EventOps {

  /** Greedy ordered-funnel progression: for each entity, walk its events in
    * `orderCols` order and advance one step each time the NEXT unmatched
    * funnel stage appears; emit, per stage, how many entities got at least
    * that far. Greedy earliest-match is the standard funnel semantic
    * (equivalent to chaining "first E_k strictly after the matched E_{k-1}").
    *
    * Physical shape: one shuffle (groupBy entity, sorted collect_list — the
    * same bounded-per-key contract as [[ScaleOps.orderedSequencePerKey]]),
    * the native [[graft.functions.FunnelReached]] walk over each array (a
    * codegen'd tight loop — the `aggregate` HOF twin evaluates its lambda
    * interpreted at ~3.4 µs/element, ~100× this), then an explode to
    * ≤ `steps.length` rows per entity whose partial aggregation collapses
    * map-side to `steps.length` rows per partition before the final tiny
    * exchange. No time-predicate self-join at any point.
    */
  def funnelSteps(events: DataFrame, keyCol: String, orderCols: Seq[String],
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "repeated step names make the greedy walk ambiguous")
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    val stepsArr = array(steps.map(lit): _*)
    val item = struct((orderCols :+ typeCol).map(col): _*)
    val reached = events.groupBy(col(keyCol))
      .agg(array_sort(collect_list(item)).as("evs"))
      .select(graft.functions.FunnelReached(col("evs"),
        typeOrdinal = orderCols.length, steps).as("reached"))
    reached
      .where(col("reached") >= 1)
      .select(explode(sequence(lit(1), col("reached"))).as("step"))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("users"))
      .select(col("step"), element_at(stepsArr, col("step")).as("step_name"),
        col("users"))
  }

  /** First-order transition matrix over event types: count of each
    * (prev_type → next_type) adjacency in per-entity `orderCols` order, plus
    * the row-normalized probability in integer micro-units (6dp grid — the
    * catalog's cross-engine-exact convention for free reals).
    *
    * Physical shape: one exchange for the lag window (partition by entity),
    * then a groupBy whose output is bounded by |type-alphabet|² rows — the
    * row-total normalizer is a window over THAT bounded frame, not a join
    * back to the data.
    */
  def eventTransitions(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    events
      .select(col(typeCol).as("next_type"),
        lag(col(typeCol), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_prev",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n") * lit(1000000.0) / col("n_prev"), 0).cast("long")
          .as("p_micro"))
  }

  /** Trailing time-range rolling features: for every row, count and sum of
    * the SAME entity's `valueCol` over the closed interval
    * `[t - trailingSec, t]` of the numeric time column. All original
    * columns pass through; `n_trail` / `sum_trail` are appended.
    *
    * This is THE shape that survives scale for "activity in the last hour"
    * features: a RANGE-frame window runs as one exchange + per-partition
    * sort with a sliding frame bounded by the events inside the window —
    * where the naive `e1 JOIN e2 ON same key AND ts BETWEEN ...` self-join
    * is quadratic per key and re-shuffles both sides. Rows sharing the same
    * time value are frame peers, so the result is order-independent
    * (deterministic) even under ties.
    */
  def trailingStats(df: DataFrame, keyCol: String, tsSec: Column,
      valueCol: String, trailingSec: Long): DataFrame = {
    require(trailingSec >= 0, "trailingSec must be non-negative")
    val w = Window.partitionBy(col(keyCol)).orderBy(tsSec.cast("long"))
      .rangeBetween(-trailingSec, 0)
    // both aggregates in ONE projection so they land in one Window exec
    // (chained withColumn leaves two Window nodes the optimizer won't merge
    // across the interposed Projects — an extra frame pass for nothing)
    df.select(col("*"), count(lit(1)).over(w).as("n_trail"),
      sum(col(valueCol)).over(w).as("sum_trail"))
  }

  /** Last-touch conversion attribution: each `convType` event's value is
    * credited to the entity's most recent PRIOR event whose type is in
    * `touchTypes` ("direct" when no touch precedes); output is per-channel
    * (n_conversions, attributed_value).
    *
    * Physical shape: one exchange (entity key) + one ROWS-frame window whose
    * `last(touch, ignoreNulls)` scans backward from the row before the
    * conversion — the running-last-touch is carried by the frame, not by a
    * per-conversion lookback self-join (which re-shuffles both sides and
    * goes quadratic on active users). The final aggregate is bounded by
    * |touchTypes| + 1 rows.
    */
  def lastTouchAttribution(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "the conversion type cannot also be a touch type")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("channel",
        last(when(col(typeCol).isin(touchTypes.map(x => x: Any): _*),
          col(typeCol)), ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      // micro-unit integer sum: floor(x·1e6 + 0.5) per row — floor acts on
      // the identical binary double in every engine (where round() diverges:
      // Spark HALF_UPs the SHORTEST-DECIMAL repr via BigDecimal.valueOf,
      // DuckDB rounds the raw binary) — then sum as longs (fold-order-free)
      // and reduce to CENTS in integer space too: round(total/1e6, 2) put
      // half-cent totals right back on the same engine-divergent boundary.
      .agg(count(lit(1)).as("n_conversions"),
        (floor((sum(floor(col(valueCol) * 1e6 + 0.5).cast("long")) +
            lit(5000L)).cast("double") / 10000.0).cast("double") / 100.0)
          .as("attributed_value"))
  }

  /** Linear (equal-split) multi-touch attribution — the companion to
    * [[lastTouchAttribution]]: each conversion's value splits EQUALLY across
    * the DISTINCT touch channels seen before it ("direct" when none), so a
    * channel that only ever opens journeys still earns credit last-touch
    * structurally denies it. Output is per-channel (n_conversions — counting
    * fractional participation as 1 each, attributed_value).
    *
    * Physical shape: one exchange (entity key) + one window carrying the
    * RUNNING DISTINCT-CHANNEL SET in a ROWS frame ending at -1
    * (`collect_set` over the frame — bounded by |touchTypes|, a handful of
    * strings per row, never event volume), then an explode of that bounded
    * set on conversion rows only and the final |channels|+1-row aggregate.
    * The naive form is a per-conversion join back to all prior touches —
    * quadratic on active users; this never joins. */
  def linearAttribution(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "the conversion type cannot also be a touch type")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touches",
        collect_set(when(col(typeCol).isin(touchTypes.map(x => x: Any): _*),
          col(typeCol))).over(w))
      .where(col(typeCol) === convType)
      // no prior touch → the whole credit is "direct"
      .withColumn("touches",
        when(size(col("touches")) === 0, array(lit("direct")))
          .otherwise(col("touches")))
      .select(col(valueCol), explode(col("touches")).as("channel"),
        size(col("touches")).as("n_ch"))
      // exact equal-split in integers: value → micros via floor(x·1e6+0.5)
      // (floor acts on the identical binary double in every engine, where
      // round() diverges — see lastTouchAttribution), each share scaled by
      // K/n_ch with K = lcm(1..|touchTypes|) so every share is an exact
      // long — the sum is fold-order-free, and the cent reduction happens
      // in integer space ((total + K·5000) div K·10^4) so no float round
      // ever sits on a half-cent boundary.
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        (floor((sum(floor(col(valueCol) * 1e6 + 0.5).cast("long") *
              (lit(splitLcm(touchTypes.size)) / col("n_ch")).cast("long")) +
            lit(splitLcm(touchTypes.size) * 5000L)).cast("double") /
          (splitLcm(touchTypes.size) * 10000.0)).cast("double") / 100.0)
          .as("attributed_value"))
  }

  /** lcm(1..n): the common split denominator that makes every equal-split
    * share an exact integer in micro-units (n is |touchTypes|, single
    * digits — the lcm stays tiny). */
  private[graft] def splitLcm(n: Int): Long = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1 to math.max(n, 1)).foldLeft(1L)((acc, k) => acc / gcd(acc, k) * k)
  }

  /** Retention cohorts: entities cohorted by their first active day; for
    * each (cohort_day, day_offset) the count of entities active that day.
    * `dayCol` is any integral day number (e.g. `ts div 86 400e9` on a
    * nanosecond epoch).
    *
    * Physical shape: ONE shuffle of the event stream — per-entity distinct
    * days collapse map-side inside `collect_set`'s partial aggregation, the
    * cohort day is just the min of that set, and the explode emits one row
    * per (entity, active-day) into a final bounded groupBy
    * (|days|² cells max). Per-entity set size is bounded by the calendar
    * (≤ a few thousand distinct days even for a decade of activity), not by
    * event volume — the reason this beats the two-shuffle
    * distinct→min→join-back plan.
    */
  def retentionCohorts(events: DataFrame, keyCol: String,
      dayCol: Column): DataFrame = {
    events.select(col(keyCol), dayCol.cast("long").as("day"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_set(col("day"))).as("days"))
      .select(element_at(col("days"), 1).as("cohort_day"),
        explode(col("days")).as("day"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-user conversion latency, attributed to the FIRST touch: one row
    * per user who touched (any of `touchTypes`) and later converted
    * (`convType`), carrying the first touch's channel and the whole-second
    * delta from first touch to first conversion. The funnel-velocity
    * complement of the attribution family (q119/q122 say WHO gets credit;
    * this says HOW LONG conversion takes per acquisition channel) — feed
    * the output to [[ScaleOps.groupQuantiles]] for per-channel latency
    * percentiles without any per-channel sort.
    *
    * Scale shape: two user-keyed aggregates over disjoint row subsets
    * (touches, conversions) + one user-grain join — nothing wider than a
    * (user, ts, channel) triple shuffles, and the first-touch argmin rides
    * `min(struct(ts, event_id, type))`'s map-side partial aggregate
    * instead of a row_number window over the touch stream. `tsCol` must
    * be epoch-nanos (the engine convention); deltas floor to whole
    * seconds, so the output is integer-exact. */
  def timeToConvert(events: DataFrame, keyCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "the conversion type cannot also be a touch type")
    val firstTouch = events.where(col("event_type").isin(touchTypes: _*))
      .groupBy(col(keyCol))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
        .as("ft"))
      .select(col(keyCol), col("ft.ts").as("t0"),
        col("ft.event_type").as("channel"))
    val firstConv = events.where(col("event_type") === convType)
      .groupBy(col(keyCol)).agg(min(col("ts")).as("t1"))
    firstTouch.join(firstConv, keyCol)
      .where(col("t1") >= col("t0"))
      .select(col(keyCol), col("channel"),
        expr("(t1 - t0) div 1000000000").as("delta_sec"))
  }

  /** Robust time-series anomaly flags on daily event volume: per
    * `typeCol`, a day is anomalous when its count deviates from the type's
    * median daily count by more than `k` × the median absolute deviation
    * (MAD). Median/MAD instead of mean/stddev because volume anomalies are
    * exactly the rows that wreck the mean — one ingest outage or bot flood
    * shifts mean ± stddev enough to mask itself; the breakdown point of
    * the median is 50%.
    *
    * Everything is INTEGER arithmetic end to end (counts, positional
    * medians, absolute deviations, the k·mad compare), so the result is
    * fold-order-free and engine-exact — no float quantile interpolation to
    * disagree across engines. The median is the positional lower median
    * (row_number == (n+1)/2 over (value, day)), i.e. percentile_disc(0.5)
    * semantics with a deterministic tiebreak.
    *
    * Scale shape: the raw event table is touched by exactly ONE
    * (type, day)-keyed aggregate (map-side combine applies); every window
    * and join after that operates on the bounded |types| × |days| grid —
    * the same bounded-grid design as [[eventTransitions]]' normalization
    * and ScaleOps.psiDrift. mad == 0 (over half the days share the median
    * count) makes ANY deviating day anomalous — the conventional reading. */
  def dailyCountAnomalies(events: DataFrame, typeCol: String,
      dayCol: Column, k: Int = 3): DataFrame = {
    require(k >= 1, "k >= 1")
    // the one corpus-sized pass; persisted — the grid feeds the median
    // calc, the deviation calc, and the final flag scan
    val grid = graft.core.CacheScope.persist(
      events.select(col(typeCol).as("etype"), dayCol.cast("long").as("day"))
        .groupBy("etype", "day").agg(count(lit(1)).as("n")))

    def lowerMedian(df: DataFrame, valueCol: String,
        outCol: String): DataFrame = {
      val byType = Window.partitionBy(col("etype"))
      val ordered = byType.orderBy(col(valueCol), col("day"))
      df.withColumn("_rn", row_number().over(ordered))
        .withColumn("_ct", count(lit(1)).over(byType))
        .where(col("_rn") === floor((col("_ct") + 1) / 2)) // lower median
        .select(col("etype"), col(valueCol).as(outCol))
    }

    val med = lowerMedian(grid, "n", "med")
    val dev = grid.join(med, "etype")
      .withColumn("abs_dev", abs(col("n") - col("med")))
    val mad = lowerMedian(dev.select(col("etype"), col("day"),
      col("abs_dev").as("n")), "n", "mad")
    dev.join(mad, "etype")
      .where(col("abs_dev") > col("mad") * k)
      .select(col("etype"), col("day"), col("n"), col("med"), col("mad"),
        col("abs_dev"))
  }

  /** Top-k within-session event-type trigrams — behavioral sequence mining:
    * which three-step journeys dominate (view→click→purchase vs
    * view→view→view), the input to journey clustering, bot-pattern
    * screens, and next-event models. Sessions are gap-based with q30's
    * convention (a new session starts when the gap is ≥ `gapSec`); a
    * trigram never crosses a session boundary.
    *
    * Physical shape: ONE entity-keyed exchange total. The session marker
    * (lag), the running session-id sum, and the two look-aheads of
    * (event_type, session_id) are all windows over the SAME
    * `partitionBy(key) orderBy(ts, event_id)` spec, so Catalyst collapses
    * them into a single sort within a single exchange — no
    * `partitionBy(key, session)` re-shuffle (the look-ahead's session ids
    * are compared in a filter instead, which is equivalent and free). The
    * trigram count then partial-aggregates map-side into the bounded
    * |event types|³ space, and top-k is an orderBy+limit (TakeOrdered) on
    * that tiny frame, never a global sort of data rows. */
  /** Position-based ("U-shaped") multi-touch attribution — the third model
    * next to [[lastTouchAttribution]] and [[linearAttribution]]: 40% of each
    * conversion's value to the FIRST-seen channel, 40% to the LAST-seen
    * channel, 20% split equally across the remaining distinct channels.
    * Channel-grain: F = channel of the earliest prior touch event, L =
    * channel of the latest, M = distinct prior channels \ {F, L}. A channel
    * that is both first and last stacks both 40s; when M is empty the 20%
    * pot folds back into F/L (10% each — so a two-channel journey is 50/50
    * and a one-channel journey is 100%); no prior touch → "direct".
    *
    * Physical shape: identical to [[linearAttribution]] — one entity-key
    * exchange, three window columns over the same ROWS frame (first/last
    * ignoreNulls + the bounded collect_set), explode on conversion rows
    * only, final |channels|+1-row aggregate. No join back to touches.
    *
    * Money math: all shares are exact longs in units of micro·5·lcm —
    * 40% = 2·lcm, the M split = lcm/|M| (|M| ≤ |touchTypes| divides the
    * lcm), the fold-back halves need lcm even (true whenever a 2-channel
    * journey can exist) — summed fold-order-free and reduced to cents in
    * integer space, exactly the [[linearAttribution]] discipline. */
  def positionAttribution(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, valueCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      "the conversion type cannot also be a touch type")
    val lc = splitLcm(touchTypes.size) // even whenever touchTypes.size >= 2
    val S = 5 * lc                     // one conversion's total credit units
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(
      col(typeCol).isin(touchTypes.map(x => x: Any): _*), col(typeCol))
    events
      .withColumn("f_ch", first(touch, ignoreNulls = true).over(w))
      .withColumn("l_ch", last(touch, ignoreNulls = true).over(w))
      .withColumn("chs", collect_set(touch).over(w))
      .where(col(typeCol) === convType)
      .withColumn("chs",
        when(size(col("chs")) === 0, array(lit("direct")))
          .otherwise(col("chs")))
      .withColumn("n_mid",
        size(array_except(col("chs"), array(col("f_ch"), col("l_ch")))))
      .select(col(valueCol), col("f_ch"), col("l_ch"), col("n_mid"),
        explode(col("chs")).as("channel"))
      .withColumn("wgt",
        when(col("f_ch").isNull, lit(S.toLong)) // no touches → direct, 100%
          .when(col("channel") === col("f_ch") &&
              col("channel") === col("l_ch"),
            lit(4L * lc) + when(col("n_mid") === 0, lit(lc.toLong))
              .otherwise(lit(0L)))
          .when(col("channel") === col("f_ch") ||
              col("channel") === col("l_ch"),
            lit(2L * lc) + when(col("n_mid") === 0, lit(lc / 2))
              .otherwise(lit(0L)))
          .otherwise((lit(lc.toLong) / col("n_mid")).cast("long")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        (floor((sum(floor(col(valueCol) * 1e6 + 0.5).cast("long") *
              col("wgt")) + lit(S * 5000L)).cast("double") /
          (S * 10000.0)).cast("double") / 100.0).as("attributed_value"))
  }

  /** Per-entity exponentially-decayed activity score (α = 1/2, trailing
    * `window` events): at each entity's LATEST event, the halving-weighted
    * sum of its last `window` event values — weight 2^(window-1) for the
    * newest, halving per step back. The recency-weighted engagement gauge
    * (session scoring, churn features, freshness-weighted sampling keys).
    *
    * α = 1/2 over a bounded trailing window is the exactness trick: every
    * weight is a power of two, so score = Σ value_micros · 2^(window-rank)
    * is a single exact long both engines compute identically — no float
    * decay products, no fold-order sensitivity. Reduced to cents by integer
    * division (half-denominator added first = round-half-up).
    *
    * Physical shape: one entity-key exchange, a row_number window DESC, a
    * rank filter, one aggregate — the rank cut means only `window` rows per
    * entity survive into partial aggregation. Overflow bound (documented,
    * not just assumed): window ≤ 24 keeps Σ ≤ maxValue·1e6·2^24·24, safe
    * to |value| ≈ 2.3e4 — far above the catalog's value domain. */
  def decayScore(events: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, window: Int = 24): DataFrame = {
    require(window >= 1 && window <= 24, "window in [1, 24] (overflow bound)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val denom = (1L << (window - 1)) * 10000L // units per cent
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= window)
      // weight 2^(window - rn): rn = 1 (newest) → 2^(window-1), halving back
      .withColumn("units", floor(col(valueCol) * 1e6 + 0.5).cast("long") *
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($window - rn AS INT))"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_recent"), sum(col("units")).as("units"))
      .select(col(keyCol), col("n_recent"),
        (expr(s"(units + ${denom / 2}L) div ${denom}L").cast("double")
          / 100.0).as("decay_value"))
  }

  /** Peak concurrent sessions per day — the sweep-line replacement for the
    * interval self-join ("how many sessions overlap instant t" as a
    * time-range join is quadratic on busy windows). Sessions come from the
    * q30 gap rule (new session at gap ≥ `gapSec`); each contributes +1 at
    * its first event and −1 at its last (+1 sorts before −1 at the same
    * instant, so an instantaneous single-event session peaks at 1 and a
    * back-to-back end/start at one instant counts both). `max_concurrent`
    * is the max post-delta concurrency among that day's boundary events.
    *
    * Scale shape — a distributed prefix scan, NOT a global running sum:
    * in-day running totals window on PARTITION BY day (parallel across
    * days); the cross-day carry is a cumulative sum over the |days|-row
    * per-day net frame (the only single-partition step, bounded by the
    * calendar); peak(day) = carry + max(in-day running). Equal to the
    * single-ordered-sweep definition because the carry is constant within
    * a day, and tie groups (equal ts, equal delta) reach an
    * order-invariant max (monotone within the group). */
  def peakConcurrency(events: DataFrame, keyCol: String,
      gapSec: Long = 1800): DataFrame = {
    require(gapSec >= 1, "gapSec >= 1")
    val gapNanos = gapSec * 1000000000L
    val dayNanos = 86400000000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .select(col(keyCol), col("ts"), col("event_id"))
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) < gapNanos, lit(0))
          .otherwise(lit(1)))
      .withColumn("sid", sum(col("new_s")).over(run))
      .groupBy(col(keyCol), col("sid"))
      .agg(min(col("ts")).as("s_ts"), max(col("ts")).as("e_ts"))
    val deltas = sessions.select(col("s_ts").as("ts"), lit(1L).as("d"))
      .unionAll(sessions.select(col("e_ts").as("ts"), lit(-1L).as("d")))
      .withColumn("day", expr(s"ts div ${dayNanos}L"))
    // in-day running concurrency, parallel across day partitions
    val inDay = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = deltas
      .withColumn("running", sum(col("d")).over(inDay))
      .groupBy(col("day"))
      .agg(max(col("running")).as("in_day_peak"),
        sum(col("d")).as("net"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_ends"))
    // cross-day carry: cumulative prior-day net over the bounded |days| frame
    val carried = peaks
      .withColumn("carry",
        coalesce(sum(col("net"))
          .over(Window.partitionBy(lit(0)).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    carried.select(col("day"), col("n_starts"), col("n_ends"),
      (col("carry") + col("in_day_peak")).as("max_concurrent"))
  }

  /** RFM (recency / frequency / monetary) scoring over conversion events —
    * the classic customer-value segmentation, in its threshold-quintile
    * form: per-entity recency (latest conversion ts), frequency
    * (conversion count), monetary (micro-unit value sum) are each scored
    * 1–5 by exact 20/40/60/80th-percentile boundaries of the population,
    * score = 1 + #boundaries strictly below the metric.
    *
    * Threshold quintiles, not ntile: rank-based ntile needs a global sort
    * (a data-sized single partition — the anti-pattern the catalog's plan
    * audit forbids); percentile boundaries are ONE 1-row aggregate
    * broadcast back, the scoring a codegen'd CASE — fully parallel, and
    * deterministic because Spark's interpolating `percentile` matches
    * DuckDB's `quantile_cont` bit-for-bit (the q48 contract). Ties at a
    * boundary score LOW side (strict >).
    *
    * Returns (key, n_conv, r_score, f_score, m_score, rfm_cell) with
    * rfm_cell = 100·r + 10·f + m. */
  def rfmScores(events: DataFrame, keyCol: String, typeCol: String,
      valueCol: String, convType: String): DataFrame = {
    val per = events.where(col(typeCol) === convType)
      .groupBy(col(keyCol))
      .agg(max(col("ts")).as("r_ts"),
        count(lit(1)).as("n_conv"),
        sum(floor(col(valueCol) * 1e6 + 0.5).cast("long")).as("m_micro"))
    val qs = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    val bounds = per.agg(
      expr(s"percentile(r_ts, $qs)").as("rb"),
      expr(s"percentile(n_conv, $qs)").as("fb"),
      expr(s"percentile(m_micro, $qs)").as("mb"))
    def score(metric: Column, b: String): Column =
      (lit(1) + (1 to 4).map(i =>
        when(metric > element_at(col(b), i), 1).otherwise(0))
        .reduce(_ + _)).cast("long")
    per.crossJoin(broadcast(bounds))
      .select(col(keyCol), col("n_conv"),
        score(col("r_ts").cast("double"), "rb").as("r_score"),
        score(col("n_conv").cast("double"), "fb").as("f_score"),
        score(col("m_micro").cast("double"), "mb").as("m_score"))
      .withColumn("rfm_cell",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }

  /** Per-type daily-volume trend slopes by exact integer least squares —
    * "is this event type growing or decaying, and how fast": x = day
    * number, y = that day's count, OLS slope = (nΣxy − ΣxΣy)/(nΣx² −
    * (Σx)²). Numerator and denominator are emitted as exact longs (the
    * rational slope), plus `slope_micro` = round(1e6·num/den) computed in
    * double — exact cross-engine because both operands stay far under
    * 2^53 (documented bound: |1e6·num| < 2^53 up to ~10⁹ events/day/type).
    * Days with no events contribute nothing (count 0 days are absent, not
    * zero — the standard sparse-series convention; densify upstream with
    * the q53 gap-fill if zeros should weigh in).
    *
    * Scale shape: one (type, day) aggregate (map-side collapse to
    * |types|·|days| rows), then a |types|-row aggregate — the corpus
    * never moves twice. */
  def dailyTrendSlopes(events: DataFrame, typeCol: String): DataFrame = {
    val dayNanos = 86400000000000L
    events
      .select(col(typeCol).as("t"), expr(s"ts div ${dayNanos}L").as("x"))
      .groupBy(col("t"), col("x"))
      .agg(count(lit(1)).as("y"))
      .groupBy(col("t").as(typeCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col(typeCol), col("n_days"),
        (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope_micro",
        when(col("slope_den") =!= 0,
          floor((lit(1000000.0) * col("slope_num")) / col("slope_den") + 0.5)
            .cast("long")))
  }

  /** Bot-signature candidates: entities whose inter-arrival times are
    * machine-regular — at least `minEvents` events and a squared
    * coefficient of variation of the gaps at or below 1/`cvDenom`
    * (metronome traffic; humans are bursty). The behavioral-corpus hygiene
    * gate: scripted traffic poisons funnels, attribution, and any
    * sequence-model training set.
    *
    * All exact integers, no float moments: gaps in whole seconds,
    * cv² = (n·Σg² − (Σg)²)/(Σg)², and the threshold cv² ≤ cvNum/cvDen is
    * the cross-multiplication `(n·Σg² − (Σg)²) · cvDen ≤ (Σg)² · cvNum`.
    * Overflow bounds (documented): gaps ≤ 2.6e6 s (a month), ≤ ~10⁴
    * gaps/user keeps every product under 2^63.
    *
    * Scale shape: one entity-key exchange (the lag window), one aggregate
    * — partials collapse map-side; output only the flagged entities. */
  def botCandidates(events: DataFrame, keyCol: String,
      orderCols: Seq[String], minEvents: Long = 10,
      cvNum: Long = 1, cvDen: Long = 20): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must pin a deterministic order")
    require(minEvents >= 3 && cvNum >= 1 && cvDen >= 1,
      "minEvents >= 3, cv threshold positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .where(col("prev_ts").isNotNull)
      .withColumn("gap_s", expr("(ts - prev_ts) div 1000000000L"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).as("sum_gap_s"),
        sum(col("gap_s") * col("gap_s")).as("sum_gap_sq"))
      .where(col("n_gaps") >= minEvents - 1 && col("sum_gap_s") > 0)
      .withColumn("var_num",
        col("n_gaps") * col("sum_gap_sq") - col("sum_gap_s") * col("sum_gap_s"))
      .where(col("var_num") * cvDen <=
        col("sum_gap_s") * col("sum_gap_s") * cvNum)
      .select(col(keyCol), col("n_gaps"), col("sum_gap_s"), col("var_num"))
  }

  /** Cohort LTV curves — the revenue companion to [[retentionCohorts]]:
    * entities cohorted by first-activity day; for each (cohort_day,
    * day_offset) the purchase count, that cell's revenue, and the RUNNING
    * cumulative revenue — the "how much has the day-N cohort earned by
    * day N+k" curve that pays for acquisition decisions.
    *
    * Money math: per-cell micro-unit integer sums (the attribution
    * discipline), cumulated in MICRO space over the bounded
    * |days|²-cell grid window (cumulating the rounded cents would drift),
    * converted to cents once per output row. One event shuffle for the
    * cohort join, one bounded-grid aggregate + window. */
  def cohortLtv(events: DataFrame, keyCol: String, typeCol: String,
      valueCol: String, convType: String): DataFrame = {
    val dayNanos = 86400000000000L
    val day = expr(s"ts div ${dayNanos}L")
    val firstDay = events.groupBy(col(keyCol))
      .agg(min(day).as("cohort_day"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def cents(micro: Column): Column =
      (floor((micro + lit(5000L)).cast("double") / 10000.0)
        .cast("double") / 100.0)
    events.where(col(typeCol) === convType)
      .select(col(keyCol), day.as("d"),
        floor(col(valueCol) * 1e6 + 0.5).cast("long").as("micro"))
      .join(firstDay, keyCol)
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("micro")).as("cell_micro"))
      .withColumn("cum_micro", sum(col("cell_micro")).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_purchases"),
        cents(col("cell_micro")).as("revenue"),
        cents(col("cum_micro")).as("cum_revenue"))
  }

  def sessionTrigrams(events: DataFrame, keyCol: String,
      gapSec: Long = 1800, topK: Int = 25): DataFrame = {
    require(gapSec >= 1 && topK >= 1, "gapSec >= 1, topK >= 1")
    val gapNanos = gapSec * 1000000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lag == null (first event) → the comparison is null → otherwise(1)
    val marked = events
      .select(col(keyCol), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) < gapNanos, lit(0))
          .otherwise(lit(1)))
      .withColumn("sid", sum(col("new_s")).over(run))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .withColumn("s1", lead(col("sid"), 1).over(w))
      .withColumn("s2", lead(col("sid"), 2).over(w))
    marked
      .where(col("s1") === col("sid") && col("s2") === col("sid"))
      .select(concat_ws(" ", col("event_type"), col("t1"), col("t2"))
        .as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(topK)
      .withColumn("rnk", row_number().over(Window.partitionBy(lit(0))
        .orderBy(col("n").desc, col("trigram"))).cast("long"))
  }

  /** Fano factor (index of dispersion, var/mean of per-window counts) per
    * event type over fixed time windows — the burstiness gauge: ≈ 1.0 is
    * Poisson-like organic traffic, ≫ 1 is bursty (flash crowds, retry
    * storms, batch jobs), ≪ 1 is metronomic (schedulers, the q149 bot
    * signature at population grain). Empty windows inside the corpus span
    * COUNT (a type firing once an hour vs once at minute 0–5 of each hour
    * differ exactly there).
    *
    * Exact integers: with W = global window count, n = events of the
    * type, s2 = Σ per-window count², population var/mean reduces to
    * fano = (W·s2 − n²) / (W·n) — one truncating micro division of exact
    * int64s. Headroom: W·s2·1e6 must fit int64 (fine to ~10⁹ events/type
    * at hourly windows over months; widen `windowSec` beyond that).
    *
    * Scale shape: one (type, window)-keyed count (map-side combined),
    * re-aggregated to type grain; the global (min, max) window anchor is
    * a 1-row broadcast. No windows, no sorts. */
  def fanoFactor(events: DataFrame, typeCol: String,
      windowSec: Long = 3600L): DataFrame = {
    require(windowSec >= 1L, "windowSec >= 1")
    val win = expr(s"ts div ${windowSec * 1000000000L}L")
    val perWin = events.select(col(typeCol).as("event_type"), win.as("w"))
      .groupBy("event_type", "w").agg(count(lit(1)).as("c"))
    val anchor = perWin.agg(min("w").as("w_lo"), max("w").as("w_hi"))
    perWin.groupBy("event_type")
      .agg(sum("c").as("n_events"),
        sum(col("c") * col("c")).as("s2"),
        count(lit(1)).as("n_active_windows"))
      .crossJoin(broadcast(anchor)) // 1-row span anchor
      .withColumn("n_windows", col("w_hi") - col("w_lo") + 1L)
      .select(col("event_type"), col("n_events"), col("n_windows"),
        col("n_active_windows"),
        expr("(n_events * 1000000L) div n_windows").as("mean_micro"),
        expr("((n_windows * s2 - n_events * n_events) * 1000000L) div " +
          "(n_windows * n_events)").as("fano_micro"))
  }

  /** Stationary distribution of the first-order event-type Markov chain:
    * where does a user's session settle in the long run? Feed for
    * "expected steady-state traffic mix" capacity questions and the
    * behavioral drift companion to [[eventTransitions]] (q114): compare
    * π across corpus versions instead of eyeballing the full matrix.
    *
    * Semantics pinned for exact cross-engine replay:
    *   - transition probabilities are [[eventTransitions]]' `p_micro`
    *     (integer micro, q114's convention);
    *   - types that occur but have no outgoing edge (sequence-final only)
    *     get a self-loop with p_micro = 1e6 — the deterministic absorbing
    *     convention (no teleport, no renormalize);
    *   - π₀ is uniform floor(1e6 / |T|); each round is
    *     πⱼ' = (Σᵢ πᵢ·p_micro(i,j)) div 1e6 — int64 products and an
    *     order-free integer sum, then floor division. Mass decays by the
    *     floor remainders (≤ |T| micro per round); both engines replay the
    *     identical integers, which is the point.
    *
    * Scale shape: the data-sized work is [[eventTransitions]] (one entity
    * exchange + a groupBy bounded by |alphabet|²). The iteration operates
    * on that bounded matrix — collected to the driver (a documented
    * bounded collect, |T|² rows where |T| is the event-type alphabet, the
    * same contract as the per-stratum plan rows in [[ScaleOps]]) and
    * folded exactly; 1000 executors would gain nothing on a ≤ dozens-row
    * frame, and the driver fold keeps the plan two stages deep instead of
    * `rounds` joins. */
  def stationaryDistribution(events: DataFrame, keyCol: String,
      orderCols: Seq[String], typeCol: String, rounds: Int = 8): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val trans = eventTransitions(events, keyCol, orderCols, typeCol)
      .select(col("prev_type").cast("string"), col("next_type").cast("string"),
        col("p_micro"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val allTypes = events.select(col(typeCol).cast("string").as("t"))
      .distinct().collect().map(_.getString(0)).sorted
    if (allTypes.isEmpty) {
      // empty event stream: empty π, not a divide-by-zero on the driver
      return Seq.empty[(String, Long)].toDF("event_type", "pi_micro")
    }
    val sinks = allTypes.toSet -- trans.map(_._1).toSet
    val edges = trans ++ sinks.toSeq.sorted.map(t => (t, t, 1000000L))
    val idx = allTypes.zipWithIndex.toMap
    var pi = Array.fill(allTypes.length)(1000000L / allTypes.length)
    for (_ <- 1 to rounds) {
      val next = Array.fill(allTypes.length)(0L)
      edges.foreach { case (i, j, p) => next(idx(j)) += pi(idx(i)) * p }
      pi = next.map(_ / 1000000L)
    }
    allTypes.map(t => (t, pi(idx(t)))).toSeq
      .toDF("event_type", "pi_micro")
  }

  /** Session entry/exit census — per entry event type: sessions started
    * there, single-event ("bounce") sessions, bounce rate, and the mean
    * session length in micro events. The landing-page report of classic
    * web analytics, generalized to any event stream: a type that opens
    * many sessions and bounces most of them is an acquisition leak.
    * Sessions are [[sessionTrigrams]]' gap rule (a new session when the
    * gap to the previous event ≥ `gapSec`); entry/exit are the first/last
    * events by (ts, event_id) — deterministic because event ids are
    * unique. All exact integers.
    *
    * Scale shape: ONE entity-keyed exchange for the session-id window
    * (the per-entity sequence contract in the object doc), then the
    * session-grain reduction rides a (key, sid)-keyed aggregate whose
    * min/max-of-struct partials collapse map-side; the final census is a
    * bounded \|types\|-row aggregate. No self-joins, nothing
    * session-grain ever sorts globally. */
  def sessionEntryExit(events: DataFrame, keyCol: String,
      gapSec: Long = 1800): DataFrame = {
    require(gapSec >= 1, "gapSec >= 1")
    val gapNanos = gapSec * 1000000000L
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select(col(keyCol), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(col("ts") - lag(col("ts"), 1).over(w) < gapNanos, lit(0))
          .otherwise(lit(1)))
      .withColumn("sid", sum(col("new_s")).over(run))
    val sessions = marked
      .groupBy(col(keyCol), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_type"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("exit_type"))
    sessions.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounces"),
        sum(col("n_events")).as("n_events"),
        sum(when(col("exit_type") === col("entry_type"), 1L).otherwise(0L))
          .as("n_exit_same"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
        expr("(n_bounces * 1000000L) div n_sessions").as("bounce_micro"),
        expr("(n_events * 1000000L) div n_sessions").as("len_micro"),
        col("n_exit_same"))
  }
}
