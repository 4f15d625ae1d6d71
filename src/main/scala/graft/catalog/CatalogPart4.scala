package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** Catalog part: q119, q122-q150: attribution, SCD2, components, hashed features.
  *
  * Split from the single QueryCatalog file for size; specs stay
  * package-private and the ordered aggregation lives in
  * [[QueryCatalog.all]]. */
private[graft] trait CatalogPart4 extends CatalogPart3 {

  private[graft] val q119 = QuerySpec(
    "q119_last_touch",
    (s, dir) => graft.operators.EventOps.lastTouchAttribution(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"),
        "event_type", "value", Seq("click", "view"), "purchase")
      .orderBy(col("channel")),
    Some("""WITH t AS (SELECT user_id, event_type, value,
        last_value(CASE WHEN event_type IN ('click', 'view')
            THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
        FROM events)
      SELECT coalesce(channel, 'direct') AS channel,
        count(*) AS n_conversions,
        CAST(floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
            + 5000 AS DOUBLE) / 10000.0) AS DOUBLE) / 100.0 AS attributed_value
      FROM t WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1"""))

  /** Linear multi-touch attribution
    * ([[graft.operators.EventOps.linearAttribution]]): each purchase's value
    * split equally across the DISTINCT prior click/view channels ("direct"
    * when none) — the running distinct-channel set rides a ROWS frame
    * (bounded by |channels|), never a per-conversion join back. The oracle
    * necessarily joins (SQL has no frame-local collect_set) — same result,
    * quadratic shape ours exists to avoid. */
  private[graft] val q122 = QuerySpec(
    "q122_linear_attribution",
    (s, dir) => graft.operators.EventOps.linearAttribution(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"),
        "event_type", "value", Seq("click", "view"), "purchase")
      .orderBy(col("channel")),
    Some("""WITH conv AS (SELECT user_id, ts, event_id, value FROM events
        WHERE event_type = 'purchase'),
      tch AS (SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type IN ('click', 'view')),
      paths AS (SELECT c.user_id, c.event_id AS conv_id, c.value,
          t.event_type AS channel
        FROM conv c JOIN tch t ON t.user_id = c.user_id
          AND (t.ts, t.event_id) < (c.ts, c.event_id)
        GROUP BY 1, 2, 3, 4),
      sized AS (SELECT conv_id, value, channel,
          count(*) OVER (PARTITION BY conv_id) AS n_ch FROM paths),
      direct AS (SELECT c.event_id AS conv_id, c.value, 'direct' AS channel,
          1 AS n_ch
        FROM conv c WHERE NOT EXISTS (SELECT 1 FROM tch t
          WHERE t.user_id = c.user_id
            AND (t.ts, t.event_id) < (c.ts, c.event_id))),
      allc AS (SELECT * FROM sized UNION ALL SELECT * FROM direct)
      SELECT channel, count(*) AS n_conversions,
        CAST(floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
              * (2 // n_ch)) + 10000 AS DOUBLE) / 20000.0) AS DOUBLE) / 100.0
          AS attributed_value
      FROM allc GROUP BY 1 ORDER BY 1"""))

  /** Deequ-style data-quality audit ([[graft.operators.DataChecks]]): a
    * six-check expectations suite over `orders` — nullability, key
    * uniqueness, accepted values, range, a custom predicate, and customer
    * referential integrity — as ONE aggregate pass plus one anti-join
    * count. The gate a scheduler runs before trusting an ingest. */
  private[graft] val q123 = QuerySpec(
    "q123_quality_checks",
    (s, dir) => {
      import graft.operators.DataChecks
      DataChecks.audit(t(s, dir, "orders"), Seq(
        DataChecks.NotNull("orderkey_not_null", "o_orderkey"),
        DataChecks.Unique("orderkey_unique", Seq("o_orderkey")),
        DataChecks.AcceptedValues("status_accepted", "o_orderstatus",
          Seq("F", "O", "P")),
        DataChecks.InRange("totalprice_range", "o_totalprice", 0.0, 600000.0),
        DataChecks.Predicate("date_after_epoch",
          col("o_orderdate") >= lit("1992-01-01").cast("date")),
        DataChecks.ForeignKey("custkey_fk", "o_custkey",
          t(s, dir, "customer"), "c_custkey")))
    },
    Some("""WITH agg AS (SELECT
        sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nn,
        count(*) - count(DISTINCT ROW(o_orderkey)) AS uq,
        sum(CASE WHEN o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS av,
        sum(CASE WHEN o_totalprice IS NOT NULL
          AND o_totalprice NOT BETWEEN 0.0 AND 600000.0 THEN 1 ELSE 0 END) AS rg,
        sum(CASE WHEN NOT coalesce(o_orderdate >= DATE '1992-01-01', false)
          THEN 1 ELSE 0 END) AS pr
        FROM orders),
      fk AS (SELECT count(*) AS v FROM orders o
        WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      rows0 AS (
        SELECT 'orderkey_not_null' AS "check", CAST(nn AS BIGINT) AS violations FROM agg
        UNION ALL SELECT 'orderkey_unique', CAST(uq AS BIGINT) FROM agg
        UNION ALL SELECT 'status_accepted', CAST(av AS BIGINT) FROM agg
        UNION ALL SELECT 'totalprice_range', CAST(rg AS BIGINT) FROM agg
        UNION ALL SELECT 'date_after_epoch', CAST(pr AS BIGINT) FROM agg
        UNION ALL SELECT 'custkey_fk', CAST(v AS BIGINT) FROM fk)
      SELECT "check", violations, violations = 0 AS passed
      FROM rows0 ORDER BY "check""""))

  /** Incremental rollup maintenance ([[graft.operators.Incremental]]):
    * a standing daily (type, day) rollup for days < 19745 merged with a
    * fresh batch's partials — counts and integer micro-sums add, min/max
    * fold, so merging partials IS recomputing, which is exactly what the
    * oracle asserts by aggregating all raw events directly. The pattern
    * that lets a 100-TB event history absorb a day's data at
    * O(|batch| + |rollup|) cost. */
  private[graft] val q124 = QuerySpec(
    "q124_incremental_rollup",
    (s, dir) => {
      import graft.operators.Incremental
      val ev = t(s, dir, "events")
        .withColumn("day", expr("ts div 86400000000000"))
        .select("event_type", "day", "value")
      val standing = Incremental.rollupPartials(
        ev.where(col("day") < 19745), Seq("event_type", "day"), "value")
      val batch = Incremental.rollupPartials(
        ev.where(col("day") >= 19745), Seq("event_type", "day"), "value")
      Incremental.mergeRollup(standing, batch, Seq("event_type", "day"))
        .orderBy("event_type", "day")
    },
    Some("""SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        count(value) AS n,
        CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro,
        min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** SCD Type-2 dimension build ([[graft.operators.Incremental.scd2]]):
    * each user's event-type change log collapsed to version intervals
    * with [valid_from, valid_to) bounds — the Kimball dimension-history
    * shape, in one key-hashed exchange (lag marks run starts, lead closes
    * intervals, same window partitioning throughout). */
  private[graft] val q125 = QuerySpec(
    "q125_scd2_intervals",
    (s, dir) => graft.operators.Incremental.scd2(
        t(s, dir, "events").select("user_id", "ts", "event_id", "event_type"),
        "user_id", Seq("ts", "event_id"), "event_type")
      .orderBy("user_id", "version"),
    Some("""WITH o AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
        event_type,
        row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
      r AS (SELECT * FROM o
        WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
      SELECT user_id, event_type, ts AS valid_from,
        lead(ts) OVER w2 AS valid_to,
        lead(ts) OVER w2 IS NULL AS is_current,
        CAST(row_number() OVER w2 AS INTEGER) AS version
      FROM r WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, version"""))

  /** Keyed snapshot diff / CDC ([[graft.operators.Incremental.tableDiff]]):
    * customer v1 vs a derived v2 (every 13th key deleted, every 7th
    * acctbal bumped, every 11th cloned to a new key) → (op ∈ I/U/D,
    * changed column list, key). One co-partitioned full-outer join on the
    * key; unchanged rows never leave the join. */
  private[graft] val q126 = QuerySpec(
    "q126_table_cdc",
    (s, dir) => {
      val v1 = t(s, dir, "customer")
      val v2 = v1.where(col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal", when(col("c_custkey") % 7 === 0,
          col("c_acctbal") + 100.0).otherwise(col("c_acctbal")))
        .unionByName(v1.where(col("c_custkey") % 11 === 0)
          .withColumn("c_custkey", col("c_custkey") + 1000000), allowMissingColumns = false)
      graft.operators.Incremental.tableDiff(v1, v2, Seq("c_custkey"),
          Seq("c_name", "c_nationkey", "c_acctbal"))
        .orderBy("op", "c_custkey")
    },
    Some("""WITH v1 AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal
        FROM customer),
      v2 AS (SELECT c_custkey, c_name, c_nationkey,
          CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
            ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal
        FROM customer WHERE c_custkey % 11 = 0),
      j AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb,
          array_to_string(list_filter([
            CASE WHEN a.c_name IS DISTINCT FROM b.c_name THEN 'c_name' END,
            CASE WHEN a.c_nationkey IS DISTINCT FROM b.c_nationkey THEN 'c_nationkey' END,
            CASE WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal THEN 'c_acctbal' END],
            x -> x IS NOT NULL), ',') AS changed_cols
        FROM v1 a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
      SELECT CASE WHEN ka IS NULL THEN 'I' WHEN kb IS NULL THEN 'D'
          WHEN changed_cols <> '' THEN 'U' END AS op,
        changed_cols, coalesce(ka, kb) AS c_custkey
      FROM j
      WHERE (CASE WHEN ka IS NULL THEN 'I' WHEN kb IS NULL THEN 'D'
          WHEN changed_cols <> '' THEN 'U' END) IS NOT NULL
      ORDER BY op, c_custkey"""))

  /** Robust daily-volume anomaly flags
    * ([[graft.operators.EventOps.dailyCountAnomalies]]): days whose event
    * count deviates from the type's median by more than k×MAD —
    * median/MAD so the anomalies can't mask themselves the way they shift
    * a mean/stddev gate. All-integer positional medians over the bounded
    * |types|×|days| grid; ONE corpus-sized aggregate. */
  private[graft] val q127 = QuerySpec(
    "q127_anomaly_mad",
    (s, dir) => graft.operators.EventOps.dailyCountAnomalies(
        t(s, dir, "events"), "event_type",
        expr("ts div 86400000000000"), k = 2)
      .orderBy("etype", "day"),
    Some("""WITH grid AS (SELECT event_type AS etype,
        epoch_ns(ts) // 86400000000000 AS day, count(*) AS n
        FROM events GROUP BY 1, 2),
      m AS (SELECT etype, n AS med FROM (
        SELECT etype, n,
          row_number() OVER (PARTITION BY etype ORDER BY n, day) AS rn,
          count(*) OVER (PARTITION BY etype) AS ct FROM grid)
        WHERE rn = (ct + 1) // 2),
      d AS (SELECT g.etype, g.day, g.n, m.med, abs(g.n - m.med) AS abs_dev
        FROM grid g JOIN m USING (etype)),
      md AS (SELECT etype, abs_dev AS mad FROM (
        SELECT etype, abs_dev, day,
          row_number() OVER (PARTITION BY etype ORDER BY abs_dev, day) AS rn,
          count(*) OVER (PARTITION BY etype) AS ct FROM d)
        WHERE rn = (ct + 1) // 2)
      SELECT d.etype, d.day, d.n, d.med, md.mad, d.abs_dev
      FROM d JOIN md USING (etype)
      WHERE d.abs_dev > 2 * md.mad
      ORDER BY d.etype, d.day"""))

  /** PMI collocation mining
    * ([[graft.operators.TextAnalysis.pmiCollocations]]): top-50 bigrams by
    * pointwise mutual information at min count 5 — integer micro-nat
    * scores off exact counts, min-count cut before any join, top-k as
    * TakeOrdered. The multi-word-unit signal for tokenizer vocabularies
    * and crawl drift. */
  private[graft] val q128 = QuerySpec(
    "q128_pmi_collocations",
    (s, dir) => graft.operators.TextAnalysis.pmiCollocations(
        t(s, dir, "documents"), "text", minCount = 5, k = 50)
      .orderBy("rnk"),
    Some("""WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk
        FROM documents),
      bg AS (SELECT (CASE WHEN len(tk) <= 2 THEN text
          ELSE tk[g] || ' ' || tk[g + 1] END) AS bigram
        FROM toks, LATERAL (SELECT unnest(generate_series(1,
          CASE WHEN len(tk) <= 2 THEN 1 ELSE len(tk) - 1 END)) AS g) s),
      bgc AS (SELECT bigram, count(*) AS c12 FROM bg GROUP BY 1),
      totb AS (SELECT sum(c12) AS tot_b FROM bgc),
      unic AS (SELECT tok, count(*) AS c FROM
        (SELECT unnest(tk) AS tok FROM toks) GROUP BY 1),
      totn AS (SELECT sum(c) AS tot_n FROM unic),
      scored AS (SELECT b.bigram, b.c12, u1.c AS c1, u2.c AS c2,
          CAST(floor(ln(CAST(b.c12 AS DOUBLE) * CAST(totn.tot_n AS DOUBLE)
              * CAST(totn.tot_n AS DOUBLE)
            / (CAST(totb.tot_b AS DOUBLE) * CAST(u1.c AS DOUBLE)
              * CAST(u2.c AS DOUBLE))) * 1000000.0 + 0.5) AS BIGINT)
            AS pmi_micro
        FROM bgc b
        JOIN unic u1 ON u1.tok = string_split(b.bigram, ' ')[1]
        JOIN unic u2 ON u2.tok =
          string_split(b.bigram, ' ')[len(string_split(b.bigram, ' '))],
        totb, totn
        WHERE b.c12 >= 5)
      SELECT bigram, c12, c1, c2, pmi_micro,
        row_number() OVER (ORDER BY pmi_micro DESC, bigram) AS rnk
      FROM scored ORDER BY pmi_micro DESC, bigram LIMIT 50"""))

  /** Conversion-latency percentiles per acquisition channel
    * ([[graft.operators.EventOps.timeToConvert]] →
    * [[graft.operators.ScaleOps.groupQuantiles]]): first-touch →
    * first-conversion whole-second deltas, exact p50/p90/p99 via the
    * bounded-histogram read-off — funnel velocity with no per-channel
    * sort of user rows. */
  private[graft] val q129 = QuerySpec(
    "q129_time_to_convert",
    (s, dir) => {
      val d = graft.operators.EventOps.timeToConvert(
        t(s, dir, "events"), "user_id", Seq("click", "view"), "purchase")
      graft.operators.ScaleOps.groupQuantiles(
          d, "channel", col("delta_sec"), Seq(500, 900, 990))
        .orderBy("channel", "p_permille")
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
        event_type FROM events),
      ft AS (SELECT user_id, ts AS t0, event_type AS channel FROM (
        SELECT user_id, ts, event_id, event_type,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM e WHERE event_type IN ('click', 'view')) WHERE rn = 1),
      fc AS (SELECT user_id, min(ts) AS t1 FROM e
        WHERE event_type = 'purchase' GROUP BY 1),
      d AS (SELECT channel, (t1 - t0) // 1000000000 AS v
        FROM ft JOIN fc USING (user_id) WHERE t1 >= t0),
      hist AS (SELECT channel, v, count(*) AS c FROM d GROUP BY 1, 2),
      cum AS (SELECT channel, v, c,
          sum(c) OVER (PARTITION BY channel ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(c) OVER (PARTITION BY channel) AS n FROM hist),
      q AS (
        SELECT channel, CAST(500 AS BIGINT) AS p_permille, min(v) AS q
        FROM cum WHERE cum >= (n * 500 + 999) // 1000 GROUP BY 1
        UNION ALL
        SELECT channel, CAST(900 AS BIGINT), min(v)
        FROM cum WHERE cum >= (n * 900 + 999) // 1000 GROUP BY 1
        UNION ALL
        SELECT channel, CAST(990 AS BIGINT), min(v)
        FROM cum WHERE cum >= (n * 990 + 999) // 1000 GROUP BY 1)
      SELECT channel, p_permille, q FROM q ORDER BY channel, p_permille"""))

  /** Exact triangle census of the co-purchase graph
    * ([[graft.operators.Components.triangleCount]]): parts co-occurring in
    * a high-quantity order are edges; the degree-ordered node-iterator
    * counts every triangle once with O(√m)-bounded wedge fanout. The
    * closed-wedge ratio (global clustering coefficient, integer micro) is
    * the basket-affinity / dup-graph-collapse gauge. */
  private[graft] val q130 = QuerySpec(
    "q130_triangle_census",
    (s, dir) => {
      val items = t(s, dir, "lineitem").where(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
      graft.operators.Components.triangleCount(pairs, "a", "b")
    },
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= 40),
      canon AS (SELECT DISTINCT least(i.p, j.p) AS a, greatest(i.p, j.p) AS b
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p),
      deg AS (SELECT id, count(*) AS deg FROM
        (SELECT a AS id FROM canon UNION ALL SELECT b FROM canon) GROUP BY 1),
      o AS (SELECT
          CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
            THEN c.a ELSE c.b END AS u,
          CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
            THEN c.b ELSE c.a END AS v
        FROM canon c JOIN deg da ON da.id = c.a JOIN deg db ON db.id = c.b),
      wg AS (SELECT l.u, l.v, r.v AS w FROM o l
        JOIN o r ON l.u = r.u AND l.v < r.v),
      tri AS (SELECT count(*) AS n_triangles FROM wg
        WHERE EXISTS (SELECT 1 FROM canon cc
          WHERE cc.a = wg.v AND cc.b = wg.w)),
      tot AS (SELECT (sum(deg) // 2) AS n_edges,
          sum(deg * (deg - 1) // 2) AS n_wedges FROM deg)
      SELECT CAST(tot.n_edges AS BIGINT) AS n_edges,
        CAST(tot.n_wedges AS BIGINT) AS n_wedges, tri.n_triangles,
        CASE WHEN tot.n_wedges > 0 THEN CAST(floor(
          tri.n_triangles * 3000000.0 / tot.n_wedges + 0.5) AS BIGINT)
        END AS closure_micro
      FROM tot, tri"""))

  /** 3-core of the co-purchase graph
    * ([[graft.operators.Components.kCore]]): synchronous degree peeling,
    * defined as exactly 6 peel rounds so the oracle can unroll them — the
    * Spark side early-exits at the fixpoint, which is value-identical
    * because survivor sets shrink monotonically. Dense-core membership is
    * the dup-graph collapse gauge (template storms survive peeling). */
  private[graft] val q131 = QuerySpec(
    "q131_kcore",
    (s, dir) => {
      val items = t(s, dir, "lineitem").where(col("l_quantity") >= 35)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
      graft.operators.Components.kCore(pairs, "a", "b", k = 3, rounds = 6)
        .orderBy("id")
    },
    Some("""WITH items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= 35),
      e0 AS MATERIALIZED (SELECT DISTINCT least(i.p, j.p) AS a, greatest(i.p, j.p) AS b
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p),
      s1 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY 1 HAVING count(*) >= 3),
      e1 AS MATERIALIZED (SELECT a, b FROM e0 WHERE a IN (SELECT id FROM s1)
        AND b IN (SELECT id FROM s1)),
      s2 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e1 UNION ALL SELECT b FROM e1)
        GROUP BY 1 HAVING count(*) >= 3),
      e2 AS MATERIALIZED (SELECT a, b FROM e1 WHERE a IN (SELECT id FROM s2)
        AND b IN (SELECT id FROM s2)),
      s3 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e2 UNION ALL SELECT b FROM e2)
        GROUP BY 1 HAVING count(*) >= 3),
      e3 AS MATERIALIZED (SELECT a, b FROM e2 WHERE a IN (SELECT id FROM s3)
        AND b IN (SELECT id FROM s3)),
      s4 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e3 UNION ALL SELECT b FROM e3)
        GROUP BY 1 HAVING count(*) >= 3),
      e4 AS MATERIALIZED (SELECT a, b FROM e3 WHERE a IN (SELECT id FROM s4)
        AND b IN (SELECT id FROM s4)),
      s5 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e4 UNION ALL SELECT b FROM e4)
        GROUP BY 1 HAVING count(*) >= 3),
      e5 AS MATERIALIZED (SELECT a, b FROM e4 WHERE a IN (SELECT id FROM s5)
        AND b IN (SELECT id FROM s5)),
      s6 AS MATERIALIZED (SELECT id FROM (SELECT a AS id FROM e5 UNION ALL SELECT b FROM e5)
        GROUP BY 1 HAVING count(*) >= 3),
      e6 AS MATERIALIZED (SELECT a, b FROM e5 WHERE a IN (SELECT id FROM s6)
        AND b IN (SELECT id FROM s6))
      SELECT CAST(id AS BIGINT) AS id, count(*) AS deg FROM
        (SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6)
      GROUP BY 1 HAVING count(*) >= 3 ORDER BY id"""))

  /** Top-25 within-session event-type trigrams
    * ([[graft.operators.EventOps.sessionTrigrams]]): gap-based sessions
    * (q30's ≥-30-min convention), three-step journeys counted in one
    * user-keyed exchange — the lag/sum/lead windows all share one window
    * spec, and look-aheads carry the session id so no (user, session)
    * re-shuffle exists. Count space is bounded |event types|³. */
  private[graft] val q132 = QuerySpec(
    "q132_session_trigrams",
    (s, dir) => graft.operators.EventOps.sessionTrigrams(
        t(s, dir, "events"), "user_id", gapSec = 1800, topK = 25)
      .orderBy("rnk"),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
        event_type FROM events),
      marked AS (SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
            OR ts - lag(ts) OVER w >= 1800000000000 THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      grp AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM marked),
      tri AS (SELECT event_type, sid,
          lead(event_type, 1) OVER w2 AS t1, lead(event_type, 2) OVER w2 AS t2,
          lead(sid, 1) OVER w2 AS s1, lead(sid, 2) OVER w2 AS s2
        FROM grp WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
      c AS (SELECT event_type || ' ' || t1 || ' ' || t2 AS trigram,
          count(*) AS n FROM tri WHERE s1 = sid AND s2 = sid GROUP BY 1),
      ranked AS (SELECT trigram, n,
          row_number() OVER (ORDER BY n DESC, trigram) AS rnk FROM c)
      SELECT trigram, n, rnk FROM ranked WHERE rnk <= 25 ORDER BY rnk"""))

  /** Exponentially-decayed activity score
    * ([[graft.operators.EventOps.decayScore]]): per-user halving-weighted
    * sum of the trailing-24 event values at each user's latest event. α=1/2
    * over a bounded window makes every weight a power of two, so the score
    * is ONE exact long in both engines — no float decay products. */
  private[graft] val q133 = QuerySpec(
    "q133_decay_score",
    (s, dir) => graft.operators.EventOps.decayScore(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"), "value",
        window = 24)
      .orderBy("user_id"),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, value
        FROM events),
      r AS (SELECT user_id, value, row_number() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn FROM e),
      s AS (SELECT user_id, count(*) AS n_recent,
          CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
            * (CAST(1 AS BIGINT) << (24 - rn))) AS BIGINT) AS units
        FROM r WHERE rn <= 24 GROUP BY 1)
      SELECT user_id, n_recent,
        CAST((units + 41943040000) // 83886080000 AS DOUBLE) / 100.0
          AS decay_value
      FROM s ORDER BY user_id"""))

  /** Position-based (U-shaped 40/20/40) attribution
    * ([[graft.operators.EventOps.positionAttribution]]): first-seen and
    * last-seen channels take 40% each, distinct middles split 20%; the
    * no-middle fold-back makes 2-channel journeys 50/50 and single-channel
    * 100%. Same window-frame no-join-back shape as q119/q122; the oracle
    * necessarily joins conversions to prior touches. Weights hardcoded for
    * lcm(1..3)=6: 40%→12, both-ends→24, fold-backs +3/+6, middles 6/m,
    * direct 30, all in micro·30 units. */
  private[graft] val q134 = QuerySpec(
    "q134_position_attribution",
    (s, dir) => graft.operators.EventOps.positionAttribution(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"),
        "event_type", "value", Seq("click", "view", "signup"), "purchase")
      .orderBy("channel"),
    Some("""WITH conv AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, value
        FROM events WHERE event_type = 'purchase'),
      tch AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
        FROM events WHERE event_type IN ('click', 'view', 'signup')),
      pri AS (SELECT c.user_id, c.event_id AS conv_id, c.value,
          t.event_type AS channel, t.ts, t.event_id AS tid
        FROM conv c JOIN tch t ON t.user_id = c.user_id
          AND (t.ts, t.event_id) < (c.ts, c.event_id)),
      ranked AS (SELECT conv_id, value, channel,
          row_number() OVER (PARTITION BY conv_id ORDER BY ts, tid) AS rn_a,
          row_number() OVER (PARTITION BY conv_id
            ORDER BY ts DESC, tid DESC) AS rn_d
        FROM pri),
      fl AS (SELECT conv_id,
          max(CASE WHEN rn_a = 1 THEN channel END) AS f,
          max(CASE WHEN rn_d = 1 THEN channel END) AS l
        FROM ranked GROUP BY 1),
      chs AS (SELECT DISTINCT conv_id, value, channel FROM pri),
      sized AS (SELECT s.conv_id, s.value, s.channel, fl.f, fl.l,
          sum(CASE WHEN s.channel <> fl.f AND s.channel <> fl.l
            THEN 1 ELSE 0 END) OVER (PARTITION BY s.conv_id) AS m
        FROM chs s JOIN fl ON fl.conv_id = s.conv_id),
      credit AS (SELECT channel, value,
          CASE WHEN channel = f AND channel = l
                 THEN 24 + CASE WHEN m = 0 THEN 6 ELSE 0 END
               WHEN channel = f OR channel = l
                 THEN 12 + CASE WHEN m = 0 THEN 3 ELSE 0 END
               ELSE 6 // m END AS wgt
        FROM sized
        UNION ALL
        SELECT 'direct', c.value, 30 FROM conv c
        WHERE NOT EXISTS (SELECT 1 FROM tch t WHERE t.user_id = c.user_id
          AND (t.ts, t.event_id) < (c.ts, c.event_id)))
      SELECT channel, count(*) AS n_conversions,
        CAST(floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
            * wgt) + 150000 AS DOUBLE) / 300000.0) AS DOUBLE) / 100.0
          AS attributed_value
      FROM credit GROUP BY 1 ORDER BY 1"""))

  /** Common-neighbor link prediction over the q130 co-purchase graph
    * ([[graft.operators.Components.linkPrediction]]): top-50 non-adjacent
    * part pairs by shared-neighbor count, with true degrees (Jaccard
    * numerator/denominator as exact integers). Wedge centers above the
    * degree cap generate no candidates — the hub cull both engines apply
    * identically. */
  private[graft] val q135 = QuerySpec(
    "q135_link_prediction",
    (s, dir) => {
      val items = t(s, dir, "lineitem").where(col("l_quantity") >= 40)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
      graft.operators.Components.linkPrediction(pairs, "a", "b",
          topK = 50, maxCenterDegree = 1024)
        .orderBy("rnk")
    },
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= 40),
      canon AS (SELECT DISTINCT least(i.p, j.p) AS a, greatest(i.p, j.p) AS b
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p),
      adj AS (SELECT a AS z, b AS x FROM canon
        UNION ALL SELECT b, a FROM canon),
      deg AS (SELECT z AS id, count(*) AS deg FROM adj GROUP BY 1),
      culled AS (SELECT z, x FROM adj
        WHERE z IN (SELECT id FROM deg WHERE deg <= 1024)),
      cand AS (SELECT i.x AS u, j.x AS v, count(*) AS cn
        FROM culled i JOIN culled j ON i.z = j.z AND i.x < j.x
        GROUP BY 1, 2),
      open AS (SELECT * FROM cand WHERE NOT EXISTS
        (SELECT 1 FROM canon WHERE canon.a = cand.u AND canon.b = cand.v)),
      ranked AS (SELECT u, v, cn, du.deg AS deg_u, dv.deg AS deg_v,
          row_number() OVER (ORDER BY cn DESC, u, v) AS rnk
        FROM open JOIN deg du ON du.id = open.u
          JOIN deg dv ON dv.id = open.v)
      SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, cn,
        deg_u, deg_v, rnk
      FROM ranked WHERE rnk <= 50 ORDER BY rnk"""))

  /** Peak concurrent sessions per day
    * ([[graft.operators.EventOps.peakConcurrency]]): sweep-line over
    * session start/end deltas instead of the quadratic interval self-join.
    * The Spark side is a DISTRIBUTED prefix scan (in-day windows parallel
    * across day partitions + a bounded |days|-row cross-day carry); the
    * oracle is the textbook single ordered sweep — value-identical because
    * the carry is constant within a day. */
  private[graft] val q136 = QuerySpec(
    "q136_peak_concurrency",
    (s, dir) => graft.operators.EventOps.peakConcurrency(
        t(s, dir, "events"), "user_id", gapSec = 1800)
      .orderBy("day"),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id
        FROM events),
      marked AS (SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
            OR ts - lag(ts) OVER w >= 1800000000000 THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      grp AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM marked),
      sess AS (SELECT user_id, sid, min(ts) AS s_ts, max(ts) AS e_ts
        FROM grp GROUP BY 1, 2),
      deltas AS (SELECT s_ts AS ts, 1 AS d FROM sess
        UNION ALL SELECT e_ts, -1 FROM sess),
      swept AS (SELECT ts // 86400000000000 AS day, d,
          CAST(sum(d) OVER (ORDER BY ts, d DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS conc
        FROM deltas)
      SELECT day, CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_starts,
        CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
        max(conc) AS max_concurrent
      FROM swept GROUP BY day ORDER BY day"""))

  /** Hybrid retrieval by reciprocal-rank fusion
    * ([[graft.operators.Retrieval.rrfFuse]]): BM25 top-100 (q88's exact
    * integer-micro scoring) ⊕ coordinate-match top-100 (distinct-term
    * count, shorter docs first — all integers), fused as
    * Σ 1e6 div (60 + rank). Every rank and every fused score is exact
    * integer arithmetic, so the hybrid list is bit-identical across
    * engines; the fusion stages run over O(lists·100) rows, never the
    * corpus. */
  private[graft] val q137 = {
    val terms = Seq("hash", "stream", "vector", "big")
    val termList = terms.map(p => s"'$p'").mkString("(", ",", ")")
    QuerySpec(
      "q137_rrf_hybrid",
      (s, dir) => {
        import graft.operators.Retrieval
        val docs = t(s, dir, "documents")
        val wTop = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
        val bm = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 100)
          .withColumn("rank", row_number().over(
            wTop.orderBy(col("score_micro").desc, col("id"))))
          .select("id", "rank")
        val coord = Retrieval
          .coordinateTopK(docs, "doc_id", "text", terms, k = 100)
          .select("id", "rank")
        Retrieval.rrfFuse(Seq(bm, coord), k = 20)
          .withColumnRenamed("id", "doc_id")
          .orderBy("rnk")
      },
      Some(s"""WITH docs AS (SELECT doc_id,
          len(str_split(text, ' ')) AS dl, str_split(text, ' ') AS toks
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
        tf AS (SELECT doc_id, any_value(dl) AS dl, tok, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM docs)
          WHERE tok IN $termList GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        term_scores AS (SELECT doc_id,
            CAST(round(ln(((n_docs - df) + 0.5) / (df + 0.5) + 1.0) *
              ((tf * (1.2 + 1.0)) /
               (tf + 1.2 * (1.0 - 0.75 + 0.75 *
                 (CAST(dl AS DOUBLE) / avgdl)))) * 1000000.0, 0) AS BIGINT)
              AS micro
          FROM tf JOIN dfreq USING (tok) CROSS JOIN stats),
        bm_scores AS (SELECT doc_id, sum(micro) AS score_micro
          FROM term_scores GROUP BY 1),
        bm_ranked AS (SELECT doc_id, row_number()
            OVER (ORDER BY score_micro DESC, doc_id) AS rank FROM bm_scores),
        coord AS (SELECT doc_id, count(*) AS n_match, any_value(dl) AS dl
          FROM tf GROUP BY 1),
        coord_ranked AS (SELECT doc_id, row_number()
            OVER (ORDER BY n_match DESC, dl, doc_id) AS rank FROM coord),
        fused AS (SELECT doc_id, 1000000 // (60 + rank) AS micro
            FROM bm_ranked WHERE rank <= 100
          UNION ALL
          SELECT doc_id, 1000000 // (60 + rank) FROM coord_ranked
            WHERE rank <= 100),
        agg AS (SELECT doc_id, CAST(sum(micro) AS BIGINT) AS rrf_micro,
            CAST(count(*) AS BIGINT) AS n_lists FROM fused GROUP BY 1),
        final AS (SELECT doc_id, rrf_micro, n_lists, row_number()
            OVER (ORDER BY rrf_micro DESC, doc_id) AS rnk FROM agg)
        SELECT doc_id, rrf_micro, n_lists, rnk FROM final
        WHERE rnk <= 20 ORDER BY rnk"""))
  }

  /** Market-basket association rules
    * ([[graft.operators.Association.pairRules]]): top-50 part pairs by
    * lift over order baskets, support/confidence/lift all as integer
    * division of integer products — no float ratio ever forms, so both
    * engines emit identical micro values. */
  private[graft] val q138 = QuerySpec(
    "q138_association_rules",
    (s, dir) => graft.operators.Association.pairRules(
        t(s, dir, "lineitem").where(col("l_quantity") >= 30)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
        "o", "p", minSupport = 2, topK = 50)
      .orderBy("rnk"),
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= 30),
      n AS (SELECT count(DISTINCT o) AS n_baskets FROM items),
      supp AS (SELECT p, count(*) AS s FROM items GROUP BY 1),
      pairs AS (SELECT i.p AS a, j.p AS b, count(*) AS s_ab
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      scored AS (SELECT a, b, s_ab, sa.s AS s_a, sb.s AS s_b,
          (1000000 * s_ab) // sa.s AS conf_ab_micro,
          (1000000 * s_ab) // sb.s AS conf_ba_micro,
          (1000000 * s_ab * n.n_baskets) // (sa.s * sb.s) AS lift_micro
        FROM pairs JOIN supp sa ON sa.p = pairs.a
          JOIN supp sb ON sb.p = pairs.b CROSS JOIN n),
      ranked AS (SELECT *, row_number()
          OVER (ORDER BY lift_micro DESC, a, b) AS rnk FROM scored)
      SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, s_ab,
        s_a, s_b, CAST(conf_ab_micro AS BIGINT) AS conf_ab_micro,
        CAST(conf_ba_micro AS BIGINT) AS conf_ba_micro,
        CAST(lift_micro AS BIGINT) AS lift_micro, rnk
      FROM ranked WHERE rnk <= 50 ORDER BY rnk"""))

  /** RFM customer segmentation ([[graft.operators.EventOps.rfmScores]]):
    * threshold-quintile scores off exact percentile boundaries (the
    * scalable form — boundaries are one broadcast row, scoring a CASE; no
    * global rank sort). Boundary arithmetic rides the q48 percentile ≡
    * quantile_cont contract. */
  private[graft] val q139 = QuerySpec(
    "q139_rfm_scores",
    (s, dir) => graft.operators.EventOps.rfmScores(
        t(s, dir, "events"), "user_id", "event_type", "value", "purchase")
      .orderBy("user_id"),
    Some("""WITH per AS (SELECT user_id,
          CAST(max(epoch_ns(ts)) AS DOUBLE) AS r_ts,
          count(*) AS n_conv,
          CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
            AS BIGINT) AS m_micro
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      b AS (SELECT
          quantile_cont(r_ts, [0.2, 0.4, 0.6, 0.8]) AS rb,
          quantile_cont(CAST(n_conv AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fb,
          quantile_cont(CAST(m_micro AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS mb
        FROM per),
      scored AS (SELECT user_id, n_conv,
          CAST(1 + (CASE WHEN r_ts > rb[1] THEN 1 ELSE 0 END)
            + (CASE WHEN r_ts > rb[2] THEN 1 ELSE 0 END)
            + (CASE WHEN r_ts > rb[3] THEN 1 ELSE 0 END)
            + (CASE WHEN r_ts > rb[4] THEN 1 ELSE 0 END) AS BIGINT)
            AS r_score,
          CAST(1 + (CASE WHEN n_conv > fb[1] THEN 1 ELSE 0 END)
            + (CASE WHEN n_conv > fb[2] THEN 1 ELSE 0 END)
            + (CASE WHEN n_conv > fb[3] THEN 1 ELSE 0 END)
            + (CASE WHEN n_conv > fb[4] THEN 1 ELSE 0 END) AS BIGINT)
            AS f_score,
          CAST(1 + (CASE WHEN m_micro > mb[1] THEN 1 ELSE 0 END)
            + (CASE WHEN m_micro > mb[2] THEN 1 ELSE 0 END)
            + (CASE WHEN m_micro > mb[3] THEN 1 ELSE 0 END)
            + (CASE WHEN m_micro > mb[4] THEN 1 ELSE 0 END) AS BIGINT)
            AS m_score
        FROM per CROSS JOIN b)
      SELECT user_id, n_conv, r_score, f_score, m_score,
        r_score * 100 + f_score * 10 + m_score AS rfm_cell
      FROM scored ORDER BY user_id"""))

  /** Incremental connected-components maintenance
    * ([[graft.operators.Components.connectedComponentsIncremental]]):
    * standing labels built from 80% of the co-purchase edges, the
    * remaining 20% absorbed as a batch — touched components re-close via
    * per-member star edges, untouched ones anti-join through. The oracle
    * is the FULL recursive closure over all edges: incremental ≡ recompute
    * is exactly the operator's contract. */
  private[graft] val q140 = QuerySpec(
    "q140_incremental_components",
    (s, dir) => {
      import graft.operators.Components
      val items = t(s, dir, "lineitem").where(col("l_quantity") >= 35)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
      val old = pairs.where((col("a") + col("b")) % 5 =!= 0)
      val batch = pairs.where((col("a") + col("b")) % 5 === 0)
      val standing = Components.connectedComponents(old, "a", "b")
      Components.connectedComponentsIncremental(standing, batch, "a", "b")
        .orderBy("id")
    },
    Some("""WITH RECURSIVE items AS (SELECT DISTINCT l_orderkey AS o,
        l_partkey AS p FROM lineitem WHERE l_quantity >= 35),
      canon AS (SELECT DISTINCT least(i.p, j.p) AS a, greatest(i.p, j.p) AS b
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p),
      und AS (SELECT a, b FROM canon UNION SELECT b, a FROM canon),
      walk(id, comp) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.a, w.comp FROM und u JOIN walk w ON w.id = u.b)
      SELECT CAST(id AS BIGINT) AS id, CAST(min(comp) AS BIGINT) AS comp
      FROM walk GROUP BY 1 ORDER BY 1"""))

  /** Numeric column profiling ([[graft.operators.DataChecks.numericProfile]]):
    * equal-width histograms per column off the column's own min/max — one
    * unpivot, one broadcast stats row, one bounded aggregate. Bin
    * arithmetic mirrored token-for-token so boundary doubles land in the
    * same bucket in both engines. */
  private[graft] val q141 = QuerySpec(
    "q141_numeric_profile",
    (s, dir) => graft.operators.DataChecks.numericProfile(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"), bins = 10)
      .orderBy("col_name", "bin"),
    Some("""WITH x AS (
        SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS x
          FROM lineitem
        UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
          FROM lineitem
        UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE)
          FROM lineitem),
      st AS (SELECT col_name, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
      b AS (SELECT x.col_name,
          CASE WHEN x IS NULL THEN -1
               WHEN mx = mn THEN 0
               ELSE least(CAST(floor(((x - mn) * 10) / (mx - mn)) AS BIGINT),
                 9) END AS bin
        FROM x JOIN st USING (col_name))
      SELECT col_name, CAST(bin AS BIGINT) AS bin, count(*) AS n_rows
      FROM b GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** SCD2 temporal enrichment — facts joined to the dimension VERSION
    * valid at event time, composed from [[graft.operators.Incremental.scd2]]
    * (the version intervals) and [[graft.operators.AsofJoin.backward]]
    * (valid_from is the as-of key; intervals tile, so at-or-before the
    * start IS containment — no interval join, no range explosion). The
    * every-warehouse query "which dimension version did this fact see":
    * purchases enriched with the user's click/view/signup regime. */
  private[graft] val q142 = QuerySpec(
    "q142_scd2_enrich",
    (s, dir) => {
      import graft.operators.{AsofJoin, Incremental}
      val ev = t(s, dir, "events")
      val dim = Incremental.scd2(
        ev.where(col("event_type").isin("click", "view", "signup"))
          .select("user_id", "ts", "event_id", "event_type"),
        "user_id", Seq("ts", "event_id"), "event_type")
      val facts = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      // Two regime changes sharing (user_id, ts) yield two versions with the
      // same valid_from; the earlier one's interval is empty ([T, T)), so only
      // the latest version per (user_id, valid_from) is ever visible. Collapse
      // to that version before the as-of join so backward's "right unique per
      // (keys, tsCol)" contract holds and the pick matches the oracle's
      // interval-containment semantics.
      val dimUnique = dim
        .groupBy(col("user_id"), col("valid_from"))
        .agg(max_by(
          struct(col("event_type"), col("version")), col("version")).as("s"))
        .select(col("user_id"), col("valid_from").as("ts"),
          col("s.event_type").as("regime"), col("s.version").as("version"))
      AsofJoin.backward(facts, dimUnique,
          Seq("user_id"), "ts", Seq("regime", "version"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("asof_regime").as("regime"),
          col("asof_version").as("version"))
        .orderBy("event_id")
    },
    Some("""WITH src AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
        event_type FROM events
        WHERE event_type IN ('click', 'view', 'signup')),
      o AS (SELECT user_id, ts, event_id, event_type,
          row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        FROM src WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      r AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
      v AS (SELECT user_id, event_type, ts AS valid_from,
          lead(ts) OVER w2 AS valid_to,
          CAST(row_number() OVER w2 AS INTEGER) AS version
        FROM r WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
      p AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, value FROM events
        WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.value,
        v.event_type AS regime, v.version
      FROM p LEFT JOIN v ON v.user_id = p.user_id
        AND v.valid_from <= p.ts
        AND (v.valid_to IS NULL OR p.ts < v.valid_to)
      ORDER BY p.event_id"""))

  /** A/B experiment lift: variant = parity of the k prop on each user's
    * FIRST event (deterministic assignment from the payload), conversion =
    * any purchase; per-variant user counts, converted counts, and exact
    * micro conversion rates (integer division), plus risk ratio vs
    * variant 0 as (1e6·conv·users₀) div (conv₀·users) — integer products
    * only, never a float rate ratio. */
  private[graft] val q143 = QuerySpec(
    "q143_experiment_lift",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val assigned = t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .withColumn("isconv",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(max(when(col("rn") === 1,
            get_json_object(col("props"), "$.k").cast("long") % 2))
            .as("variant"),
          max(col("isconv")).as("converted"))
      val per = assigned.groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val base = per.where(col("variant") === 0)
        .select(col("n_users").as("u0"), col("n_conv").as("c0"))
      per.crossJoin(broadcast(base))
        .select(col("variant"), col("n_users"), col("n_conv"),
          expr("(1000000L * n_conv) div n_users").as("rate_micro"),
          expr("(1000000L * n_conv * u0) div (c0 * n_users)")
            .as("risk_ratio_micro"))
        .orderBy(col("variant"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id,
        event_type, props FROM events),
      r AS (SELECT user_id, event_type, props,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS rn FROM e),
      assigned AS (SELECT user_id,
          max(CASE WHEN rn = 1 THEN
            CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 END)
            AS variant,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS converted
        FROM r GROUP BY 1),
      per AS (SELECT variant, count(*) AS n_users,
          CAST(sum(converted) AS BIGINT) AS n_conv
        FROM assigned GROUP BY 1),
      base AS (SELECT n_users AS u0, n_conv AS c0 FROM per WHERE variant = 0)
      SELECT variant, n_users, n_conv,
        CAST((1000000 * n_conv) // n_users AS BIGINT) AS rate_micro,
        CAST((1000000 * n_conv * u0) // (c0 * n_users) AS BIGINT)
          AS risk_ratio_micro
      FROM per CROSS JOIN base ORDER BY variant"""))

  /** Exact-integer OLS trend slopes per event type
    * ([[graft.operators.EventOps.dailyTrendSlopes]]): the rational slope
    * (num, den) as longs plus a double-rounded micro slope, mirrored
    * token-for-token. */
  private[graft] val q144 = QuerySpec(
    "q144_trend_slopes",
    (s, dir) => graft.operators.EventOps.dailyTrendSlopes(
        t(s, dir, "events"), "event_type")
      .orderBy("event_type"),
    Some("""WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000
          AS x, count(*) AS y
        FROM events GROUP BY 1, 2),
      agg AS (SELECT event_type, count(*) AS n_days,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * y) AS BIGINT) AS sxy,
          CAST(sum(x * x) AS BIGINT) AS sxx
        FROM d GROUP BY 1)
      SELECT event_type, n_days,
        CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
        CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
        CASE WHEN n_days * sxx - sx * sx <> 0 THEN
          CAST(floor((1000000.0 * (n_days * sxy - sx * sy))
            / (n_days * sxx - sx * sx) + 0.5) AS BIGINT) END AS slope_micro
      FROM agg ORDER BY event_type"""))

  /** k-anonymity audit
    * ([[graft.operators.DataChecks.kAnonymityViolations]]): customer
    * quasi-identifier classes (nation, market segment, acctbal sign)
    * smaller than k — the linkable-row report. */
  private[graft] val q145 = QuerySpec(
    "q145_k_anonymity",
    (s, dir) => graft.operators.DataChecks.kAnonymityViolations(
        t(s, dir, "customer")
          .withColumn("bal_sign", signum(col("c_acctbal")).cast("long")),
        Seq("c_nationkey", "c_mktsegment", "bal_sign"), k = 8)
      .orderBy("c_nationkey", "c_mktsegment", "bal_sign"),
    Some("""SELECT c_nationkey, c_mktsegment,
        CAST(sign(c_acctbal) AS BIGINT) AS bal_sign,
        count(*) AS class_size
      FROM customer GROUP BY 1, 2, 3 HAVING count(*) < 8
      ORDER BY 1, 2, 3"""))

  /** Distribution analytic windows (percent_rank / cume_dist / ntile) —
    * the rank-statistics companions to q39's ordered windows, partitioned
    * by nation so every window stays parallel (a global percent_rank is
    * the data-sized single partition the plan audit forbids; per-group is
    * the scalable form). Ordering key (acctbal, custkey) is unique, so the
    * rank doubles are identical across engines. */
  private[graft] val q146 = QuerySpec(
    "q146_distribution_windows",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      // floor(x·1e6 + 0.5), NOT round(x, 6): rank ratios land exactly on
      // 6dp halves (333/640 = 0.5203125) where Spark HALF_UPs the
      // shortest-decimal repr and DuckDB rounds the raw binary — floor
      // acts on the identical binary double in both engines (the q119
      // money-math rule applied to rank statistics)
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          (floor(percent_rank().over(w) * 1e6 + 0.5) / 1e6).as("pct_rank"),
          (floor(cume_dist().over(w) * 1e6 + 0.5) / 1e6).as("cume"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""SELECT c_nationkey, c_custkey,
        floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0
          AS pct_rank,
        floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      ORDER BY c_nationkey, c_custkey"""))

  /** Label-propagation communities
    * ([[graft.operators.Components.labelPropagation]]): 3 synchronous
    * rounds over the co-purchase graph — density grouping next to q43's
    * connectivity grouping. The oracle unrolls the rounds; argmax-count
    * with min-label ties is a row_number in SQL and a min-struct in
    * Spark — same total order. */
  private[graft] val q147 = QuerySpec(
    "q147_label_propagation",
    (s, dir) => {
      val items = t(s, dir, "lineitem").where(col("l_quantity") >= 35)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("a"), col("j.p").as("b"))
      graft.operators.Components.labelPropagation(pairs, "a", "b", rounds = 3)
        .orderBy("id")
    },
    Some("""WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity >= 35),
      canon AS (SELECT DISTINCT least(i.p, j.p) AS a, greatest(i.p, j.p) AS b
        FROM items i JOIN items j ON i.o = j.o AND i.p < j.p),
      und AS (SELECT a AS v, b AS x FROM canon
        UNION ALL SELECT b, a FROM canon),
      l0 AS (SELECT DISTINCT v AS id, v AS lbl FROM und),
      c1 AS (SELECT u.v, l.lbl, count(*) AS c FROM und u
        JOIN l0 l ON l.id = u.x GROUP BY 1, 2),
      l1 AS (SELECT v AS id, lbl FROM (SELECT v, lbl, row_number()
          OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn FROM c1)
        WHERE rn = 1),
      c2 AS (SELECT u.v, l.lbl, count(*) AS c FROM und u
        JOIN l1 l ON l.id = u.x GROUP BY 1, 2),
      l2 AS (SELECT v AS id, lbl FROM (SELECT v, lbl, row_number()
          OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn FROM c2)
        WHERE rn = 1),
      c3 AS (SELECT u.v, l.lbl, count(*) AS c FROM und u
        JOIN l2 l ON l.id = u.x GROUP BY 1, 2),
      l3 AS (SELECT v AS id, lbl FROM (SELECT v, lbl, row_number()
          OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn FROM c3)
        WHERE rn = 1)
      SELECT CAST(id AS BIGINT) AS id, CAST(lbl AS BIGINT) AS lbl
      FROM l3 ORDER BY id"""))

  /** Hashing-trick features ([[graft.operators.TextAnalysis.hashedFeatures]])
    * summarized per bucket: collision load and total mass per feature
    * index over the corpus (the featurizer's health check — a skewed
    * bucket histogram means a bad dim). Row-level features are
    * doc×min(tokens, dim) — the per-bucket rollup keeps the oracle
    * output bounded while pinning every hash and weight. */
  private[graft] val q148 = QuerySpec(
    "q148_hashed_features",
    (s, dir) => graft.operators.TextAnalysis.hashedFeatures(
        t(s, dir, "documents"), "doc_id", "text", dim = 64)
      .groupBy(col("feature_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("total_weight"))
      .orderBy("feature_idx"),
    Some("""WITH tf AS (SELECT doc_id, tok, count(*) AS tf
        FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
          FROM documents)
        WHERE tok <> '' GROUP BY 1, 2),
      feat AS (SELECT doc_id,
          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 + 64) % 64
            AS feature_idx,
          CAST(sum(tf) AS BIGINT) AS weight
        FROM tf GROUP BY 1, 2)
      SELECT feature_idx, count(*) AS n_docs,
        CAST(sum(weight) AS BIGINT) AS total_weight
      FROM feat GROUP BY 1 ORDER BY 1"""))

  /** Bot-signature candidates ([[graft.operators.EventOps.botCandidates]]):
    * machine-regular users by exact-integer cv² cross-multiplication —
    * behavioral-corpus hygiene. The synthetic events are human-bursty, so
    * the cv gate is loosened to surface the most regular tail
    * deterministically. */
  private[graft] val q149 = QuerySpec(
    "q149_bot_candidates",
    (s, dir) => graft.operators.EventOps.botCandidates(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"),
        minEvents = 10, cvNum = 4, cvDen = 5)
      .orderBy("user_id"),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id
        FROM events),
      g AS (SELECT user_id,
          (ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            // 1000000000 AS gap_s
        FROM e),
      agg AS (SELECT user_id, count(*) AS n_gaps,
          CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
          CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
        FROM g WHERE gap_s IS NOT NULL GROUP BY 1),
      v AS (SELECT user_id, n_gaps, sum_gap_s,
          n_gaps * sum_gap_sq - sum_gap_s * sum_gap_s AS var_num
        FROM agg WHERE n_gaps >= 9 AND sum_gap_s > 0)
      SELECT user_id, n_gaps, sum_gap_s, var_num
      FROM v WHERE var_num * 5 <= sum_gap_s * sum_gap_s * 4
      ORDER BY user_id"""))

  /** Dedup landscape report: near-dup cluster-SIZE histogram over the q57
    * closure plus the singleton row — the "how duplicated is this corpus"
    * summary that sizes dedup's payoff before running it (n_docs −
    * Σ n_clusters = rows dedup would remove). Cluster work is id-only;
    * the singleton count is corpus-total minus clustered, two 1-row
    * aggregates. */
  private[graft] val q150 = QuerySpec(
    "q150_dedup_landscape",
    (s, dir) => {
      import graft.operators.Components
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        .where(col("est_jaccard") >= 0.5)
      val comp = graft.core.CacheScope.persist(
        Components.connectedComponents(edges, "id_a", "id_b"))
      val hist = comp.groupBy("comp")
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum("cluster_size").as("n_docs"))
      val totals = docs.agg(count(lit(1)).as("n_total"))
        .crossJoin(broadcast(comp.agg(count(lit(1)).as("n_clustered"))))
      val singletons = totals.select(
        lit(1L).as("cluster_size"),
        (col("n_total") - col("n_clustered")).as("n_clusters"),
        (col("n_total") - col("n_clustered")).as("n_docs"))
      singletons.unionByName(hist).orderBy("cluster_size")
    },
    Some(s"""WITH RECURSIVE ${minhashCtes(numHashes = 32, bands = 16)},
      close_pairs AS (SELECT id_a, id_b FROM cand WHERE est_jaccard >= 0.5),
      und AS (SELECT id_a AS a, id_b AS b FROM close_pairs
        UNION SELECT id_b, id_a FROM close_pairs),
      walk(id, comp) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.a, w.comp FROM und u JOIN walk w ON w.id = u.b),
      membership AS (SELECT id, min(comp) AS component FROM walk GROUP BY 1),
      sizes AS (SELECT component, count(*) AS cluster_size FROM membership
        GROUP BY 1),
      hist AS (SELECT cluster_size, count(*) AS n_clusters,
          CAST(sum(cluster_size) AS BIGINT) AS n_docs
        FROM sizes GROUP BY 1),
      singles AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
          (SELECT count(*) FROM documents)
            - (SELECT count(*) FROM membership) AS n_clusters,
          (SELECT count(*) FROM documents)
            - (SELECT count(*) FROM membership) AS n_docs)
      SELECT cluster_size, n_clusters, n_docs FROM singles
      UNION ALL SELECT cluster_size, n_clusters, n_docs FROM hist
      ORDER BY cluster_size"""))

  /** Cohort LTV curves ([[graft.operators.EventOps.cohortLtv]]): the
    * revenue companion to q116's retention cohorts — per (cohort_day,
    * offset) purchase revenue and the running cumulative, micro-exact with
    * cents conversion once per output row. */
}
