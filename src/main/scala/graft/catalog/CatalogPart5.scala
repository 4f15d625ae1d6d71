package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** Catalog part: q151-q182: NVS pipeline rows, ANN/PQ, trust & eval.
  *
  * Split from the single QueryCatalog file for size; specs stay
  * package-private and the ordered aggregation lives in
  * [[QueryCatalog.all]]. */
private[graft] trait CatalogPart5 extends CatalogPart4 {

  private[graft] val q151 = QuerySpec(
    "q151_cohort_ltv",
    (s, dir) => graft.operators.EventOps.cohortLtv(
        t(s, dir, "events"), "user_id", "event_type", "value", "purchase")
      .orderBy("cohort_day", "day_offset"),
    Some("""WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS d,
        event_type, value FROM events),
      fd AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY 1),
      cells AS (SELECT fd.cohort_day, e.d - fd.cohort_day AS day_offset,
          count(*) AS n_purchases,
          CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
            AS cell_micro
        FROM e JOIN fd ON fd.user_id = e.user_id
        WHERE event_type = 'purchase' GROUP BY 1, 2),
      cum AS (SELECT cohort_day, day_offset, n_purchases, cell_micro,
          CAST(sum(cell_micro) OVER (PARTITION BY cohort_day
            ORDER BY day_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS cum_micro
        FROM cells)
      SELECT cohort_day, day_offset, n_purchases,
        CAST(floor(CAST(cell_micro + 5000 AS DOUBLE) / 10000.0) AS DOUBLE)
          / 100.0 AS revenue,
        CAST(floor(CAST(cum_micro + 5000 AS DOUBLE) / 10000.0) AS DOUBLE)
          / 100.0 AS cum_revenue
      FROM cum ORDER BY cohort_day, day_offset"""))

  /** Shipping-lag distribution per order priority: exact interpolated
    * percentiles of (l_shipdate − o_orderdate) in days — the fulfillment
    * SLA view over the relational side (q48's percentile ≡ quantile_cont
    * contract; datediff is exact integer days in both engines). */
  /** q152's post-join body, shared with the bucketed-layout twin (q212):
    * one aggregation path so the two variants can never drift. */
  private[graft] def shippingLagAgg(orders: DataFrame,
      lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_d"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("lag_d")).as("min_lag"),
        expr("percentile(lag_d, array(0.5D, 0.9D, 0.99D))").as("p"),
        max(col("lag_d")).as("max_lag"))
      .select(col("o_orderpriority"), col("n_lines"), col("min_lag"),
        element_at(col("p"), 1).as("p50"),
        element_at(col("p"), 2).as("p90"),
        element_at(col("p"), 3).as("p99"),
        col("max_lag"))
      .orderBy("o_orderpriority")

  private[graft] val shippingLagOracle: String =
    """SELECT o_orderpriority, count(*) AS n_lines,
        CAST(min(datediff('day', o_orderdate, l_shipdate)) AS BIGINT)
          AS min_lag,
        quantile_cont(CAST(datediff('day', o_orderdate, l_shipdate)
          AS DOUBLE), 0.5) AS p50,
        quantile_cont(CAST(datediff('day', o_orderdate, l_shipdate)
          AS DOUBLE), 0.9) AS p90,
        quantile_cont(CAST(datediff('day', o_orderdate, l_shipdate)
          AS DOUBLE), 0.99) AS p99,
        CAST(max(datediff('day', o_orderdate, l_shipdate)) AS BIGINT)
          AS max_lag
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY 1"""

  private[graft] val q152 = QuerySpec(
    "q152_shipping_lag",
    (s, dir) => shippingLagAgg(t(s, dir, "orders"), t(s, dir, "lineitem")),
    Some(shippingLagOracle))

  /** Per-nation ABC (Pareto) customer classes: rank customers by revenue
    * within their nation, class A = the head covering ≤ 70% of nation
    * revenue, B to ≤ 90%, C the tail — cumulative shares tested by exact
    * integer cross-multiplication of micro sums (no float share forms).
    * Partitioned windows keep the rank parallel per nation. */
  private[graft] val q153 = QuerySpec(
    "q153_abc_classes",
    (s, dir) => {
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      val cust = t(s, dir, "customer")
        .join(rev, col("c_custkey") === col("o_custkey"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_nationkey"))
        .orderBy(col("cents").desc, col("c_custkey"))
      val cum = cust
        .withColumn("cum_cents", sum(col("cents")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .withColumn("nation_cents", sum(col("cents")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("c_nationkey"))))
      cum.select(col("c_nationkey"), col("c_custkey"), col("cents"),
          when(col("cum_cents") * 100 <= col("nation_cents") * 70, "A")
            .when(col("cum_cents") * 100 <= col("nation_cents") * 90, "B")
            .otherwise("C").as("abc"))
        .orderBy("c_nationkey", "c_custkey")
    },
    Some("""WITH rev AS (SELECT o_custkey, CAST(sum(CAST(floor(
          o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      cust AS (SELECT c_nationkey, c_custkey, cents
        FROM customer JOIN rev ON o_custkey = c_custkey),
      cum AS (SELECT c_nationkey, c_custkey, cents,
          CAST(sum(cents) OVER (PARTITION BY c_nationkey
            ORDER BY cents DESC, c_custkey ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cents,
          CAST(sum(cents) OVER (PARTITION BY c_nationkey) AS BIGINT)
            AS nation_cents
        FROM cust)
      SELECT c_nationkey, c_custkey, cents,
        CASE WHEN cum_cents * 100 <= nation_cents * 70 THEN 'A'
             WHEN cum_cents * 100 <= nation_cents * 90 THEN 'B'
             ELSE 'C' END AS abc
      FROM cum ORDER BY c_nationkey, c_custkey"""))

  /** Seasonality grid: events per (day-of-week, hour) with per-cell value
    * totals — the traffic-shape heatmap (epoch-day arithmetic keeps dow
    * engine-portable: 1970-01-01 was a Thursday, dow = (epoch_day + 4)
    * mod 7 with 0 = Sunday, no locale-dependent date function). */
  private[graft] val q154 = QuerySpec(
    "q154_seasonality_grid",
    (s, dir) => t(s, dir, "events")
      .select(
        expr("pmod(ts div 86400000000000L + 4, 7)").as("dow"),
        expr("(ts div 3600000000000L) % 24").as("hour"),
        col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        (floor((sum(floor(col("value") * 1e6 + 0.5).cast("long")) +
            lit(5000L)).cast("double") / 10000.0).cast("double") / 100.0)
          .as("total_value"))
      .orderBy("dow", "hour"),
    Some("""SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
        (epoch_ns(ts) // 3600000000000) % 24 AS hour,
        count(*) AS n_events,
        CAST(floor(CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
          + 5000 AS DOUBLE) / 10000.0) AS DOUBLE) / 100.0 AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Growth accounting: per day, the classic active-user decomposition —
    * new (first-ever day), retained (also active the previous day),
    * resurrected (a gap before today), plus how many of today's actives
    * churn (no activity tomorrow). One user-keyed lag/lead window over the
    * per-user distinct-day table, then a bounded |days| aggregate. */
  private[graft] val q155 = QuerySpec(
    "q155_growth_accounting",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
      t(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000L").as("d"))
        .distinct()
        .withColumn("prev_d", lag(col("d"), 1).over(w))
        .withColumn("next_d", lead(col("d"), 1).over(w))
        .groupBy(col("d").as("day"))
        .agg(
          sum(when(col("prev_d").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(col("prev_d") === col("d") - 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("prev_d").isNotNull && col("prev_d") < col("d") - 1,
            1L).otherwise(0L)).as("n_resurrected"),
          sum(when(col("next_d").isNull || col("next_d") > col("d") + 1,
            1L).otherwise(0L)).as("n_churning"))
        .orderBy("day")
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
        epoch_ns(ts) // 86400000000000 AS d FROM events),
      lagged AS (SELECT user_id, d,
          lag(d) OVER w AS prev_d, lead(d) OVER w AS next_d
        FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY d))
      SELECT d AS day,
        CAST(sum(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(sum(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retained,
        CAST(sum(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1
          THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        CAST(sum(CASE WHEN next_d IS NULL OR next_d > d + 1
          THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
      FROM lagged GROUP BY 1 ORDER BY 1"""))

  /** MinHash estimator calibration: per est-jaccard decile bucket, the
    * candidate count and the exact-vs-estimated error — the self-audit
    * that tells you whether 16-band/32-hash signatures are trustworthy on
    * THIS corpus before you dedup with them. True jaccard is computed only
    * for candidate pairs (shingle-set intersection via the hashed index —
    * bounded by candidates, never all-pairs); est = k/32 is dyadic so its
    * micro form is exact in both engines; errors are integer micro sums.
    * Band-collision pairs with zero true overlap stay in (left join,
    * coalesce 0) — they are exactly what calibration must expose. */
  private[graft] val q156 = QuerySpec(
    "q156_minhash_calibration",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16)
      val sh = graft.core.CacheScope.persist(
        docs.select(col("doc_id").as("id"),
          explode(graft.functions.ShingleHashes(col("text"), 3)).as("sh"))
          .distinct())
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
      val shared = cand.select("id_a", "id_b")
        .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      cand
        .join(shared, Seq("id_a", "id_b"), "left")
        .withColumn("shared", coalesce(col("shared"), lit(0L)))
        .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
        .withColumn("true_micro",
          expr("(1000000L * shared) div (na + nb - shared)"))
        .withColumn("est_micro",
          floor(col("est_jaccard") * 1e6 + 0.5).cast("long"))
        .groupBy(expr("est_micro div 100000").as("est_decile"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("true_micro")).as("sum_true_micro"),
          sum(abs(col("est_micro") - col("true_micro")))
            .as("sum_abs_err_micro"))
        .withColumn("mean_abs_err_micro",
          expr("sum_abs_err_micro div n_pairs"))
        .orderBy("est_decile")
    },
    Some(s"""WITH ${minhashCtes(numHashes = 32, bands = 16)},
      sets AS (SELECT doc_id, list_distinct(hh) AS hs FROM hs),
      scored AS (SELECT c.id_a, c.id_b, c.est_jaccard,
          len(list_intersect(a.hs, b.hs)) AS shared,
          len(a.hs) AS na, len(b.hs) AS nb
        FROM cand c JOIN sets a ON a.doc_id = c.id_a
          JOIN sets b ON b.doc_id = c.id_b),
      m AS (SELECT
          CAST(floor(est_jaccard * 1000000.0 + 0.5) AS BIGINT) AS est_micro,
          (1000000 * shared) // (na + nb - shared) AS true_micro
        FROM scored),
      agg AS (SELECT est_micro // 100000 AS est_decile,
          count(*) AS n_pairs,
          CAST(sum(true_micro) AS BIGINT) AS sum_true_micro,
          CAST(sum(abs(est_micro - true_micro)) AS BIGINT)
            AS sum_abs_err_micro
        FROM m GROUP BY 1)
      SELECT CAST(est_decile AS BIGINT) AS est_decile, n_pairs,
        sum_true_micro, sum_abs_err_micro,
        CAST(sum_abs_err_micro // n_pairs AS BIGINT) AS mean_abs_err_micro
      FROM agg ORDER BY est_decile"""))

  /** Dead-stock report: per part, days since last shipment relative to
    * the corpus's latest ship date (1-row broadcast anchor), including
    * never-shipped parts (left join, NULL staleness) — the slow-mover /
    * dead-SKU audit. Top-100 stalest with never-shipped first. */
  private[graft] val q157 = QuerySpec(
    "q157_dead_stock",
    (s, dir) => {
      val lastShip = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(max(col("l_shipdate")).as("last_ship"),
          count(lit(1)).as("n_shipments"))
      val anchor = t(s, dir, "lineitem")
        .agg(max(col("l_shipdate")).as("corpus_last"))
      t(s, dir, "part")
        .join(lastShip, col("p_partkey") === col("l_partkey"), "left")
        .crossJoin(broadcast(anchor))
        .select(col("p_partkey"),
          coalesce(col("n_shipments"), lit(0L)).as("n_shipments"),
          datediff(col("corpus_last"), col("last_ship")).cast("long")
            .as("stale_days"))
        .orderBy(col("stale_days").desc_nulls_first, col("p_partkey"))
        .limit(100)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
            .orderBy(col("stale_days").desc_nulls_first,
              col("p_partkey"))).cast("long"))
    },
    Some("""WITH ls AS (SELECT l_partkey, max(l_shipdate) AS last_ship,
          count(*) AS n_shipments FROM lineitem GROUP BY 1),
      anchor AS (SELECT max(l_shipdate) AS corpus_last FROM lineitem),
      scored AS (SELECT p_partkey,
          coalesce(n_shipments, 0) AS n_shipments,
          CAST(datediff('day', last_ship, corpus_last) AS BIGINT)
            AS stale_days
        FROM part LEFT JOIN ls ON l_partkey = p_partkey CROSS JOIN anchor),
      ranked AS (SELECT *, row_number() OVER (
          ORDER BY stale_days DESC NULLS FIRST, p_partkey) AS rnk
        FROM scored)
      SELECT p_partkey, CAST(n_shipments AS BIGINT) AS n_shipments,
        stale_days, rnk
      FROM ranked WHERE rnk <= 100 ORDER BY rnk"""))

  /** Language-metadata confusion matrix: declared `lang` column vs the
    * stopword-based [[TextAnalysis.langIdGuess]] — the metadata-trust
    * audit (mislabeled languages poison per-language gates and splits).
    * One bounded |langs|² aggregate; the oracle re-derives the guess with
    * q25's generated expression. */
  private[graft] val q158 = {
    val hitExpr = TextAnalysis.StopwordsByLang.map { case (lang, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"CAST(len(list_filter(str_split(text, ' '), t -> list_contains($list, t))) AS BIGINT) AS ${lang}_hits"
    }.mkString(",\n        ")
    val langs = TextAnalysis.StopwordsByLang.map(_._1)
    val bestExpr = langs.map(l => s"${l}_hits").reduce((a, b) => s"greatest($a, $b)")
    val caseArms = langs.map(l => s"WHEN ${l}_hits = best THEN '$l'").mkString(" ")
    QuerySpec(
      "q158_lang_confusion",
      (s, dir) => t(s, dir, "documents")
        .select(col("lang").as("declared"),
          TextAnalysis.langIdGuess(col("text")).as("guessed"))
        .groupBy("declared", "guessed")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("agree", col("declared") === col("guessed"))
        .orderBy("declared", "guessed"),
      Some(s"""WITH hits AS (SELECT doc_id, lang, $hitExpr FROM documents),
        scored AS (SELECT *, $bestExpr AS best FROM hits),
        guessed AS (SELECT lang AS declared,
            CASE WHEN best <= 0 THEN 'unknown' $caseArms ELSE 'unknown' END
              AS guessed
          FROM scored)
        SELECT declared, guessed, count(*) AS n_docs,
          declared = guessed AS agree
        FROM guessed GROUP BY 1, 2 ORDER BY 1, 2"""))
  }

  /** Cross-language duplicate leak: document pairs with IDENTICAL content
    * fingerprints but DIFFERENT declared languages — either mislabeled
    * metadata or byte-identical text shipped under two lang tags; both
    * poison per-language corpora. Fingerprint-keyed self-join: id-only
    * shuffle, bounded by duplicate-group sizes. */
  private[graft] val crossLangDupsOracle: String =
    s"""WITH docs AS ($seededDocsSql),
      fp AS (SELECT doc_id, lang,
        CASE WHEN len(str_split(text, ' ')) = 0 THEN 0
          ELSE list_reduce(
            list_transform(str_split(text, ' '),
              t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 100003),
            (acc, x) -> (acc * 31 + x) % 1000000007)
        END AS fp
        FROM docs)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        a.lang AS lang_a, b.lang AS lang_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        AND a.lang <> b.lang
      ORDER BY 1, 2"""

  private[graft] val q159 = QuerySpec(
    "q159_crosslang_dups",
    (s, dir) => {
      // seededDocs, not the raw table: keeps this gate non-vacuous at
      // every sf (see CatalogBase.seedDocRows)
      val fp = seededDocs(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
      fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
            col("a.lang") =!= col("b.lang"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
        .orderBy("id_a", "id_b")
    },
    Some(crossLangDupsOracle))

  /** Benford first-digit profile of order values — the classic
    * fabricated-numbers screen auditors run on financial columns. Digit
    * extraction goes through exact integer cents rendered as a string
    * (integer-to-string is engine-identical where double formatting is
    * not); shares are integer-division micros against a 1-row total. */
  private[graft] val q160 = QuerySpec(
    "q160_benford_digits",
    (s, dir) => {
      val digits = t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice") * 100 + 0.5)
          .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      digits
        .crossJoin(broadcast(digits.agg(sum(col("n_orders")).as("total"))))
        .select(col("digit"), col("n_orders"),
          expr("(1000000L * n_orders) div total").as("share_micro"))
        .orderBy("digit")
    },
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(
          o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT)
          AS digit
        FROM orders),
      c AS (SELECT digit, count(*) AS n_orders FROM d GROUP BY 1),
      t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM c)
      SELECT digit, n_orders,
        CAST((1000000 * n_orders) // total AS BIGINT) AS share_micro
      FROM c CROSS JOIN t ORDER BY digit"""))

  // ------------------------------------------------- §2.11 composed queries
  //
  // The eight reference pipeline queries (S1:94-183 tam_ce through
  // S1:1069-1085 combined_nvs_data), oracle-gated end-to-end: staging
  // shapes derive deterministically from the shipped parquet on BOTH
  // sides (graft.jobs.NvsStaging registers the Spark temp views;
  // NvsStaging.oracleCtes is the DuckDB twin), the Spark side runs the
  // real NvsPipeline builders, and each oracle replays the reference SQL
  // in DuckDB dialect (F-13 resolved per SURVEY §7.3.2). Rounding: reach/
  // engage are integer-valued by construction (exact in any fold order;
  // 2dp round is a no-op guard) except tam_ce's 1/display_order shares
  // (6dp); window-allocated costs round at 2dp (money contract).

  /** The 12-column channel-fact projection + deterministic order shared by
    * q162-q166 (grain: channel × month × dma, zip/state NULL). */
  private[graft] def channelFact(df: DataFrame): DataFrame =
    df.select(col("brand"), col("channel"), col("audience"), col("year"),
        col("month"), col("zip_code"), col("dma"), col("state"),
        col("country"), round(col("reach"), 2).as("reach"),
        round(col("engage"), 2).as("engage"), round(col("cost"), 2).as("cost"))
      .orderBy(col("year"), col("month"), col("dma"))

  private[graft] val channelFactSelect =
    """SELECT brand, channel, audience, year, month, zip_code, dma, state,
      country, round(reach, 2) AS reach, round(engage, 2) AS engage,
      round(cost, 2) AS cost"""

  /** §2.11 tam_ce (S1:94-183): calls→MDM→org chain, priority CASE,
    * inline budget VALUES, window allocation over (brand, year). */
  private[graft] val q161 = QuerySpec(
    "q161_nvs_tam_ce",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      graft.jobs.NvsPipeline.tamCe(s)
        .select(col("product_brand_name"), col("source"), col("year_month"),
          col("zip"), col("audience"), col("channel"),
          round(col("reach"), 6).as("reach"),
          round(col("engage"), 6).as("engage"),
          round(col("cost"), 2).as("cost"))
        .orderBy("year_month", "zip")
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.tamChain}
      SELECT product_brand_name, source, year_month, zip, audience, channel,
        round(reach, 6) AS reach, round(engage, 6) AS engage,
        round(cost, 2) AS cost
      FROM tc_fin ORDER BY year_month, zip"""))

  /** §2.11 dtc_display (S1:228-321): wide∪unpivot costs, inner alloc. */
  private[graft] val q162 = QuerySpec(
    "q162_nvs_dtc_display",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcDisplay(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.ddChain}
      $channelFactSelect FROM dd_fin ORDER BY year, month, dma"""))

  /** §2.11 dtc_paid_search (S1:323-416). */
  private[graft] val q163 = QuerySpec(
    "q163_nvs_dtc_paid_search",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcPaidSearch(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.dsChain}
      $channelFactSelect FROM ds_fin ORDER BY year, month, dma"""))

  /** §2.11 dtc_poc (S1:419-499): NULL engage, LEFT cost join (2024 rows
    * carry NULL cost — the reference's unmatched-left behavior). */
  private[graft] val q164 = QuerySpec(
    "q164_nvs_dtc_poc",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcPoc(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.dpChain}
      $channelFactSelect FROM dp_fin ORDER BY year, month, dma"""))

  /** §2.11 dtc_paid_social (S1:502-578): no cost cutoff, LEFT join. */
  private[graft] val q165 = QuerySpec(
    "q165_nvs_dtc_paid_social",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcPaidSocial(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.dsoChain}
      $channelFactSelect FROM dso_fin ORDER BY year, month, dma"""))

  /** §2.11 hcp_paid_search (S1:580-679): daily∪monthly vintages, 16%-of-npp
    * ∪ summed-unpivot costs, ratio allocation via join-back (A-9). */
  private[graft] val q166 = QuerySpec(
    "q166_nvs_hcp_paid_search",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.hcpPaidSearch(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.hsChain}
      $channelFactSelect FROM hs_fin ORDER BY year, month, dma"""))

  /** §2.11 hcp_all_channels (S1:817-1066): weekly pivot, week→month
    * (F-13 twin), old∪new channel canon, coalesce-key FULL JOIN probe,
    * /11 /9 back-spread. */
  private[graft] val q167 = QuerySpec(
    "q167_nvs_hcp_all_channels",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      graft.jobs.NvsPipeline.hcpAllChannels(s)
        .select(col("brand"), col("channel"), col("audience"), col("year"),
          col("month"), col("zip_code"), col("dma"), col("state"),
          col("country"), round(col("reach"), 2).as("reach"),
          round(col("engage"), 2).as("engage"),
          round(col("cost"), 2).as("cost"))
        .orderBy(col("channel"), col("year"), col("month"), col("zip_code"),
          col("dma"))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.haChain}
      $channelFactSelect FROM ha_fin
      ORDER BY channel, year, month, zip_code NULLS FIRST,
        dma NULLS FIRST"""))

  /** §2.11 combined_nvs_data (S1:1069-1084): the 6-way positional UNION
    * (month int∪string → string — the A.16 quirk, preserved). */
  private[graft] val q168 = QuerySpec(
    "q168_nvs_combined",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      graft.jobs.NvsPipeline.combined(s)
        .select(col("brand"), col("channel"), col("audience"), col("year"),
          col("month"), col("zip_code"), col("dma"), col("state"),
          col("country"), round(col("reach"), 2).as("reach"),
          round(col("engage"), 2).as("engage"),
          round(col("cost"), 2).as("cost"))
        .orderBy(col("audience"), col("channel"), col("year"), col("month"),
          col("dma"), col("zip_code"))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.ddChain}, ${graft.jobs.NvsStaging.dsChain},
      ${graft.jobs.NvsStaging.dpChain}, ${graft.jobs.NvsStaging.dsoChain},
      ${graft.jobs.NvsStaging.hsChain}, ${graft.jobs.NvsStaging.haChain},
      u AS (
        SELECT brand, channel, audience, year, CAST(month AS VARCHAR) AS month,
          zip_code, dma, state, country, reach, engage, cost FROM dd_fin
        UNION ALL SELECT brand, channel, audience, year,
          CAST(month AS VARCHAR), zip_code, dma, state, country, reach,
          engage, cost FROM ds_fin
        UNION ALL SELECT brand, channel, audience, year,
          CAST(month AS VARCHAR), zip_code, dma, state, country, reach,
          engage, cost FROM dp_fin
        UNION ALL SELECT brand, channel, audience, year,
          CAST(month AS VARCHAR), zip_code, dma, state, country, reach,
          engage, cost FROM dso_fin
        UNION ALL SELECT brand, channel, audience, year,
          CAST(month AS VARCHAR), zip_code, dma, state, country, reach,
          engage, cost FROM hs_fin
        UNION ALL SELECT brand, channel, audience, year, month, zip_code,
          dma, state, country, reach, engage, cost FROM ha_fin)
      $channelFactSelect FROM u
      ORDER BY audience, channel, year, month, dma NULLS FIRST,
        zip_code NULLS FIRST"""))

  /** Bounded companion to q140: the same standing-labels + batch-absorb
    * contract ([[graft.operators.Components.connectedComponentsIncremental]])
    * over chain-structured edges (p → p+1 within decades of part keys), so
    * component size is capped at 10 and the DuckDB recursive closure stays
    * tractable at EVERY scale factor — q140's co-purchase fixture densifies
    * at sf0.1 and its oracle blows up, leaving the incremental-components
    * row gate-checkable only at sf0.01. This row keeps the family green in
    * full-catalog sweeps at any SF; q140 + the 5M-node in-engine proof in
    * BASELINE.md remain the scale evidence. */
  private[graft] val q169 = QuerySpec(
    "q169_incremental_components_chain",
    (s, dir) => {
      import graft.operators.Components
      val edges = t(s, dir, "part")
        .where(col("p_partkey") % 10 =!= 9)
        .select(col("p_partkey").as("a"), (col("p_partkey") + 1).as("b"))
      val old = edges.where((col("a") + col("b")) % 5 =!= 0)
      val batch = edges.where((col("a") + col("b")) % 5 === 0)
      val standing = Components.connectedComponents(old, "a", "b")
      Components.connectedComponentsIncremental(standing, batch, "a", "b")
        .orderBy("id")
    },
    Some("""WITH RECURSIVE canon AS (SELECT p_partkey AS a, p_partkey + 1 AS b
        FROM part WHERE p_partkey % 10 <> 9),
      und AS (SELECT a, b FROM canon UNION SELECT b, a FROM canon),
      walk(id, comp) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.a, w.comp FROM und u JOIN walk w ON w.id = u.b)
      SELECT CAST(id AS BIGINT) AS id, CAST(min(comp) AS BIGINT) AS comp
      FROM walk GROUP BY 1 ORDER BY 1"""))

  /** Perceptual image near-dup pairs ([[Multimodal.perceptualDedup]]) over
    * deterministic generated payloads — closes the last spec-only family
    * with a driver-visible row. Payload bytes are a pure function of
    * doc_id (64 bytes; groups of 3 consecutive ids share a base image,
    * every 7th id perturbs one cell), so StubCodec's position-averaged
    * grid IS the byte values and the whole aHash64 + banded-Hamming
    * pipeline is integer-exact: the oracle recomputes the 64 cell values,
    * the float-exact mean (integer sum / 64 — dyadic, exact in FLOAT and
    * DOUBLE alike), the per-bit flags, the 8-bit band values (built from
    * bit flags — no engine-dependent shifts on negative longs), the band
    * collisions, and the exact Hamming recheck — the q101 replay pattern
    * on the image path. */
  private[graft] val q170 = QuerySpec(
    "q170_perceptual_dedup",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val base = id / 3
          // two mixing terms so grids stay distinct across the base range:
          // base alone wraps mod 251 and would make every 251st base an
          // identical image — duplicate classes would then GROW with the
          // corpus and the pair output would go quadratic at 10×; with the
          // base/251 term, duplicate classes stay the designed 3-doc groups
          // and the output scales linearly
          val payload = Array.tabulate(64) { i =>
            val v0 = (base * (i + 7) + (base / 251) * (3 * i + 5) +
              i.toLong * i) % 251
            val v = if (id % 7 == 0 && i == (id % 64)) (v0 + 120) % 251 else v0
            v.toByte
          }
          Multimodal.MediaRow(id, "image", payload)
        }
      Multimodal.perceptualDedup(media, Multimodal.StubCodec,
          maxHamming = 4, bands = 8)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH par AS (SELECT doc_id, doc_id // 3 AS base FROM documents),
      g AS (SELECT p.doc_id, t.i,
          CASE WHEN p.doc_id % 7 = 0 AND t.i = p.doc_id % 64
            THEN ((p.base * (t.i + 7) + (p.base // 251) * (3 * t.i + 5)
              + t.i * t.i) % 251 + 120) % 251
            ELSE (p.base * (t.i + 7) + (p.base // 251) * (3 * t.i + 5)
              + t.i * t.i) % 251 END AS v
        FROM par p, range(64) t(i)),
      m AS (SELECT doc_id, sum(v) / 64.0 AS mean FROM g GROUP BY 1),
      bits AS (SELECT g.doc_id, g.i,
          CASE WHEN g.v > m.mean THEN 1 ELSE 0 END AS b
        FROM g JOIN m USING (doc_id)),
      bands AS (SELECT doc_id, i // 8 AS band_idx,
          sum(b * (1 << (i % 8))) AS band_val
        FROM bits GROUP BY 1, 2),
      cand AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
        FROM bands l JOIN bands r ON l.band_idx = r.band_idx
          AND l.band_val = r.band_val AND l.doc_id < r.doc_id),
      ham AS (SELECT c.id_a, c.id_b,
          sum(CASE WHEN ba.b <> bb.b THEN 1 ELSE 0 END) AS hamming
        FROM cand c JOIN bits ba ON ba.doc_id = c.id_a
          JOIN bits bb ON bb.doc_id = c.id_b AND bb.i = ba.i
        GROUP BY 1, 2)
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
        CAST(hamming AS INTEGER) AS hamming
      FROM ham WHERE hamming <= 4 ORDER BY 1, 2"""))

  /** Checked-contract oracle for the catalog's one deliberately non-oracle
    * signal, [[TextAnalysis.compressionRatio]] (DuckDB has no deflate) —
    * the q32 pattern: exact cross-checkable aggregates (doc count, total
    * utf8 bytes) plus bound flags that are true for any correct deflate
    * and which DuckDB reproduces as literals. A broken ratio (negative,
    * wrong denominator, non-deterministic compressor) flips a flag and
    * fails the hash match. Bounds: ratio > 0 for non-empty text; deflate
    * never expands past utf8+512 (zlib stored-block bound: 5 bytes per
    * 16 KiB + trailer, docs are far smaller); deflating 4 concatenated
    * copies never exceeds 4 independent deflates + 64 slack, so
    * ratio(t⁴) ≤ ratio(t) + 64/len — the monotone-under-repetition
    * property that makes the signal usable as a quality gate. */
  private[graft] val q171 = QuerySpec(
    "q171_compression_contract",
    (s, dir) => {
      val r = graft.operators.TextAnalysis.compressionRatio(col("text"))
      val r4 = graft.operators.TextAnalysis.compressionRatio(
        concat(col("text"), col("text"), col("text"), col("text")))
      t(s, dir, "documents")
        .where(octet_length(col("text")) > 0)
        .select(col("lang"), octet_length(col("text")).cast("long").as("len"),
          r.as("r"), r4.as("r4"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("len")).as("sum_utf8"),
          bool_and(col("r") > 0).as("positive_all"),
          bool_and(col("r") <= lit(1.0) + lit(512.0) / col("len"))
            .as("bounded_all"),
          bool_and(col("r4") <= col("r") + lit(64.0) / col("len"))
            .as("repeat_bounded_all"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
        CAST(sum(strlen(text)) AS BIGINT) AS sum_utf8,
        TRUE AS positive_all, TRUE AS bounded_all,
        TRUE AS repeat_bounded_all
      FROM documents WHERE strlen(text) > 0
      GROUP BY 1 ORDER BY 1"""))

  /** Product-quantization ANN ([[Similarity.pqTopK]]) — the embedding-
    * compression scale path (m codes per vector, ADC scoring). Fully
    * value-checked despite being approximate: the seed codebook, the
    * per-(vector, subspace) argmin codes, and the sorted-fold ADC sums are
    * all deterministic double arithmetic, so DuckDB replays the identical
    * index (the q33/q101 replay pattern, here over list slices). */
  private[graft] val q172 = {
    val (m, ksub, w, k) = (8, 16, 8, 5)
    val l2 = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, $w + 1),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"""
    QuerySpec(
      "q172_ann_pq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(emb, emb.where(col("vec_id") < 8), k = k,
            m = m, ksub = ksub, dims = 64)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("adc_dist"), 6).as("adc_dist"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH cb AS (SELECT vec_id AS code, t.sub,
          (embedding::DOUBLE[])[(t.sub * $w + 1):(t.sub * $w + $w)] AS cw
        FROM embeddings, range($m) t(sub) WHERE vec_id < $ksub),
      ex AS (SELECT vec_id AS neighbor_id, t.sub,
          (embedding::DOUBLE[])[(t.sub * $w + 1):(t.sub * $w + $w)] AS sv
        FROM embeddings, range($m) t(sub)),
      codes AS (SELECT neighbor_id, sub, code FROM (
          SELECT e.neighbor_id, e.sub, c.code,
            row_number() OVER (PARTITION BY e.neighbor_id, e.sub
              ORDER BY ${l2("e.sv", "c.cw")} ASC, c.code ASC) AS rn
          FROM ex e JOIN cb c ON e.sub = c.sub) WHERE rn = 1),
      qx AS (SELECT vec_id AS query_id, t.sub,
          (embedding::DOUBLE[])[(t.sub * $w + 1):(t.sub * $w + $w)] AS qv
        FROM embeddings, range($m) t(sub) WHERE vec_id < 8),
      lut AS (SELECT q.query_id, q.sub, c.code,
          ${l2("q.qv", "c.cw")} AS d2
        FROM qx q JOIN cb c ON q.sub = c.sub),
      j AS (SELECT l.query_id, cd.neighbor_id, cd.sub, l.d2
        FROM codes cd JOIN lut l ON cd.sub = l.sub AND cd.code = l.code
        WHERE l.query_id <> cd.neighbor_id),
      adc AS (SELECT query_id, neighbor_id,
          list_reduce(list_transform(
            list_sort(list({'s': sub, 'd': d2})), r -> r.d),
            (x, y) -> x + y) AS adc_dist
        FROM j GROUP BY 1, 2),
      ranked AS (SELECT query_id, neighbor_id, adc_dist,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
        FROM adc)
      SELECT query_id, rank, neighbor_id, round(adc_dist, 6) AS adc_dist
      FROM ranked WHERE rank <= $k ORDER BY query_id, rank"""))
  }

  /** IVF + PQ-on-residuals ([[Similarity.ivfPqTopK]]): the composed FAISS-
    * IVFPQ index — coarse cells prune the candidate set while PQ codes on
    * the residuals shrink the bytes; the oracle replays coarse assignment,
    * residual codebook training, code assignment, and sorted-fold ADC
    * bit-for-bit. */
  private[graft] val q173 = {
    val (nlist, nprobe, m, ksub, w, k) = (16, 4, 8, 16, 8, 5)
    val l2w = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, $w + 1),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"""
    val l2full = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, 65),
          i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"""
    QuerySpec(
      "q173_ann_ivfpq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(emb, emb.where(col("vec_id") < 8), k = k,
            nlist = nlist, nprobe = nprobe, m = m, ksub = ksub, dims = 64)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("adc_dist"), 6).as("adc_dist"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH dvx AS (SELECT vec_id, embedding::DOUBLE[] AS v
          FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cvec FROM dvx
          WHERE vec_id < $nlist),
        assigned AS (SELECT nid, cid, rv FROM (
            SELECT d.vec_id AS nid, c.cid,
              list_transform(range(1, 65), i -> d.v[i] - c.cvec[i]) AS rv,
              row_number() OVER (PARTITION BY d.vec_id
                ORDER BY ${l2full("d.v", "c.cvec")} ASC, c.cid ASC) AS rn
            FROM dvx d CROSS JOIN cent c) WHERE rn = 1),
        cb AS (SELECT nid - $nlist AS code, t.sub,
            rv[(t.sub * $w + 1):(t.sub * $w + $w)] AS cw
          FROM assigned, range($m) t(sub)
          WHERE nid >= $nlist AND nid < $nlist + $ksub),
        ex AS (SELECT nid AS neighbor_id, cid, t.sub,
            rv[(t.sub * $w + 1):(t.sub * $w + $w)] AS sv
          FROM assigned, range($m) t(sub)),
        codes AS (SELECT neighbor_id, cid, sub, code FROM (
            SELECT e.neighbor_id, e.cid, e.sub, c.code,
              row_number() OVER (PARTITION BY e.neighbor_id, e.sub
                ORDER BY ${l2w("e.sv", "c.cw")} ASC, c.code ASC) AS rn
            FROM ex e JOIN cb c ON e.sub = c.sub) WHERE rn = 1),
        probes AS (SELECT query_id, cid, rv FROM (
            SELECT d.vec_id AS query_id, c.cid,
              list_transform(range(1, 65), i -> d.v[i] - c.cvec[i]) AS rv,
              row_number() OVER (PARTITION BY d.vec_id
                ORDER BY ${l2full("d.v", "c.cvec")} ASC, c.cid ASC) AS rn
            FROM dvx d CROSS JOIN cent c WHERE d.vec_id < 8)
          WHERE rn <= $nprobe),
        qx AS (SELECT query_id, cid, t.sub,
            rv[(t.sub * $w + 1):(t.sub * $w + $w)] AS qv
          FROM probes, range($m) t(sub)),
        lut AS (SELECT q.query_id, q.cid, q.sub, c.code,
            ${l2w("q.qv", "c.cw")} AS d2
          FROM qx q JOIN cb c ON q.sub = c.sub),
        j AS (SELECT l.query_id, cd.neighbor_id, cd.sub, l.d2
          FROM codes cd JOIN lut l
            ON cd.cid = l.cid AND cd.sub = l.sub AND cd.code = l.code
          WHERE l.query_id <> cd.neighbor_id),
        adc AS (SELECT query_id, neighbor_id,
            list_reduce(list_transform(
              list_sort(list({'s': sub, 'd': d2})), r -> r.d),
              (x, y) -> x + y) AS adc_dist
          FROM j GROUP BY 1, 2),
        ranked AS (SELECT query_id, neighbor_id, adc_dist,
            row_number() OVER (PARTITION BY query_id
              ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
          FROM adc)
        SELECT query_id, rank, neighbor_id, round(adc_dist, 6) AS adc_dist
        FROM ranked WHERE rank <= $k ORDER BY query_id, rank"""))
  }

  /** IVF recall calibration ([[Similarity.ivfRecallCurve]]): measured
    * recall@k vs the exact ground truth at each probe count, from one
    * scored pass — the ANN twin of q156's MinHash band calibration. */
  private[graft] val q174 = {
    val (nlist, k) = (16, 5)
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q174_ivf_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfRecallCurve(emb, emb.where(col("vec_id") < 8), k = k,
            nlist = nlist, sweep = Seq(1, 2, 4, 8))
          .orderBy(col("nprobe"))
      },
      Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cent_vec
          FROM embeddings WHERE vec_id < $nlist),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
        assigned AS (SELECT neighbor_id, cv, cid FROM (
            SELECT neighbor_id, cv, cid,
              row_number() OVER (PARTITION BY neighbor_id
                ORDER BY ${cosSql("cv", "cent_vec")} DESC, cid) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 8),
        probes AS (SELECT query_id, qv, cid, rn AS probe_rank FROM (
            SELECT query_id, qv, cid,
              row_number() OVER (PARTITION BY query_id
                ORDER BY ${cosSql("qv", "cent_vec")} DESC, cid) AS rn
            FROM q CROSS JOIN cent) WHERE rn <= 8),
        scored AS (SELECT query_id, neighbor_id,
            ${cosSql("qv", "cv")} AS cosine, probe_rank
          FROM assigned JOIN probes USING (cid)
          WHERE query_id <> neighbor_id),
        exact AS (SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.neighbor_id,
              row_number() OVER (PARTITION BY q.query_id
                ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.neighbor_id) AS rank
            FROM c CROSS JOIN q WHERE q.query_id <> c.neighbor_id)
          WHERE rank <= $k),
        topk AS (SELECT np, query_id, neighbor_id FROM (
            SELECT p.np, s.query_id, s.neighbor_id,
              row_number() OVER (PARTITION BY p.np, s.query_id
                ORDER BY s.cosine DESC, s.neighbor_id) AS rank
            FROM scored s CROSS JOIN unnest([1, 2, 4, 8]) AS p(np)
            WHERE s.probe_rank <= p.np) WHERE rank <= $k),
        hits AS (SELECT np, CAST(count(*) AS BIGINT) AS hits
          FROM topk JOIN exact USING (query_id, neighbor_id) GROUP BY 1),
        spine AS (SELECT p.np, CAST(pt.possible AS BIGINT) AS possible
          FROM (SELECT count(*) AS possible FROM exact) pt
          CROSS JOIN unnest([1, 2, 4, 8]) AS p(np))
        SELECT spine.np AS nprobe,
          CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits, spine.possible,
          round(CAST(coalesce(hits.hits, 0) AS DOUBLE) / spine.possible,
            6) AS recall
        FROM spine LEFT JOIN hits ON spine.np = hits.np
        ORDER BY nprobe"""))
  }

  /** Margin-based bitext mining ([[Similarity.bitextMarginMine]]): mutual
    * best cross-side pairs by ratio margin (cosine over mean top-k NN
    * cosine of both endpoints) — the hubness-robust CCMatrix/LASER miner;
    * sides are the label-0 and label-1 embedding slices. */
  private[graft] val q175 = {
    val (k, minMargin) = (4, 1.0)
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q175_bitext_margin",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bitextMarginMine(
            emb.where(col("label") === 0), emb.where(col("label") === 1),
            k = k, minMargin = minMargin)
          .select(col("src_id"), col("tgt_id"),
            round(col("cosine"), 6).as("cosine"),
            round(col("margin"), 6).as("margin"))
          .orderBy(col("src_id"))
      },
      Some(s"""WITH a AS (SELECT vec_id AS src_id, embedding::DOUBLE[] AS av
          FROM embeddings WHERE label = 0),
        b AS (SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS bv
          FROM embeddings WHERE label = 1),
        scored AS (SELECT src_id, tgt_id, ${cosSql("av", "bv")} AS cosine,
            row_number() OVER (PARTITION BY src_id
              ORDER BY ${cosSql("av", "bv")} DESC, tgt_id ASC) AS xrn,
            row_number() OVER (PARTITION BY tgt_id
              ORDER BY ${cosSql("av", "bv")} DESC, src_id ASC) AS yrn
          FROM a CROSS JOIN b),
        da AS (SELECT src_id,
            list_reduce(list_transform(
              list_sort(list({'r': xrn, 'c': cosine})), s -> s.c),
              (x, y) -> x + y) / CAST(count(*) AS DOUBLE) AS da
          FROM scored WHERE xrn <= $k GROUP BY 1),
        db AS (SELECT tgt_id,
            list_reduce(list_transform(
              list_sort(list({'r': yrn, 'c': cosine})), s -> s.c),
              (x, y) -> x + y) / CAST(count(*) AS DOUBLE) AS db
          FROM scored WHERE yrn <= $k GROUP BY 1),
        margins AS (SELECT s.src_id, s.tgt_id, s.cosine,
            s.cosine / ((da.da + db.db) / 2.0) AS margin
          FROM scored s JOIN da USING (src_id) JOIN db USING (tgt_id)),
        best AS (SELECT src_id, tgt_id, cosine, margin,
            row_number() OVER (PARTITION BY src_id
              ORDER BY margin DESC, tgt_id ASC) AS f,
            row_number() OVER (PARTITION BY tgt_id
              ORDER BY margin DESC, src_id ASC) AS w
          FROM margins)
        SELECT src_id, tgt_id, round(cosine, 6) AS cosine,
          round(margin, 6) AS margin
        FROM best WHERE f = 1 AND w = 1 AND margin >= $minMargin
        ORDER BY src_id"""))
  }

  /** Compaction bin-packing plan ([[graft.sources.Compaction.planBins]]):
    * per-partition next-fit-by-offset packing of small files into
    * target-size rewrite jobs, oversize files as singleton bins — the
    * OPTIMIZE planner grain over a deterministic file-stats fixture
    * derived from orders (month × orderkey-bucket, mod-prime sizes so
    * every scale exercises both the packing and oversize paths). */
  private[graft] val q176 = {
    val target = 4000000L
    QuerySpec(
      "q176_compaction_plan",
      (s, dir) => {
        val files = t(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part_key"),
            (col("o_orderkey") % 13).as("file_id"))
          .agg(pmod(sum(floor(col("o_totalprice")).cast("long")),
            lit(9999991L)).as("bytes"))
        graft.sources.Compaction.planBins(files, target)
          .orderBy(col("part_key"), col("file_id"))
      },
      Some(s"""WITH fl AS (SELECT strftime(o_orderdate, '%Y-%m') AS part_key,
          o_orderkey % 13 AS file_id,
          CAST(CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
            % 9999991 AS BIGINT) AS bytes
        FROM orders GROUP BY 1, 2),
        small AS (SELECT part_key, file_id, bytes,
            CAST(floor((sum(bytes) OVER (PARTITION BY part_key
              ORDER BY file_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
              ROW) - bytes) / $target.0) AS BIGINT) AS bin_id
          FROM fl WHERE bytes < $target),
        big AS (SELECT part_key, file_id, bytes,
            -CAST(row_number() OVER (PARTITION BY part_key
              ORDER BY file_id) AS BIGINT) AS bin_id
          FROM fl WHERE bytes >= $target)
        SELECT part_key, file_id, bytes, bin_id FROM small
        UNION ALL SELECT part_key, file_id, bytes, bin_id FROM big
        ORDER BY part_key, file_id"""))
  }

  /** DoReMi-style one-step domain reweighting ([[ScaleOps.domainReweight]]):
    * token-share mixture scaled multiplicatively by per-domain mean quality
    * vs the corpus mean — exact integer sufficient statistics, the corpus
    * constants cancel in the normalizer. */
  private[graft] val q177 = QuerySpec(
    "q177_domain_reweight",
    (s, dir) => graft.operators.ScaleOps.domainReweight(
        t(s, dir, "documents"), "source",
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.qualityScore(col("text")))
      .orderBy(col("source")),
    Some(s"""WITH perdoc AS (SELECT source,
        CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
        CAST(round($QualityScoreSql * 1000000.0, 0) AS BIGINT) AS q_micro
      FROM documents),
      dom AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS tokens,
          CAST(sum(q_micro) AS BIGINT) AS qsum
        FROM perdoc GROUP BY 1),
      dv AS (SELECT source, n_docs, tokens, qsum,
          CAST(tokens AS DOUBLE) * CAST(qsum AS DOUBLE)
            / CAST(n_docs AS DOUBLE) AS v
        FROM dom),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS t_toks,
          list_reduce(list_transform(
            list_sort(list({'s': source, 'v': v})), r -> r.v),
            (x, y) -> x + y) AS z
        FROM dv)
      SELECT source, n_docs, tokens,
        round(CAST(tokens AS DOUBLE) / t_toks, 6) AS w0,
        round(CAST(qsum AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1000000.0),
          6) AS quality,
        round(v / z, 6) AS w1
      FROM dv CROSS JOIN tot ORDER BY source"""))

  /** Sparse-ranker agreement curve ([[Retrieval.rankAgreement]]): overlap,
    * Jaccard and exact-binary RBO between the BM25 and coordinate-match
    * top-50 lists at depths 10/20/50 — the measurement that justifies the
    * q137 RRF hybrid (fusion only buys recall where rankers disagree). */
  private[graft] val q178 = {
    val terms = Seq("hash", "stream", "vector", "big")
    val termList = terms.map(p => s"'$p'").mkString("(", ",", ")")
    QuerySpec(
      "q178_rank_agreement",
      (s, dir) => {
        import graft.operators.Retrieval
        val docs = t(s, dir, "documents")
        val wTop = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
        val bm = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 50)
          .withColumn("rank", row_number().over(
            wTop.orderBy(col("score_micro").desc, col("id"))))
          .select("id", "rank")
        val coord = Retrieval
          .coordinateTopK(docs, "doc_id", "text", terms, k = 50)
          .select("id", "rank")
        Retrieval.rankAgreement(bm, coord, depths = Seq(10, 20, 50))
          .orderBy(col("depth"))
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
        ar AS (SELECT doc_id, ra FROM (SELECT doc_id, row_number()
            OVER (ORDER BY score_micro DESC, doc_id) AS ra FROM bm_scores)
          WHERE ra <= 50),
        coord AS (SELECT doc_id, count(*) AS n_match, any_value(dl) AS dl
          FROM tf GROUP BY 1),
        br AS (SELECT doc_id, rb FROM (SELECT doc_id, row_number()
            OVER (ORDER BY n_match DESC, dl, doc_id) AS rb FROM coord)
          WHERE rb <= 50),
        j AS (SELECT ra, rb FROM ar FULL JOIN br USING (doc_id)),
        per AS (SELECT g.d,
            CAST(count(*) FILTER (WHERE ra <= g.d) AS BIGINT) AS a_n,
            CAST(count(*) FILTER (WHERE rb <= g.d) AS BIGINT) AS b_n,
            CAST(count(*) FILTER (WHERE ra <= g.d AND rb <= g.d) AS BIGINT)
              AS inter
          FROM range(1, 51) g(d) CROSS JOIN j GROUP BY 1),
        curve AS (SELECT d, a_n, b_n, inter,
            sum((CAST(inter AS DOUBLE) / d) /
              CAST(1::BIGINT << (CAST(d AS INT) - 1) AS DOUBLE))
              OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW) AS rbosum
          FROM per)
        SELECT d AS depth, a_n, b_n, inter,
          round(CASE WHEN a_n + b_n - inter = 0 THEN 0.0
            ELSE CAST(inter AS DOUBLE) / (a_n + b_n - inter) END, 6)
            AS jaccard,
          round(rbosum * (CAST(1::BIGINT << (CAST(d AS INT) - 1) AS DOUBLE) /
            CAST((1::BIGINT << CAST(d AS INT)) - 1 AS DOUBLE)), 6) AS rbo
        FROM curve WHERE d IN (10, 20, 50) ORDER BY depth"""))
  }

  /** Selective-prediction risk–coverage curve
    * ([[TextAnalysis.selectiveRiskCurve]]): q109's classifier swept over a
    * fixed micro-nat margin-threshold grid — at each threshold, the doc
    * fraction an auto-labeler would keep and its accuracy on the kept set.
    * The operating-point table for model-assisted curation ("auto-accept
    * above margin M, route the rest to review"), integer-exact end to end
    * (margins are int64 micro-nat differences; the curve is one pass of
    * conditional sums, no sort). */
  private[graft] val q179 = {
    val grid = Seq(0L, 500000L, 1000000L, 2000000L, 4000000L, 8000000L,
      16000000L, 32000000L, 64000000L, 128000000L)
    QuerySpec(
      "q179_risk_coverage",
      (s, dir) => TextAnalysis.selectiveRiskCurve(t(s, dir, "documents"),
          "doc_id", "text", "lang", grid)
        .orderBy(col("threshold_q")),
      Some(s"""WITH $NbOracleCtes,
        top2 AS (SELECT id,
            max(CASE WHEN rn = 1 THEN post_q END) AS p1,
            max(CASE WHEN rn = 2 THEN post_q END) AS p2,
            max(CASE WHEN rn = 1 THEN cls END) AS predicted,
            max(CASE WHEN rn = 1 THEN label END) AS label
          FROM ranked WHERE rn <= 2 GROUP BY id),
        m AS (SELECT p1 - coalesce(p2, p1) AS margin_q,
            (predicted = label) AS correct FROM top2),
        mtot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM m),
        grid AS (SELECT unnest([${grid.mkString(", ")}]::BIGINT[])
            AS threshold_q),
        curve AS (SELECT threshold_q,
            CAST(count(*) FILTER (WHERE margin_q >= threshold_q) AS BIGINT)
              AS n_kept,
            CAST(count(*) FILTER (WHERE margin_q >= threshold_q AND correct)
              AS BIGINT) AS n_correct
          FROM m CROSS JOIN grid GROUP BY 1)
        SELECT threshold_q, n_total, n_kept,
          CAST(round(CAST(n_kept AS DOUBLE) * 1000000.0 / n_total, 0)
            AS BIGINT) AS coverage_micro,
          n_correct,
          CASE WHEN n_kept = 0 THEN 0::BIGINT
            ELSE CAST(round(CAST(n_correct AS DOUBLE) * 1000000.0 / n_kept,
              0) AS BIGINT) END AS acc_micro
        FROM curve CROSS JOIN mtot ORDER BY threshold_q"""))
  }

  /** Inter-rater agreement ([[graft.operators.DataChecks.raterAgreement]])
    * between the two label sources the engine already ships — the q25
    * stopword-hit lang-id heuristic and the q109 naive-Bayes classifier —
    * as confusion cells plus Cohen's kappa in integer micro units. The
    * audit that says whether two cheap labelers agree enough to trust
    * where they concur (and names the label pairs where they split). */
  private[graft] val q180 = QuerySpec(
    "q180_rater_kappa",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val heur = d.select(col("doc_id"),
        TextAnalysis.langIdGuess(col("text")).as("lang_heur"))
      val nb = TextAnalysis.naiveBayesPredict(d, "doc_id", "text", "lang")
        .select(col("id").as("doc_id"), col("predicted"))
      graft.operators.DataChecks.raterAgreement(
          heur.join(nb, "doc_id"), col("lang_heur"), col("predicted"))
        .orderBy(col("a_label"), col("b_label"))
    },
    Some(raterKappaOracle(NbOracleCtes)))

  /** The q180 oracle, parametric in the classifier: `predCtes` must be a
    * CTE chain whose LAST cte is `ranked(id, cls, rn)` (both the exact
    * [[NbOracleCtes]] and the hashed chain used by q201/q220 end there).
    * The rest — lang-id heuristic labels, confusion cells, Cohen's kappa
    * in integer micros — is identical between the exact and hashed
    * kappa rows by construction. */
  private[graft] def raterKappaOracle(predCtes: String): String = {
    val hitExpr = TextAnalysis.StopwordsByLang.map { case (lang, ws) =>
      val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
      s"CAST(len(list_filter(str_split(text, ' '), t -> list_contains($list, t))) AS BIGINT) AS ${lang}_hits"
    }.mkString(",\n          ")
    val langs = TextAnalysis.StopwordsByLang.map(_._1)
    val bestExpr = langs.map(l => s"${l}_hits").reduce((a, b) => s"greatest($a, $b)")
    val caseArms = langs.map(l => s"WHEN ${l}_hits = best THEN '$l'").mkString(" ")
    s"""WITH $predCtes,
        lhits AS (SELECT doc_id, $hitExpr FROM documents),
        lsc AS (SELECT *, $bestExpr AS best FROM lhits),
        heur AS (SELECT doc_id,
            CASE WHEN best <= 0 THEN 'unknown' $caseArms ELSE 'unknown' END
              AS a_lbl
          FROM lsc),
        pred AS (SELECT id AS doc_id, cls AS b_lbl FROM ranked WHERE rn = 1),
        cells AS (SELECT a_lbl AS a_label, b_lbl AS b_label,
            CAST(count(*) AS BIGINT) AS n_docs
          FROM heur JOIN pred USING (doc_id) GROUP BY 1, 2),
        ra AS (SELECT a_label AS lbl, CAST(sum(n_docs) AS BIGINT) AS r
          FROM cells GROUP BY 1),
        cbt AS (SELECT b_label AS lbl, CAST(sum(n_docs) AS BIGINT) AS c
          FROM cells GROUP BY 1),
        pes AS (SELECT CAST(coalesce(sum(r * c), 0) AS BIGINT) AS pe_s
          FROM ra JOIN cbt USING (lbl)),
        tots AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
            CAST(coalesce(sum(CASE WHEN a_label = b_label THEN n_docs END),
              0) AS BIGINT) AS po_n
          FROM cells)
        SELECT a_label, b_label, n_docs, n_total, po_n, pe_s,
          CASE WHEN n_total * n_total = pe_s THEN
              CASE WHEN po_n = n_total THEN 1000000::BIGINT
                ELSE 0::BIGINT END
            ELSE CAST(round(CAST(po_n * n_total - pe_s AS DOUBLE) *
              1000000.0 / CAST(n_total * n_total - pe_s AS DOUBLE), 0)
              AS BIGINT) END AS kappa_micro
        FROM cells CROSS JOIN tots CROSS JOIN pes
        ORDER BY a_label, b_label"""
  }

  /** Approximate functional-dependency audit
    * ([[graft.operators.DataChecks.fdViolations]], the TANE g₃ error):
    * (source → lang) / (lang → source) on documents and
    * (user_id → event_type) on events — min-rows-to-remove counts and
    * micro violation rates per declared dependency. */
  private[graft] val q181 = {
    def pairCtes(i: Int, table: String, det: String, dep: String): String =
      s"""c$i AS (SELECT $det AS det_val, $dep AS dep_val,
            CAST(count(*) AS BIGINT) AS c
          FROM $table GROUP BY 1, 2),
        g$i AS (SELECT det_val, CAST(sum(c) AS BIGINT) AS grp_rows,
            CAST(max(c) AS BIGINT) AS keep, CAST(count(*) AS BIGINT) AS n_dep
          FROM c$i GROUP BY 1),
        r$i AS (SELECT '$det' AS det_col, '$dep' AS dep_col,
            CAST(coalesce(sum(grp_rows), 0) AS BIGINT) AS n_rows,
            CAST(count(*) AS BIGINT) AS n_groups,
            CAST(coalesce(sum(CASE WHEN n_dep > 1 THEN 1 END), 0) AS BIGINT)
              AS violating_groups,
            CAST(coalesce(sum(grp_rows), 0) - coalesce(sum(keep), 0)
              AS BIGINT) AS violations,
            CASE WHEN coalesce(sum(grp_rows), 0) = 0 THEN 0::BIGINT
              ELSE CAST(round(CAST(coalesce(sum(grp_rows), 0) -
                coalesce(sum(keep), 0) AS DOUBLE) * 1000000.0 /
                coalesce(sum(grp_rows), 0), 0) AS BIGINT) END AS g3_micro
          FROM g$i)"""
    QuerySpec(
      "q181_fd_audit",
      (s, dir) => {
        val docs = graft.operators.DataChecks.fdViolations(
          t(s, dir, "documents"), Seq(("source", "lang"), ("lang", "source")))
        val ev = graft.operators.DataChecks.fdViolations(
          t(s, dir, "events"), Seq(("user_id", "event_type")))
        docs.unionAll(ev).orderBy(col("det_col"), col("dep_col"))
      },
      Some(s"""WITH ${pairCtes(1, "documents", "source", "lang")},
        ${pairCtes(2, "documents", "lang", "source")},
        ${pairCtes(3, "events", "user_id", "event_type")}
        SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
          UNION ALL SELECT * FROM r3)
        ORDER BY det_col, dep_col"""))
  }

  /** Per-label embedding centroid drift ([[Similarity.centroidDrift]]):
    * cosine between each label's centroid over the even-id half and the
    * odd-id half of the corpus — the embedding-space stability monitor
    * (a self-check split here; ingestion batches in production). Integer
    * micro quantization per dimension + dim-ordered sorted fold ⇒ the
    * cosine replays bit-for-bit. */
  private[graft] val q182 = QuerySpec(
    "q182_centroid_drift",
    (s, dir) => Similarity.centroidDrift(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", col("vec_id") % 2 === 0)
      .orderBy(col("label")),
    Some("""WITH q AS (SELECT label, (vec_id % 2 = 0) AS in_a, i - 1 AS dim,
          CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0) AS BIGINT)
            AS vq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      sums AS (SELECT label, in_a, dim, CAST(sum(vq) AS BIGINT) AS s,
          CAST(count(*) AS BIGINT) AS n
        FROM q GROUP BY 1, 2, 3),
      j AS (SELECT a.label, a.dim, a.s AS sa, b.s AS sb, a.n AS na,
          b.n AS nb
        FROM sums a JOIN sums b ON a.label = b.label AND a.dim = b.dim
          AND a.in_a AND NOT b.in_a),
      f AS (SELECT label, max(na) AS n_a, max(nb) AS n_b,
          list_sort(list({'d': dim, 'x': CAST(sa AS DOUBLE),
            'y': CAST(sb AS DOUBLE)})) AS ps
        FROM j GROUP BY 1)
      SELECT label, n_a, n_b,
        round(list_reduce(list_transform(ps, e -> e.x * e.y),
            (x, y) -> x + y) /
          (sqrt(list_reduce(list_transform(ps, e -> e.x * e.x),
            (x, y) -> x + y)) *
           sqrt(list_reduce(list_transform(ps, e -> e.y * e.y),
            (x, y) -> x + y))), 6) AS cos_centroid
      FROM f ORDER BY label"""))

  /** Heaps'-law vocabulary growth ([[TextAnalysis.vocabGrowth]]): types
    * and cumulative tokens at each ingestion-id prefix cut — flat vocab
    * under growing tokens = the source is mined out. Static cut grid so
    * the same oracle text runs at every SF (cuts past max(doc_id) simply
    * saturate — identical totals, still a well-defined curve point). */
}
