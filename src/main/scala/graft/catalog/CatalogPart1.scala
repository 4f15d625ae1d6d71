package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** Catalog part: q01-q50: reference core §2 + dedup/similarity/text/multimodal openers.
  *
  * Split from the single QueryCatalog file for size; specs stay
  * package-private and the ordered aggregation lives in
  * [[QueryCatalog.all]]. */
private[graft] trait CatalogPart1 extends CatalogBase {

  // ---------------------------------------------------------------- core §2

  /** A-1/A-2/A-7 group-by + SUM/COUNT (the reference's final_agg shape). */
  private[graft] val q01 = QuerySpec(
    "q01_group_sum",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_price,
      count(*) AS n_rows
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** P-1/P-2/F-14 projection with aliases + literal columns (S1:120,146-147). */
  private[graft] val q02 = QuerySpec(
    "q02_proj_literals",
    (s, dir) => t(s, dir, "nation")
      .select(
        col("n_name").as("nation_name"),
        lit("XOLAIR").as("brand"),
        lit("US").as("country"),
        col("n_nationkey").cast("string").as("nation_key_str"))
      .orderBy(col("nation_name")),
    Some("""SELECT n_name AS nation_name, 'XOLAIR' AS brand, 'US' AS country,
      CAST(n_nationkey AS VARCHAR) AS nation_key_str
      FROM nation ORDER BY nation_name"""))

  /** P-4/P-5/F-16/F-17 range + null predicates + lexicographic date-string
    * compare (S1:99,132,289 — do NOT "fix" to date type). */
  private[graft] val q03 = QuerySpec(
    "q03_filter_range",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_quantity").between(10, 20)
        && col("l_returnflag").isNotNull
        && date_format(col("l_shipdate"), "yyyy-MM-dd") <= "1997-12-31")
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_discount")), 2).as("sum_disc"))
      .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus, count(*) AS n_rows,
      round(sum(l_discount), 2) AS sum_disc
      FROM lineitem
      WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IS NOT NULL
        AND strftime(l_shipdate, '%Y-%m-%d') <= '1997-12-31'
      GROUP BY 1 ORDER BY 1"""))

  /** P-6/P-7/P-8 IN-list + wildcard-free LIKE + upper() compound predicate
    * (S1:296,713,848). */
  private[graft] val q04 = QuerySpec(
    "q04_in_like_pred",
    (s, dir) => t(s, dir, "orders")
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        && col("o_orderstatus").like("F")
        && upper(col("o_orderstatus")) === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
      round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        AND o_orderstatus LIKE 'F' AND upper(o_orderstatus) = 'F'
      GROUP BY 1 ORDER BY 1"""))

  /** J-1/J-4/J-11 chained inner equi-joins; dims broadcast (S1:126-131). */
  private[graft] val q05 = QuerySpec(
    "q05_join_chain",
    (s, dir) => t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("r_name"), col("n_name")),
    Some("""SELECT r_name, n_name, count(*) AS n_cust,
      round(sum(c_acctbal), 2) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** J-2/F-7 equi-join + array-membership predicate (S1:129-131
    * `array_contains(product_brand_name, 'XOLAIR')`). */
  private[graft] val q06 = QuerySpec(
    "q06_join_array_contains",
    (s, dir) => {
      val part = t(s, dir, "part")
      t(s, dir, "lineitem")
        .join(part, col("l_partkey") === col("p_partkey")
          && array_contains(split(col("p_type"), " "), "PROMO"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n_items,
      round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem JOIN part
        ON l_partkey = p_partkey
        AND list_contains(str_split(p_type, ' '), 'PROMO')
      GROUP BY 1 ORDER BY 1"""))

  /** J-3/J-5/F-1 join on cast/expression keys (S1:151-152,940-941) +
    * substring grouping. */
  private[graft] val q07 = QuerySpec(
    "q07_join_castkey",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "nation"),
        col("c_nationkey").cast("string") === col("n_nationkey").cast("string"))
      .groupBy(substring(col("n_name"), 1, 2).as("name_prefix"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .orderBy(col("name_prefix")),
    Some("""SELECT substring(n_name, 1, 2) AS name_prefix, count(*) AS n_cust,
      round(sum(c_acctbal), 2) AS sum_bal
      FROM customer JOIN nation
        ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
      GROUP BY 1 ORDER BY 1"""))

  /** J-8/F-5 left outer join + null-aware aggregation (S1:492-493). */
  private[graft] val q08 = QuerySpec(
    "q08_join_left",
    (s, dir) => t(s, dir, "nation")
      .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(
        count(col("c_custkey")).as("n_cust"),
        coalesce(round(sum(col("c_acctbal")), 2), lit(0.0)).as("sum_bal"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name, count(c_custkey) AS n_cust,
      coalesce(round(sum(c_acctbal), 2), 0.0) AS sum_bal
      FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      GROUP BY 1 ORDER BY 1"""))

  /** J-10/F-5/P-9 full outer join with coalesce-reconciled keys — the
    * reference's missing-cost probe (S1:1004-1027). */
  private[graft] val q09 = QuerySpec(
    "q09_join_full_coalesce",
    (s, dir) => {
      val d = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("ym_d"))
        .agg(round(sum(col("o_totalprice")), 2).as("reach"))
      val ca = t(s, dir, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyyMM").as("ym_c"))
        .agg(round(sum(col("l_extendedprice")), 2).as("cost"))
      d.join(ca, col("ym_d") === col("ym_c"), "full")
        .select(
          coalesce(col("ym_d"), col("ym_c")).as("ym"),
          col("reach"), col("cost"),
          when(col("reach").isNull, lit("MISSING_REACH"))
            .when(col("cost").isNull, lit("MISSING_COST"))
            .otherwise(lit("OK")).as("probe"))
        .orderBy(col("ym"))
    },
    Some("""WITH d AS (
        SELECT strftime(o_orderdate, '%Y%m') AS ym_d,
               round(sum(o_totalprice), 2) AS reach
        FROM orders GROUP BY 1),
      ca AS (
        SELECT strftime(l_shipdate, '%Y%m') AS ym_c,
               round(sum(l_extendedprice), 2) AS cost
        FROM lineitem GROUP BY 1)
      SELECT coalesce(ym_d, ym_c) AS ym, reach, cost,
        CASE WHEN reach IS NULL THEN 'MISSING_REACH'
             WHEN cost IS NULL THEN 'MISSING_COST'
             ELSE 'OK' END AS probe
      FROM d FULL JOIN ca ON ym_d = ym_c ORDER BY ym"""))

  /** W-1/W-2/S-9/F-12 the flagship reference semantic: proportional cost
    * allocation over an unbounded window partition (S1:164,311), budget from an
    * inline VALUES table (S1:134-140). Invariant: per-partition allocs re-sum
    * to the budget. */
  private[graft] val q10 = QuerySpec(
    "q10_window_alloc",
    (s, dir) => {
      import s.implicits._
      val budgets = Seq(("A", 1000.0), ("N", 2000.0), ("R", 1500.0))
        .toDF("flag", "budget")
      val li = t(s, dir, "lineitem")
        .withColumn("yr", year(col("l_shipdate")).cast("long"))
      li.join(broadcast(budgets), col("l_returnflag") === col("flag"))
        .withColumn("alloc",
          ChannelOps.allocateByShare(col("budget"), col("l_quantity"),
            col("l_returnflag"), col("yr")))
        .groupBy(col("l_returnflag"), col("yr"), col("l_linestatus"))
        .agg(round(sum(col("alloc")), 4).as("alloc_cost"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("yr"), col("l_linestatus"))
    },
    Some("""WITH budgets(flag, budget) AS (
        VALUES ('A', 1000.0), ('N', 2000.0), ('R', 1500.0)),
      alloc AS (
        SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS yr,
          l_linestatus,
          budget * l_quantity /
            sum(l_quantity) OVER (PARTITION BY l_returnflag,
              CAST(year(l_shipdate) AS BIGINT)) AS alloc
        FROM lineitem JOIN budgets ON l_returnflag = flag)
      SELECT l_returnflag, yr, l_linestatus,
        round(sum(alloc), 4) AS alloc_cost, count(*) AS n_rows
      FROM alloc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** O-1 UNION ALL bag semantics — duplicate branch kept (S1:100,105,110). */
  private[graft] val q11 = QuerySpec(
    "q11_union_all",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val f = o.where(col("o_orderstatus") === "F")
      val p = o.where(col("o_orderstatus") === "O")
      f.union(p).union(f) // F twice: bag union, counts must double
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH u AS (
        SELECT * FROM orders WHERE o_orderstatus = 'F'
        UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'O'
        UNION ALL SELECT * FROM orders WHERE o_orderstatus = 'F')
      SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS sum_price
      FROM u GROUP BY 1 ORDER BY 1"""))

  /** O-2/F-12 manual unpivot: spread monthly totals over fixed channel shares —
    * the reference's exact share constants (S1:957-969). */
  private[graft] val q12 = QuerySpec(
    "q12_union_shares",
    (s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("ym"))
        .agg(sum(col("o_totalprice")).as("total_cost"))
      ChannelOps.spreadByShares(monthly, "total_cost", Seq(
          "EHR" -> 0.39, "3RD_PARTY_EMAIL" -> 0.22, "POC" -> 0.06,
          "DISPLAY" -> 0.08, "VIDEO" -> 0.08, "CUSTOM" -> 0.01))
        .select(col("ym"), col("channel"), round(col("cost"), 2).as("cost"))
        .orderBy(col("ym"), col("channel"))
    },
    Some("""WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y%m') AS ym,
          sum(o_totalprice) AS total_cost
        FROM orders GROUP BY 1),
      spread AS (
        SELECT ym, 'EHR' AS channel, total_cost * 0.39 AS cost FROM monthly
        UNION ALL SELECT ym, '3RD_PARTY_EMAIL', total_cost * 0.22 FROM monthly
        UNION ALL SELECT ym, 'POC', total_cost * 0.06 FROM monthly
        UNION ALL SELECT ym, 'DISPLAY', total_cost * 0.08 FROM monthly
        UNION ALL SELECT ym, 'VIDEO', total_cost * 0.08 FROM monthly
        UNION ALL SELECT ym, 'CUSTOM', total_cost * 0.01 FROM monthly)
      SELECT ym, channel, round(cost, 2) AS cost
      FROM spread ORDER BY ym, channel"""))

  /** A-3/F-11 conditional aggregation (pivot-by-CASE, no ELSE → NULL;
    * S1:698-699,834-835). */
  private[graft] val q13 = QuerySpec(
    "q13_case_pivot",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        round(ChannelOps.pivotMetric(col("event_type"), col("value"), "click"), 2).as("reach"),
        round(ChannelOps.pivotMetric(col("event_type"), col("value"), "purchase"), 2).as("engage"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id,
      round(sum(CASE WHEN event_type = 'click' THEN CAST(value AS DOUBLE) END), 2) AS reach,
      round(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DOUBLE) END), 2) AS engage,
      count(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** A-4/A-5 SELECT DISTINCT dedup projection (S1:245-248). */
  private[graft] val q14 = QuerySpec(
    "q14_distinct",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey")),
    Some("""SELECT DISTINCT c_mktsegment, c_nationkey
      FROM customer ORDER BY 1, 2"""))

  /** A-9/A-6 aggregate-of-aggregate joined back to detail for a ratio — the
    * reference's groupBy+join allocation twin (S1:650-675,993-1002). */
  private[graft] val q15 = QuerySpec(
    "q15_agg_of_agg",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("ym", date_format(col("o_orderdate"), "yyyyMM"))
      val monthly = ChannelOps.withGroupTotal(
        o.select(col("ym"), col("o_orderstatus"), col("o_totalprice")),
        "o_totalprice", Seq("ym"))
      monthly.groupBy(col("ym"), col("o_orderstatus"))
        .agg(
          round(sum(col("o_totalprice") / col("total_o_totalprice")), 6).as("share"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("ym"), col("o_orderstatus"))
    },
    Some("""WITH o AS (
        SELECT strftime(o_orderdate, '%Y%m') AS ym, o_orderstatus, o_totalprice
        FROM orders),
      monthly AS (SELECT ym, sum(o_totalprice) AS total FROM o GROUP BY 1)
      SELECT o.ym, o_orderstatus,
        round(sum(o_totalprice / total), 6) AS share,
        max(o_totalprice) AS max_price
      FROM o JOIN monthly ON o.ym = monthly.ym
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** F-1..F-10 scalar-function sweep: substring/cast/replace-money/upper/
    * coalesce/concat/date_format/to_date/add_months (S1:287,582,717). */
  private[graft] val q16 = QuerySpec(
    "q16_scalar_funcs",
    (s, dir) => t(s, dir, "orders")
      .where(col("o_orderkey") <= 50)
      // a deterministic thousands-separated money string, built with integer
      // ops only (identical in the oracle), then parsed back (F-3 semantics)
      .withColumn("n", col("o_orderkey") * 1234 + 567)
      .withColumn("money_str", concat(
        expr("n div 1000").cast("string"), lit(","),
        lpad((col("n") % 1000).cast("string"), 3, "0"), lit(".25")))
      .select(
        col("o_orderkey"),
        col("money_str"),
        ChannelOps.parseMoney(col("money_str")).as("money_parsed"),
        date_format(col("o_orderdate"), "yyyyMM").as("ym"),
        substring(date_format(col("o_orderdate"), "yyyyMM"), 1, 4).as("yr"),
        date_format(
          add_months(to_date(concat(substring(date_format(col("o_orderdate"), "yyyyMM"), 1, 4),
            lit("-01-01"))), 3),
          "yyyy-MM-dd").as("q2_start"),
        upper(col("o_orderpriority")).as("prio_upper"),
        coalesce(lit(null).cast("string"), col("o_orderstatus"), lit("?")).as("status_co"))
      .orderBy(col("o_orderkey")),
    Some("""WITH src AS (
        SELECT *, o_orderkey * 1234 + 567 AS n FROM orders WHERE o_orderkey <= 50)
      SELECT o_orderkey,
      CAST(n // 1000 AS VARCHAR) || ',' || lpad(CAST(n % 1000 AS VARCHAR), 3, '0') || '.25' AS money_str,
      CAST(replace(CAST(n // 1000 AS VARCHAR) || ',' || lpad(CAST(n % 1000 AS VARCHAR), 3, '0') || '.25',
        ',', '') AS DOUBLE) AS money_parsed,
      strftime(o_orderdate, '%Y%m') AS ym,
      substring(strftime(o_orderdate, '%Y%m'), 1, 4) AS yr,
      strftime(CAST(strptime(substring(strftime(o_orderdate, '%Y%m'), 1, 4) || '-01-01',
        '%Y-%m-%d') AS DATE) + to_months(3), '%Y-%m-%d') AS q2_start,
      upper(o_orderpriority) AS prio_upper,
      coalesce(CAST(NULL AS VARCHAR), o_orderstatus, '?') AS status_co
      FROM src ORDER BY o_orderkey"""))

  /** F-13 resolution: week-of-year bucket → month via the Spark-dialect twin
    * (S1:717), replacing the Athena-dialect original (S1:853). */
  private[graft] val q17 = QuerySpec(
    "q17_week_to_month",
    (s, dir) => t(s, dir, "lineitem")
      .withColumn("yrwk",
        (year(col("l_shipdate")) * 100 + weekofyear(col("l_shipdate"))).cast("long"))
      .withColumn("month_bucket",
        date_format(ChannelOps.weekToMonth(col("yrwk")), "yyyy-MM"))
      .groupBy(col("month_bucket"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("month_bucket")),
    Some("""WITH wk AS (
        SELECT CAST(year(l_shipdate) * 100 + weekofyear(l_shipdate) AS BIGINT) AS yrwk,
          l_quantity
        FROM lineitem),
      bucketed AS (
        SELECT strftime(
          CAST(strptime(substring(CAST(yrwk AS VARCHAR), 1, 4) || '-01-01', '%Y-%m-%d') AS DATE)
            + to_months(CAST(floor((CAST(substring(CAST(yrwk AS VARCHAR), 5, 2) AS INT) - 1) / 4.0) AS INT)),
          '%Y-%m') AS month_bucket, l_quantity
        FROM wk)
      SELECT month_bucket, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
      FROM bucketed GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------- extensions: dedup

  /** Exact dedup by content hash (scale path: hash groupBy, 1 shuffle). */
  private[graft] val q18 = QuerySpec(
    "q18_dedup_exact",
    (s, dir) => Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("content_hash")),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
      count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** The minhash-LSH candidate CTE chain (ends in `cand`), shared by the q19
    * oracle and the q57 cluster-closure oracle. */
  private[graft] def minhashCtes(numHashes: Int, bands: Int): String = {
    val rowsPer = numHashes / bands
    val sigTerms = Hashing.minhashCoeffs(numHashes).map { case (a, b) =>
      s"list_min(list_transform(hh, h -> ($a * h + $b) % 2147483647))"
    }.mkString("[", ", ", "]")
    s"""toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      sh AS (SELECT doc_id,
        list_transform(range(1, greatest(len(t) - 2, 1) + 1),
          i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS shs FROM toks),
      hs AS (SELECT doc_id,
        list_transform(shs, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hh
        FROM sh),
      sig AS (SELECT doc_id, $sigTerms AS sig FROM hs),
      bands AS (SELECT doc_id, sig, b.band_idx,
          md5(array_to_string(list_slice(sig, b.band_idx * $rowsPer + 1,
            b.band_idx * $rowsPer + $rowsPer), ',')) AS band_hash
        FROM sig, (SELECT unnest(range(0, $bands)) AS band_idx) b),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(len(list_filter(range(1, $numHashes + 1),
            i -> a.sig[i] = b.sig[i])) AS DOUBLE) / $numHashes AS est_jaccard
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.doc_id < b.doc_id)"""
  }

  private[graft] def minhashOracle(numHashes: Int, bands: Int): String =
    s"""WITH ${minhashCtes(numHashes, bands)}
      SELECT id_a, id_b, est_jaccard FROM cand ORDER BY id_a, id_b"""

  /** MinHash + LSH near-dup candidates: per-row signatures (narrow, no
    * explode), band-bucket self-join (shuffle only on band hash). */
  private[graft] val q19 = QuerySpec(
    "q19_dedup_minhash",
    (s, dir) => Dedup.minhashCandidates(
        t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16)
      .orderBy(col("id_a"), col("id_b")),
    Some(minhashOracle(numHashes = 32, bands = 16)))

  private[graft] def simhashOracleExpr(hashListCol: String): String =
    (0 until Dedup.SimhashBits).map { b =>
      s"(CASE WHEN list_sum(list_transform($hashListCol, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)"
    }.mkString(" + ")

  /** SimHash signatures (explode → codegen'd hash → bit-sum aggregate). */
  private[graft] val q20 = QuerySpec(
    "q20_dedup_simhash",
    (s, dir) => Dedup.simhashSigs(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH th AS (SELECT doc_id,
        list_transform(str_split(text, ' '),
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hh
      FROM documents)
      SELECT doc_id, ${simhashOracleExpr("hh")} AS simhash
      FROM th ORDER BY doc_id"""))

  /** n-gram Jaccard near-dup pairs via inverted-index self-join with a
    * doc-frequency cut (the skew guard at scale). */
  private[graft] val q21 = QuerySpec(
    "q21_dedup_ngram_jaccard",
    (s, dir) => Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.1, maxDocFreq = 20)
      .select(col("id_a"), col("id_b"), col("shared"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
          list_transform(range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
            i -> array_to_string(list_slice(str_split(text, ' '), i, i + 2), ' ')),
          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647))) AS sh
        FROM documents),
      filt AS (SELECT doc_id, sh FROM (
          SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh)
        WHERE df <= 20),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM filt GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM filt a JOIN filt b ON a.sh = b.sh
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      SELECT id_a, id_b, shared,
        round(CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.1
      ORDER BY id_a, id_b"""))

  // -------------------------------------------- extensions: similarity

  /** Brute-force exact cosine top-k (broadcast queries; fp-identical to the
    * oracle because both widen to double and left-fold in index order). */
  private[graft] val q22 = QuerySpec(
    "q22_ann_bruteforce",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 8), k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 8),
      c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      scored AS (SELECT query_id, neighbor_id,
          list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i]),
            (x, y) -> x + y) /
          (sqrt(list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]),
            (x, y) -> x + y)) *
           sqrt(list_reduce(list_transform(range(1, len(cv) + 1), i -> cv[i] * cv[i]),
            (x, y) -> x + y))) AS cosine
        FROM c, q WHERE query_id <> neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Embedding near-dup pairs above a cosine threshold. Runs over
    * [[seededEmb]] (the corpus plus two literal seed vectors at cosine
    * 1/sqrt(2)) so the gate is non-vacuous at every sf — the sf0.01
    * corpus has no natural >=0.6 pair under vec_id < 32. */
  private[graft] val q23 = QuerySpec(
    "q23_embedding_neardup",
    (s, dir) => {
      val emb = seededEmb(s, dir)
      Similarity.thresholdPairs(emb, emb.where(col("vec_id") < 32), minCosine = 0.6)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    },
    Some(s"""WITH emb AS ($seededEmbSql),
      q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM emb WHERE vec_id < 32),
      c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM emb),
      scored AS (SELECT query_id, neighbor_id,
          list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i]),
            (x, y) -> x + y) /
          (sqrt(list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]),
            (x, y) -> x + y)) *
           sqrt(list_reduce(list_transform(range(1, len(cv) + 1), i -> cv[i] * cv[i]),
            (x, y) -> x + y))) AS cosine
        FROM c, q WHERE query_id < neighbor_id)
      SELECT query_id, neighbor_id, round(cosine, 6) AS cosine
      FROM scored WHERE cosine >= 0.6 ORDER BY query_id, neighbor_id"""))

  // ------------------------------------------- extensions: text analysis

  /** Token counts, ratios, composite quality score. */
  /** The DuckDB mirror of [[TextAnalysis.qualityScore]] — the exact text
    * q24 inlines (kept verbatim there); q69 reuses it as the gate's score.
    * The inner CASTs force DOUBLE so DuckDB's DECIMAL literals never drive
    * the arithmetic. */
  private[graft] val QualityScoreSql: String = """round(
        0.4 * least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (CASE WHEN (CAST(list_sum(list_transform(str_split(text, ' '), x -> len(x))) AS DOUBLE)
            / greatest(len(str_split(text, ' ')), 1)) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0))
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0)), 6)"""

  private[graft] val q24 = QuerySpec(
    "q24_text_stats",
    (s, dir) => t(s, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        round(TextAnalysis.avgWordLength(col("text")), 6).as("avg_word_len"),
        round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
      len(str_split(text, ' ')) AS n_tokens,
      CAST(len(regexp_extract_all(text, '${TextAnalysis.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe,
      round(CAST(list_sum(list_transform(str_split(text, ' '), x -> len(x))) AS DOUBLE)
        / greatest(len(str_split(text, ' ')), 1), 6) AS avg_word_len,
      round(CAST(len(list_filter(str_split(text, ' '),
          t -> list_contains(['the','a','of','and','to','in','is','it','for','on'], t))) AS DOUBLE)
        / greatest(len(str_split(text, ' ')), 1), 6) AS stopword_ratio,
      round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio,
      round(
        0.4 * least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (CASE WHEN (CAST(list_sum(list_transform(str_split(text, ' '), x -> len(x))) AS DOUBLE)
            / greatest(len(str_split(text, ' ')), 1)) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0))
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0)), 6) AS quality
      FROM documents ORDER BY doc_id"""))

  /** Heuristic language ID via per-language function-word hits. */
  private[graft] val q25 = QuerySpec(
    "q25_lang_id",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val hits = TextAnalysis.StopwordsByLang.map { case (lang, ws) =>
        TextAnalysis.stopwordHits(col("text"), ws).cast("long").as(s"${lang}_hits")
      }
      d.select((Seq(col("doc_id"), TextAnalysis.langIdGuess(col("text")).as("lang_guess"))
        ++ hits): _*).orderBy(col("doc_id"))
    },
    Some {
      val hitExpr = TextAnalysis.StopwordsByLang.map { case (lang, ws) =>
        val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
        s"CAST(len(list_filter(str_split(text, ' '), t -> list_contains($list, t))) AS BIGINT) AS ${lang}_hits"
      }.mkString(",\n        ")
      val langs = TextAnalysis.StopwordsByLang.map(_._1)
      val bestExpr = langs.map(l => s"${l}_hits").reduce((a, b) => s"greatest($a, $b)")
      val caseArms = langs.map(l => s"WHEN ${l}_hits = best THEN '$l'").mkString(" ")
      s"""WITH hits AS (SELECT doc_id, $hitExpr FROM documents),
      scored AS (SELECT *, $bestExpr AS best FROM hits)
      SELECT doc_id,
        CASE WHEN best <= 0 THEN 'unknown' $caseArms ELSE 'unknown' END AS lang_guess,
        ${langs.map(l => s"${l}_hits").mkString(", ")}
      FROM scored ORDER BY doc_id"""
    })

  /** Order-sensitive rolling-hash document fingerprint. */
  private[graft] val q26 = QuerySpec(
    "q26_fingerprint",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CASE WHEN len(str_split(text, ' ')) = 0 THEN 0
        ELSE list_reduce(
          list_transform(str_split(text, ' '),
            t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 100003),
          (acc, x) -> (acc * 31 + x) % 1000000007)
      END AS fingerprint
      FROM documents ORDER BY doc_id"""))

  // ------------------------------------------- extensions: multimodal

  /** Binary-payload plumbing: opaque bytes + typed metadata through the
    * mapPartitions decode stub (SURVEY north-star; codec is stubbed, the
    * Spark-side schema/partitioning/batching is real). */
  private[graft] val q27 = QuerySpec(
    "q27_multimodal_meta",
    (s, dir) => {
      val media = Multimodal.fromDocuments(s, t(s, dir, "documents"))
      Multimodal.decode(media).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"), col("n_bytes"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id, 'image' AS kind,
      64 + (octet_length(encode(text)) % 577) AS width,
      64 + (octet_length(encode(text)) % 433) AS height,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents ORDER BY media_id"""))

  /** Tumbling-window event aggregation (the batch shape of the streaming agg;
    * Spark window() and DuckDB time_bucket share epoch-aligned boundaries). */
  private[graft] val q28 = QuerySpec(
    "q28_events_window",
    (s, dir) => t(s, dir, "events")
      // ts arrives as long nanos (nanosAsLong, see Sessions); `div` keeps the
      // µs conversion exact — a double division would lose precision at 2^60.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(
        window(col("ts"), "5 minutes").getField("start").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
        '%Y-%m-%d %H:%M') AS window_start,
      event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** LSH-bucketed ANN — the scale path for large query sets (q22 is the
    * broadcast baseline): sign-random-projection signature on both sides,
    * hash-join on the bucket (no cross join anywhere), exact cosine re-rank
    * inside buckets. Plane weights derive from stableHash so the oracle
    * reconstructs the identical signature in SQL. Approximate by design:
    * the oracle replays the same buckets, so results still match exactly. */
  private[graft] val q29 = {
    val planes = 6
    QuerySpec(
      "q29_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.where(col("vec_id") < 16), k = 5, numPlanes = planes)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH sig AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          list_reduce(list_transform(range(0, $planes), p ->
            CASE WHEN list_reduce(list_transform(range(1, len(embedding) + 1), i ->
                embedding[i]::DOUBLE *
                  ((('0x' || substr(md5(p::VARCHAR || '_' || (i - 1)::VARCHAR), 1, 15))::BIGINT
                    % 2147483647)::DOUBLE / 2147483647.0 - 0.5)),
              (x, y) -> x + y) >= 0 THEN 1 << p ELSE 0 END),
            (x, y) -> x + y) AS bucket
        FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM sig WHERE vec_id < 16),
      c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM sig),
      scored AS (SELECT query_id, neighbor_id,
          list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i]),
            (x, y) -> x + y) /
          (sqrt(list_reduce(list_transform(range(1, len(qv) + 1), i -> qv[i] * qv[i]),
            (x, y) -> x + y)) *
           sqrt(list_reduce(list_transform(range(1, len(cv) + 1), i -> cv[i] * cv[i]),
            (x, y) -> x + y))) AS cosine
        FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))
  }

  /** Gap-based sessionization in batch mode via the built-in session_window —
    * the batch twin of graft.streaming.EventStreams.sessionWindows (the same
    * operator runs under a watermark in streaming). Oracle: gaps-and-islands.
    * Spark merges events when the gap is STRICTLY below the threshold, so the
    * oracle starts a new session when diff >= gap. */
  private[graft] val q30 = QuerySpec(
    "q30_sessionize",
    (s, dir) => t(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        date_format(col("s.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("session_start")),
    Some("""WITH marked AS (SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      grp AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS sid FROM marked)
      SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM grp GROUP BY user_id, sid ORDER BY user_id, session_start"""))

  /** Skew-safe two-phase salted aggregation (ScaleOps) — result-identical to
    * a plain GROUP BY, which is exactly what the oracle checks: the salt
    * changes physical distribution only. */
  private[graft] val q31 = QuerySpec(
    "q31_skew_salted_agg",
    (s, dir) => {
      import graft.operators.ScaleOps
      ScaleOps.saltedSum(t(s, dir, "lineitem"), Seq("l_returnflag", "l_linestatus"),
          "l_quantity", salt = 8)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_l_quantity"), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** HyperLogLog++ approximate distinct — the one-pass fixed-memory
    * count(distinct) replacement at 100 TB. The estimate itself is
    * sketch-specific, so the VALUE oracle checks its error contract
    * instead: each group emits the exact count(distinct) twin (portable)
    * plus a flag asserting |est − exact| / exact ≤ 3·rsd, which DuckDB
    * reproduces as a literal — a Spark sketch drifting out of bound flips
    * the flag and fails the hash match. */
  private[graft] val q32 = QuerySpec(
    "q32_approx_distinct",
    (s, dir) => {
      import graft.operators.ScaleOps
      ScaleOps.approxDistinctChecked(
          t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", rsd = 0.05)
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_distinct_l_partkey,
        TRUE AS within_bound
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** q33's oracle, shared verbatim by the bucketed-index twin q216 (the
    * layouts produce identical results by construction). nlist=16,
    * nprobe=4, k=5. */
  private[graft] val annIvfOracle: String = {
    val nlist = 16
    val nprobe = 4
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    s"""WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cent_vec
          FROM embeddings WHERE vec_id < $nlist),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        assigned AS (SELECT neighbor_id, cv, cid FROM (
            SELECT neighbor_id, cv, cid,
              row_number() OVER (PARTITION BY neighbor_id
                ORDER BY ${cosSql("cv", "cent_vec")} DESC, cid) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 8),
        probes AS (SELECT query_id, qv, cid FROM (
            SELECT query_id, qv, cid,
              row_number() OVER (PARTITION BY query_id
                ORDER BY ${cosSql("qv", "cent_vec")} DESC, cid) AS rn
            FROM q CROSS JOIN cent) WHERE rn <= $nprobe),
        scored AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cosine
          FROM assigned JOIN probes USING (cid)
          WHERE query_id <> neighbor_id),
        ranked AS (SELECT query_id, neighbor_id, cosine,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** IVF ANN (the trained-partition scale path, q29's LSH sibling): cells by
    * deterministic seed centroids, query probes nprobe cells, exact re-rank
    * within. The oracle replays the identical assignment (same cosine fold,
    * same tie-break), so this approximate index is still value-checked. */
  private[graft] val q33 = QuerySpec(
    "q33_ann_ivf",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8), k = 5,
          nlist = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(annIvfOracle))

  /** Token-window chunking (context-window prep). Chunk arithmetic mirrored
    * exactly: step = 40, numChunks = max(1, ceil((n - 10) / 40)). */
  private[graft] val q34 = QuerySpec(
    "q34_doc_chunking",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.chunk(col("text"), chunkTokens = 50, overlap = 10)))
      .select(col("doc_id"), col("pos").as("chunk_idx"), col("col").as("chunk"))
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      chunks AS (SELECT doc_id,
          greatest(CAST(floor((len(t) - 10 + 39) / 40.0) AS INT), 1) AS nc, t
        FROM toks)
      SELECT doc_id, i AS chunk_idx,
        array_to_string(list_slice(t, i * 40 + 1, i * 40 + 50), ' ') AS chunk
      FROM chunks, (SELECT unnest(range(0, 200)) AS i) ix
      WHERE i < nc ORDER BY doc_id, chunk_idx"""))

  /** Deterministic hash sampling — reproducible across engines BY
    * CONSTRUCTION, which is exactly what the oracle proves: both engines
    * select the identical 10% of rows. */
  private[graft] val q35 = QuerySpec(
    "q35_hash_sample",
    (s, dir) => {
      import graft.operators.ScaleOps
      ScaleOps.hashSample(t(s, dir, "documents"), "doc_id", permille = 100)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        % 2147483647 % 1000 < 100
      ORDER BY doc_id"""))

  /** Batch twin of EventStreams.intervalJoin — a per-key time-range join
    * (click→view attribution shape). Equi on user_id, range on ts: Spark
    * plans a sort-merge join on the key with the range as a post-filter;
    * same shape DuckDB uses. Window kept tight to bound the pair count. */
  private[graft] val q36 = QuerySpec(
    "q36_interval_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // both sides derive from the same scan — alias-qualify the key or the
      // analyzer logs a "trivially true predicate" self-join warning while
      // disambiguating
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
        .alias("c")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
        .alias("v")
      clicks.join(views,
          col("c.user_id") === col("v.user_id") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 hours") &&
            col("v_ts") <= col("c_ts"))
        .select(col("click_id"), col("view_id"))
        .orderBy(col("click_id"), col("view_id"))
    },
    Some("""SELECT c.event_id AS click_id, v.event_id AS view_id
      FROM events c JOIN events v
        ON c.user_id = v.user_id
        AND c.event_type = 'click' AND v.event_type = 'view'
        AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL '2 hours'
        AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
      ORDER BY click_id, view_id"""))

  /** Hierarchical rollup + HAVING + exact count(distinct) — absent from the
    * reference (SURVEY §2.4 "Absent") but table stakes for an analytics
    * engine; one query closes all three. Rollup subtotals shuffle once with
    * partial aggregation per grouping set. */
  private[graft] val q37 = QuerySpec(
    "q37_rollup_having",
    (s, dir) => t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .where(col("n_orders") >= 10)
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("n_custs"), col("sum_price"))
      .orderBy(col("status"), col("priority")),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n_orders,
        count(DISTINCT o_custkey) AS n_custs,
        round(sum(o_totalprice), 2) AS sum_price
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      HAVING count(*) >= 10
      ORDER BY status, priority"""))

  /** Native long→wide pivot (the idiomatic alternative to q13's
    * conditional-aggregation pivot; values pinned so the output schema is
    * static and plannable). */
  private[graft] val q38 = QuerySpec(
    "q38_native_pivot",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id") % 100 as "user_bucket")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(round(sum(col("value")), 2))
      .na.fill(0.0, Seq("click", "view", "purchase"))
      .orderBy(col("user_bucket")),
    Some("""SELECT user_id % 100 AS user_bucket,
        coalesce(round(sum(CASE WHEN event_type = 'click' THEN value END), 2), 0.0) AS click,
        coalesce(round(sum(CASE WHEN event_type = 'view' THEN value END), 2), 0.0) AS view,
        coalesce(round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2), 0.0) AS purchase
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Ordered analytic windows: row_number / rank / lag — the ORDER BY window
    * family the reference never used (its two windows are unordered
    * partition totals, W-1/W-2). Top-3 orders per status with the price gap
    * to the previous order. */
  private[graft] val q39 = QuerySpec(
    "q39_ranking_windows",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("gap"))
        .where(col("rn") <= 3)
        .select(col("o_orderstatus"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("gap"))
        .orderBy(col("o_orderstatus"), col("rn"))
    },
    Some("""WITH ranked AS (SELECT o_orderstatus, o_orderkey, o_totalprice,
        row_number() OVER w AS rn,
        round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS gap
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey))
      SELECT o_orderstatus, rn, o_orderkey, round(o_totalprice, 2) AS price, gap
      FROM ranked WHERE rn <= 3 ORDER BY o_orderstatus, rn"""))

  /** JSON extraction from the events payload column (semi-structured props →
    * typed value), aggregated per event type. Schema-on-read JSON is table
    * stakes for event pipelines; `get_json_object` stays codegen'd. */
  private[graft] val q40 = QuerySpec(
    "q40_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Semi + anti joins (existence tests without row multiplication — the
    * shape CurationJob's near-dup removal uses). Per nation: customers WITH
    * orders (semi) and WITHOUT (anti); neither side duplicates customers no
    * matter how many orders match. */
  private[graft] val q41 = QuerySpec(
    "q41_semi_anti_join",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val orders = t(s, dir, "orders").select(col("o_custkey"))
      val withO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
      val withoutO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))
      withO.join(withoutO, Seq("c_nationkey"), "full")
        .select(col("c_nationkey"),
          coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
          coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
        .orderBy(col("c_nationkey"))
    },
    Some("""WITH w AS (SELECT c_nationkey, count(*) AS n_with_orders
        FROM customer c WHERE EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1),
      wo AS (SELECT c_nationkey, count(*) AS n_without_orders
        FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1)
      SELECT c_nationkey,
        coalesce(n_with_orders, 0) AS n_with_orders,
        coalesce(n_without_orders, 0) AS n_without_orders
      FROM w FULL JOIN wo USING (c_nationkey)
      ORDER BY c_nationkey"""))

  /** As-of (backward) join — each purchase matched to the user's most recent
    * click at-or-before it. Spark side is [[AsofJoin.backward]] (union +
    * one sort + carry-forward window, no range explosion); DuckDB has the
    * operator natively (`ASOF LEFT JOIN`), which makes it a true
    * cross-engine semantic check. Right side pre-aggregated per (user, ts)
    * — both engines need the same-instant winner pinned. */
  private[graft] val q42 = QuerySpec(
    "q42_asof_join",
    (s, dir) => {
      import graft.operators.AsofJoin
      val ev = t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(round(max(col("value")), 2).as("click_value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          round(col("value"), 2).as("purchase_value"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          col("asof_click_value").as("click_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH clicks AS (SELECT user_id, ts, round(max(value), 2) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      p AS (SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        round(p.value, 2) AS purchase_value,
        strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        c.click_value
      FROM p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** The simhash band-pair CTEs shared by q43/q49 oracles: signatures (as in
    * q20), band slices as join keys, distinct candidates with exact hamming. */
  private[graft] def simhashPairsSql(maxHamming: Int, bands: Int): String = {
    val width = Dedup.SimhashBits / bands
    val mask = (1L << width) - 1
    s"""th AS (SELECT doc_id, list_transform(str_split(text, ' '),
          t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hh FROM documents),
      sig AS (SELECT doc_id, ${simhashOracleExpr("hh")} AS s FROM th),
      banded AS (SELECT doc_id, s, b AS band_idx,
          (s >> (b * $width)) & $mask AS band_val
        FROM sig, range(0, $bands) AS t(b)),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
            AND a.doc_id < b.doc_id),
      close_pairs AS (SELECT id_a, id_b, hamming FROM pairs
        WHERE hamming <= $maxHamming)"""
  }

  /** Connected components over near-dup candidate edges — the transitive
    * closure that turns pairwise similarity into duplicate CLUSTERS
    * (A~B, B~C ⇒ one cluster even though A,C never paired). Spark side is
    * iterative min-label propagation ([[graft.operators.Components]]) over
    * simhash band pairs (the cheapest edge generator — see q49); oracle is
    * a recursive-CTE reachability closure over the same edge set. */
  private[graft] val q43 = QuerySpec(
    "q43_components",
    (s, dir) => {
      import graft.operators.Components
      val edges = Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 1, bands = 2)
      Components.connectedComponents(edges, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${simhashPairsSql(maxHamming = 1, bands = 2)},
      und AS (SELECT id_a AS a, id_b AS b FROM close_pairs
        UNION SELECT id_b, id_a FROM close_pairs),
      walk(id, comp) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.a, w.comp FROM und u JOIN walk w ON w.id = u.b)
      SELECT id AS doc_id, min(comp) AS component
      FROM walk GROUP BY 1 ORDER BY 1"""))

  /** PII redaction (emails / phones / IPv4 → tags) before corpus admission.
    * The documents corpus is synthetic word soup, so the PII is planted
    * deterministically from row fields by BOTH engines, then scrubbed —
    * verifying the patterns byte-for-byte, not just "something changed". */
  private[graft] val q44 = QuerySpec(
    "q44_pii_redact",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), concat(
          lit("contact u"), col("doc_id").cast("string"),
          lit("@mail.example.org or "),
          lpad((col("n_chars") % 800).cast("string"), 3, "0"),
          lit("-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" at 10.0."), (col("doc_id") % 256).cast("string"),
          lit("."), (col("n_chars") % 256).cast("string"),
          lit(" re: "), substring(col("text"), 1, 48)).as("raw"))
      .select(col("doc_id"), TextAnalysis.redactPii(col("raw")).as("clean"))
      .orderBy(col("doc_id")),
    Some("""WITH raw AS (SELECT doc_id,
        'contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.org or ' ||
        lpad(CAST(n_chars % 800 AS VARCHAR), 3, '0') || '-555-' ||
        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        '.' || CAST(n_chars % 256 AS VARCHAR) ||
        ' re: ' || substr(text, 1, 48) AS raw
      FROM documents)
      SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(raw,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g'),
        '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS clean
      FROM raw ORDER BY doc_id"""))

  /** CUBE subtotals + grouping_id — the full subtotal lattice in one pass
    * (Spark expands grouping sets before the shuffle; partial aggregation
    * still applies). First grouping column is the grouping_id MSB in both
    * engines. */
  private[graft] val q45 = QuerySpec(
    "q45_cube_grouping",
    (s, dir) => t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("n"), col("sum_price"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some("""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        o_orderstatus, o_orderpriority,
        count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** Fuzzy near-dup pairs by edit distance with blocking — Spark's three-arg
    * levenshtein abandons the DP early past the cap; the oracle filters the
    * plain distance. Blocked on (lang, source) PLUS a 16-char content band
    * (prefix blocking): attribute blocks alone have bounded cardinality, so
    * their sizes — and pair counts, quadratically — grow with the corpus
    * (measured 65× time at 10× corpus); content bands grow in number
    * instead, keeping block sizes bounded by true near-dup density. */
  private[graft] val q46 = QuerySpec(
    "q46_fuzzy_edit_pairs",
    (s, dir) => Dedup.editDistancePairs(t(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang", "source"), prefixLen = 60, maxDist = 40,
        bandChars = 16)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH n AS (SELECT doc_id, lang, source, substr(text, 1, 60) AS pfx
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(levenshtein(a.pfx, b.pfx) AS INT) AS dist
      FROM n a JOIN n b ON a.lang = b.lang AND a.source = b.source
        AND substr(a.pfx, 1, 16) = substr(b.pfx, 1, 16)
      WHERE a.doc_id < b.doc_id AND levenshtein(a.pfx, b.pfx) <= 40
      ORDER BY id_a, id_b"""))

  /** Stratified deterministic sampling — per-language mixing ratios over one
    * shared hash (the data-mixing primitive). Both engines select the
    * identical row set, like q35 but with a per-stratum CASE rate. */
  private[graft] val q47 = QuerySpec(
    "q47_stratified_sample",
    (s, dir) => {
      import graft.operators.ScaleOps
      ScaleOps.stratifiedHashSample(t(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 100, "de" -> 500, "fr" -> 500), defaultPermille = 1000)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        % 2147483647 % 1000 <
        (CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500 WHEN 'fr' THEN 500
          ELSE 1000 END)
      ORDER BY doc_id"""))

  /** Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    * `quantile_cont`: pos = p·(n−1), linear interpolation — the shared
    * definition makes them value-comparable). The exact form is a
    * sort-per-group; at 100 TB swap in approx_percentile (t-digest sketch,
    * one pass, mergeable) once rank error tolerance is specified. */
  private[graft] val q48 = QuerySpec(
    "q48_percentiles",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type,
        round(quantile_cont(value, 0.25), 4) AS p25,
        round(quantile_cont(value, 0.5), 4) AS p50,
        round(quantile_cont(value, 0.75), 4) AS p75,
        round(quantile_cont(value, 0.95), 4) AS p95
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** SimHash banded near-dup pairs (q20 emits signatures; this emits the
    * PAIRS) — band slices as join keys give exact recall for
    * hamming < bands by pigeonhole; the only shuffled payload is
    * (id, one long). The cheapest candidate generator in the dedup family
    * and the edge source for q43's clustering. */
  private[graft] val q49 = QuerySpec(
    "q49_simhash_pairs",
    (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 1, bands = 2)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH ${simhashPairsSql(maxHamming = 1, bands = 2)}
      SELECT id_a, id_b, hamming FROM close_pairs ORDER BY id_a, id_b"""))

  /** INTERSECT / EXCEPT set operations (SURVEY O-5 — absent from the
    * reference, table stakes for the engine). Both plan as aggregates +
    * joins on the key, so partial aggregation and AQE apply as usual;
    * distinct set semantics in both engines. */
  private[graft] val q50 = QuerySpec(
    "q50_set_ops",
    (s, dir) => {
      val orders = t(s, dir, "orders")
      val f = orders.where(col("o_orderstatus") === "F").select(col("o_custkey"))
      val o = orders.where(col("o_orderstatus") === "O").select(col("o_custkey"))
      val both = f.intersect(o).withColumn("segment", lit("both"))
      val fOnly = f.except(o).withColumn("segment", lit("f_only"))
      val oOnly = o.except(f).withColumn("segment", lit("o_only"))
      both.union(fOnly).union(oOnly)
        .groupBy(col("segment")).agg(count(lit(1)).as("n_customers"))
        .orderBy(col("segment"))
    },
    Some("""WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        seg AS (
          SELECT o_custkey, 'both' AS segment FROM (SELECT * FROM f INTERSECT SELECT * FROM o)
          UNION ALL
          SELECT o_custkey, 'f_only' FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
          UNION ALL
          SELECT o_custkey, 'o_only' FROM (SELECT * FROM o EXCEPT SELECT * FROM f))
      SELECT segment, count(*) AS n_customers
      FROM seg GROUP BY 1 ORDER BY 1"""))

  /** Benchmark decontamination — corpus docs leaking n-grams from a held-out
    * reference set (here: every 97th doc plays the benchmark) are flagged
    * with their overlap count. Inverted-index semi-join keyed on the
    * shingle; reference side contributes only its distinct shingle set. */
}
