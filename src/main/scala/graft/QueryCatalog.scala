package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** The correctness-gate catalog: one named query per operator family from
  * SURVEY.md §2 plus the training-data-pipeline extensions, each paired with
  * DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism contract with the oracle:
  *  - every query ORDER BYs its full key set, in both engines;
  *  - aggregate doubles are rounded: inputs with fixed decimals (prices,
  *    discounts) at 2dp (fp noise ≪ half-ulp of the decimal grid), free reals
  *    at 4-6dp;
  *  - hashes/fingerprints use [[Hashing.stableHash]] (md5-derived) so both
  *    engines compute identical integers;
  *  - vector math widens float→double first and left-folds in index order in
  *    both engines, so cosines match bit-for-bit (ranking ties impossible to
  *    diverge);
  *  - counts are BIGINT in the oracle (DuckDB sum(int) is HUGEINT otherwise).
  */
object QueryCatalog {

  final case class QuerySpec(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.EventTs.toNanos(s.read.parquet(s"$dir/$name.parquet"))

  // ---------------------------------------------------------------- core §2

  /** A-1/A-2/A-7 group-by + SUM/COUNT (the reference's final_agg shape). */
  private val q01 = QuerySpec(
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
  private val q02 = QuerySpec(
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
  private val q03 = QuerySpec(
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
  private val q04 = QuerySpec(
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
  private val q05 = QuerySpec(
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
  private val q06 = QuerySpec(
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
  private val q07 = QuerySpec(
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
  private val q08 = QuerySpec(
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
  private val q09 = QuerySpec(
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
  private val q10 = QuerySpec(
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
  private val q11 = QuerySpec(
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
  private val q12 = QuerySpec(
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
  private val q13 = QuerySpec(
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
  private val q14 = QuerySpec(
    "q14_distinct",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey")).distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey")),
    Some("""SELECT DISTINCT c_mktsegment, c_nationkey
      FROM customer ORDER BY 1, 2"""))

  /** A-9/A-6 aggregate-of-aggregate joined back to detail for a ratio — the
    * reference's groupBy+join allocation twin (S1:650-675,993-1002). */
  private val q15 = QuerySpec(
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
  private val q16 = QuerySpec(
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
  private val q17 = QuerySpec(
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
  private val q18 = QuerySpec(
    "q18_dedup_exact",
    (s, dir) => Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("content_hash")),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
      count(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** The minhash-LSH candidate CTE chain (ends in `cand`), shared by the q19
    * oracle and the q57 cluster-closure oracle. */
  private def minhashCtes(numHashes: Int, bands: Int): String = {
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

  private def minhashOracle(numHashes: Int, bands: Int): String =
    s"""WITH ${minhashCtes(numHashes, bands)}
      SELECT id_a, id_b, est_jaccard FROM cand ORDER BY id_a, id_b"""

  /** MinHash + LSH near-dup candidates: per-row signatures (narrow, no
    * explode), band-bucket self-join (shuffle only on band hash). */
  private val q19 = QuerySpec(
    "q19_dedup_minhash",
    (s, dir) => Dedup.minhashCandidates(
        t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 16)
      .orderBy(col("id_a"), col("id_b")),
    Some(minhashOracle(numHashes = 32, bands = 16)))

  private def simhashOracleExpr(hashListCol: String): String =
    (0 until Dedup.SimhashBits).map { b =>
      s"(CASE WHEN list_sum(list_transform($hashListCol, h -> ((h >> $b) & 1) * 2 - 1)) > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END)"
    }.mkString(" + ")

  /** SimHash signatures (explode → codegen'd hash → bit-sum aggregate). */
  private val q20 = QuerySpec(
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
  private val q21 = QuerySpec(
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
  private val q22 = QuerySpec(
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

  /** Embedding near-dup pairs above a cosine threshold. */
  private val q23 = QuerySpec(
    "q23_embedding_neardup",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.thresholdPairs(emb, emb.where(col("vec_id") < 32), minCosine = 0.6)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 32),
      c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
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
  private val QualityScoreSql: String = """round(
        0.4 * least(CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
        + 0.3 * (CASE WHEN (CAST(list_sum(list_transform(str_split(text, ' '), x -> len(x))) AS DOUBLE)
            / greatest(len(str_split(text, ' ')), 1)) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0))
        + 0.15 * (1.0 - least(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
            / greatest(length(text), 1) * 4.0, 1.0)), 6)"""

  private val q24 = QuerySpec(
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
  private val q25 = QuerySpec(
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
  private val q26 = QuerySpec(
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
  private val q27 = QuerySpec(
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
  private val q28 = QuerySpec(
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
  private val q29 = {
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
  private val q30 = QuerySpec(
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
  private val q31 = QuerySpec(
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
  private val q32 = QuerySpec(
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

  /** IVF ANN (the trained-partition scale path, q29's LSH sibling): cells by
    * deterministic seed centroids, query probes nprobe cells, exact re-rank
    * within. The oracle replays the identical assignment (same cosine fold,
    * same tie-break), so this approximate index is still value-checked. */
  private val q33 = {
    val (nlist, nprobe) = (16, 4)
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q33_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.where(col("vec_id") < 8), k = 5,
            nlist = nlist, nprobe = nprobe)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cent_vec
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
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))
  }

  /** Token-window chunking (context-window prep). Chunk arithmetic mirrored
    * exactly: step = 40, numChunks = max(1, ceil((n - 10) / 40)). */
  private val q34 = QuerySpec(
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
  private val q35 = QuerySpec(
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
  private val q36 = QuerySpec(
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
  private val q37 = QuerySpec(
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
  private val q38 = QuerySpec(
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
  private val q39 = QuerySpec(
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
  private val q40 = QuerySpec(
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
  private val q41 = QuerySpec(
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
  private val q42 = QuerySpec(
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
  private def simhashPairsSql(maxHamming: Int, bands: Int): String = {
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
  private val q43 = QuerySpec(
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
  private val q44 = QuerySpec(
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
  private val q45 = QuerySpec(
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
  private val q46 = QuerySpec(
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
  private val q47 = QuerySpec(
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
  private val q48 = QuerySpec(
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
  private val q49 = QuerySpec(
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
  private val q50 = QuerySpec(
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
  private val q51 = QuerySpec(
    "q51_decontaminate",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val ref = docs.where(col("doc_id") % 97 === 0)
      val corpus = docs.where(col("doc_id") % 97 =!= 0)
      Dedup.contaminatedIds(corpus, "doc_id", "text", ref, "text",
          n = 3, minShared = 3, maxDocFreq = 1000)
        .select(col("id").as("doc_id"), col("shared_ngrams"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
          list_transform(range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
            i -> array_to_string(list_slice(str_split(text, ' '), i, i + 2), ' ')),
          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647))) AS sh
        FROM documents),
      corpus AS (SELECT doc_id, sh FROM (
          SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df
          FROM sh WHERE doc_id % 97 <> 0)
        WHERE df <= 1000),
      ref AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
      SELECT doc_id, count(*) AS shared_ngrams
      FROM corpus JOIN ref USING (sh)
      GROUP BY 1 HAVING count(*) >= 3 ORDER BY 1"""))

  /** Native wide→long unpivot (melt) — the inverse of q38's pivot, and the
    * built-in replacement for the reference's union-as-unpivot idiom (O-2,
    * q12): one Expand node, no N-way union of scans. */
  private val q52 = QuerySpec(
    "q52_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"),
        round(sum(col("l_extendedprice")), 2).as("price"),
        round(sum(col("l_discount")), 2).as("disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")), "metric", "value")
      .orderBy(col("l_returnflag"), col("metric")),
    Some("""WITH w AS (SELECT l_returnflag,
        round(sum(l_quantity), 2) AS qty,
        round(sum(l_extendedprice), 2) AS price,
        round(sum(l_discount), 2) AS disc
      FROM lineitem GROUP BY 1)
      SELECT l_returnflag, metric, value
      FROM w UNPIVOT (value FOR metric IN (qty, price, disc))
      ORDER BY l_returnflag, metric"""))

  /** Time-series gap-fill with last-observation-carried-forward: per-user
    * hourly buckets densified via sequence+explode (no driver loop, no
    * cross join with a calendar table — each user generates only its own
    * range), observed bucket averages filled forward with an ignoreNulls
    * last() window. The standard resample primitive for feature pipelines. */
  private val q53 = QuerySpec(
    "q53_gapfill_locf",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .where(col("user_id") < 20)
      val hourly = ev.groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("h"))
        .agg(round(avg(col("value")), 4).as("avg_value"))
      val spans = hourly.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val dense = spans.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 hour"))).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      dense.join(hourly, Seq("user_id", "h"), "left")
        .select(col("user_id"),
          date_format(col("h"), "yyyy-MM-dd HH:mm").as("hour"),
          last(col("avg_value"), ignoreNulls = true).over(w).as("value_locf"),
          col("avg_value").isNotNull.as("observed"))
        .orderBy(col("user_id"), col("hour"))
    },
    Some("""WITH ev AS (SELECT user_id, date_trunc('hour', ts) AS h,
          round(avg(value), 4) AS avg_value
        FROM events WHERE user_id < 20 GROUP BY 1, 2),
      spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM ev GROUP BY 1),
      dense AS (SELECT user_id, unnest(generate_series(h0, h1,
          INTERVAL 1 HOUR)) AS h FROM spans),
      joined AS (SELECT d.user_id, d.h, e.avg_value
        FROM dense d LEFT JOIN ev e ON d.user_id = e.user_id AND d.h = e.h)
      SELECT user_id, strftime(h, '%Y-%m-%d %H:%M') AS hour,
        last_value(avg_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
          ROWS UNBOUNDED PRECEDING) AS value_locf,
        avg_value IS NOT NULL AS observed
      FROM joined ORDER BY user_id, hour"""))

  /** Schema-on-read JSON into a typed struct via from_json (q40 plucks one
    * path with get_json_object; this materializes the declared schema once
    * and reads fields as columns — the right shape when several fields are
    * consumed). */
  private val q54 = QuerySpec(
    "q54_from_json_struct",
    (s, dir) => t(s, dir, "events")
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .groupBy(col("event_type"), (col("p.k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("k_bucket")),
    Some("""SELECT event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Forward as-of join (q42's mirror): each click matched to the user's
    * NEXT purchase at-or-after it — conversion attribution. Same no-join
    * union-and-carry plan, window running from the future side. */
  private val q55 = QuerySpec(
    "q55_asof_forward",
    (s, dir) => {
      import graft.operators.AsofJoin
      val ev = t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(round(max(col("value")), 2).as("purchase_value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofJoin.forward(clicks, purchases, Seq("user_id"), "ts", Seq("purchase_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("asof_purchase_value").as("purchase_value"))
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (SELECT user_id, ts, round(max(value), 2) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
      SELECT c.event_id, c.user_id,
        strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        p.purchase_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.event_id"""))

  /** q42's as-of join through the skew pre-split plan (daily time buckets,
    * within-bucket carry + boundary stitch — see
    * [[graft.operators.AsofJoin.backwardSplit]]). Same oracle as q42: the
    * split is a pure execution-shape change, so the DuckDB ASOF must
    * reproduce it row-for-row — which value-checks the stitch logic, not
    * just the property tests. */
  private val q56 = QuerySpec(
    "q56_asof_split",
    (s, dir) => {
      import graft.operators.AsofJoin
      val ev = t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(round(max(col("value")), 2).as("click_value"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsofJoin.backwardSplit(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_value"), bucketExpr = date_trunc("day", col("ts")))
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

  /** The full production dedup pipeline composed end-to-end: MinHash-LSH
    * candidate pairs above a similarity threshold become edges, connected
    * components turn pairwise similarity into transitive duplicate CLUSTERS,
    * and each doc gets its verdict — cluster id, keeper flag (min id wins),
    * cluster size. This is the droplist generator a 100 TB curation run
    * actually executes; q19/q43 verify the stages, this verifies the splice.
    * Oracle: the q19 candidate CTEs + a recursive reachability closure. */
  private val q57 = QuerySpec(
    "q57_dedup_clusters",
    (s, dir) => {
      import graft.operators.Components
      val edges = Dedup.minhashCandidates(t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        .where(col("est_jaccard") >= 0.5)
      val comp = Components.connectedComponents(edges, "id_a", "id_b")
      val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "comp")
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
          (col("id") === col("comp")).as("is_keeper"), col("cluster_size"))
        .orderBy(col("doc_id"))
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
        GROUP BY 1)
      SELECT m.id AS doc_id, m.component AS cluster_id,
        m.id = m.component AS is_keeper, s.cluster_size
      FROM membership m JOIN sizes s ON s.component = m.component
      ORDER BY doc_id"""))

  /** Top-3 TF-IDF keywords per document ([[TextAnalysis.tfIdfTopK]]) —
    * ranking happens on the ROUNDED score (ln differs by ulps across libm
    * implementations), ties on the token. Plan-audited for the map-side
    * WindowGroupLimit rank pushdown. */
  private val q58 = QuerySpec(
    "q58_tfidf_keywords",
    (s, dir) => TextAnalysis
      .tfIdfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("rn")),
    Some("""WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      tot AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tok, tf, df,
          round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (tok) CROSS JOIN tot),
      ranked AS (SELECT *, row_number() OVER
          (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn FROM scored)
      SELECT doc_id, tok, tf, df, tfidf, rn FROM ranked WHERE rn <= 3
      ORDER BY doc_id, rn"""))

  /** Intra-document repetition stats ([[TextAnalysis.repetitionStats]]) —
    * the Gopher-style degenerate-text cut (distinct-token ratio, top-token
    * share). */
  private val q59 = QuerySpec(
    "q59_repetition_stats",
    (s, dir) => TextAnalysis
      .repetitionStats(t(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH tf AS (SELECT doc_id, tok, count(*) AS cnt FROM
        (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        count(*) AS n_distinct,
        round(CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS distinct_ratio,
        round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_token_share
      FROM tf GROUP BY 1 ORDER BY 1"""))

  /** The chained per-iteration PageRank CTEs for the q60 oracle — the
    * fixed-iteration recurrence unrolled (aggregates aren't allowed in a
    * recursive term, and a fixed unroll is the determinism contract anyway).
    * Every arithmetic step mirrors [[graft.operators.Components.pageRank]]
    * in double precision, including computing 1 - damping rather than
    * inlining the decimal constant. */
  private def pageRankOracle(iters: Int): String = {
    val chain = (1 to iters).map { i =>
      s"""c$i AS (SELECT und.b AS id, sum(r${i - 1}.rank / deg.outdeg) AS in_sum
          FROM und JOIN r${i - 1} ON r${i - 1}.id = und.a
            JOIN deg ON deg.src = und.a
          GROUP BY 1),
        r$i AS (SELECT n.id,
            (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / t.n
              + CAST(0.85 AS DOUBLE) * coalesce(c$i.in_sum, CAST(0 AS DOUBLE))
              AS rank
          FROM nodes n CROSS JOIN tot t LEFT JOIN c$i ON c$i.id = n.id)"""
    }.mkString(",\n      ")
    s"""WITH ${simhashPairsSql(maxHamming = 1, bands = 2)},
      und AS (SELECT id_a AS a, id_b AS b FROM close_pairs
        UNION SELECT id_b, id_a FROM close_pairs),
      deg AS (SELECT a AS src, count(*) AS outdeg FROM und GROUP BY 1),
      nodes AS (SELECT DISTINCT a AS id FROM und),
      tot AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT id, CAST(1 AS DOUBLE) / t.n AS rank FROM nodes, tot t),
      $chain
      SELECT id AS doc_id, round(rank, 8) AS pagerank
      FROM r$iters ORDER BY doc_id"""
  }

  /** Fixed-iteration PageRank over the simhash near-dup graph
    * ([[graft.operators.Components.pageRank]]) — graph-centrality weighting
    * as a curation signal; the most-linked exemplar of each dup cluster
    * ranks highest. Both edge directions fed (undirected similarity). */
  private val q60 = QuerySpec(
    "q60_pagerank",
    (s, dir) => {
      import graft.operators.Components
      val pairs = Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 1, bands = 2)
      val und = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b"), col("id_a")))
      Components.pageRank(und, "src", "dst", iters = 5, damping = 0.85)
        .select(col("id").as("doc_id"), round(col("rank"), 8).as("pagerank"))
        .orderBy(col("doc_id"))
    },
    Some(pageRankOracle(iters = 5)))

  /** Self-trained character-bigram LM quality score
    * ([[TextAnalysis.charLmScore]]) — the perplexity-style curation filter,
    * value-checked cross-engine because the "model" is the corpus's own
    * bigram table and every arithmetic step (integer counts → one double
    * division → ln → weighted avg → round) mirrors exactly in SQL. */
  private val q61 = QuerySpec(
    "q61_char_lm_score",
    (s, dir) => TextAnalysis.charLmScore(t(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH bg0 AS (SELECT doc_id,
        unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
      FROM documents),
      bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY 1, 2),
      cab AS (SELECT bg, CAST(sum(n) AS BIGINT) AS cab FROM bgc GROUP BY 1),
      ca AS (SELECT substr(bg, 1, 1) AS pfx, CAST(sum(cab) AS BIGINT) AS ca
        FROM cab GROUP BY 1),
      model AS (SELECT bg, cab, ca FROM cab JOIN ca ON substr(cab.bg, 1, 1) = ca.pfx)
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        round(sum(n * ln(CAST(cab AS DOUBLE) / ca)) / CAST(sum(n) AS DOUBLE), 6)
          AS lm_score
      FROM bgc JOIN model USING (bg)
      GROUP BY 1 ORDER BY 1"""))

  /** Deterministic per-key row cap ([[graft.operators.ScaleOps.capPerKey]])
    * — the "≤ N docs per domain/source" corpus quota. Rank-limit pushes
    * map-side (WindowGroupLimit, plan-audited); survivor choice is the
    * engine-portable md5 hash, so the oracle selects the identical rows. */
  private val q62 = QuerySpec(
    "q62_per_key_cap",
    (s, dir) => graft.operators.ScaleOps.capPerKey(
        t(s, dir, "events").select(col("user_id"), col("event_id")),
        "user_id", "event_id", cap = 5)
      .orderBy(col("user_id"), col("event_id")),
    Some("""WITH r AS (SELECT user_id, event_id, row_number() OVER (
        PARTITION BY user_id
        ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
          % 2147483647, event_id) AS rn
      FROM events)
      SELECT user_id, event_id FROM r WHERE rn <= 5
      ORDER BY user_id, event_id"""))

  /** Deterministic 800/100/100 train/val/test split
    * ([[graft.operators.ScaleOps.splitByHash]]) summarized per split —
    * reproducible across engines because the split is the same md5-derived
    * bucket [[graft.operators.ScaleOps.hashSample]] uses. */
  private val q63 = QuerySpec(
    "q63_split_by_hash",
    (s, dir) => graft.operators.ScaleOps.splitByHash(
        t(s, dir, "documents"), "doc_id", "split",
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split")),
    Some("""WITH s AS (SELECT n_chars,
        CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END
          AS split
      FROM (SELECT n_chars,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 2147483647 % 1000 AS h
        FROM documents))
      SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM s GROUP BY 1 ORDER BY 1"""))

  /** Sharded sequence packing ([[graft.operators.ScaleOps.packBins]]):
    * docs → fixed-token-budget training bins, 8 hash shards packed by
    * independent running-sum windows (a global window would serialize the
    * corpus through one task). */
  private val q64 = QuerySpec(
    "q64_sequence_pack",
    (s, dir) => graft.operators.ScaleOps.packBins(
        t(s, dir, "documents"), "doc_id", "text",
        seqTokens = 2048, shards = 8)
      .orderBy(col("doc_id")),
    Some("""WITH d AS (SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT)
          AS n_tokens,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 2147483647 AS h
      FROM documents),
      s AS (SELECT doc_id, n_tokens, h, CAST(h % 8 AS INT) AS shard FROM d),
      c AS (SELECT doc_id, n_tokens, shard,
        coalesce(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
      FROM s)
      SELECT doc_id, n_tokens, shard,
        CAST(floor(CAST(cum AS DOUBLE) / 2048) AS BIGINT) AS bin
      FROM c ORDER BY doc_id"""))

  /** Corpus version diff ([[graft.operators.Dedup.corpusDiff]]): two
    * simulated snapshots of the documents table (10% removed, 1/7 added,
    * every 5th edited) → per-status counts — the dataset-versioning audit
    * that pairs with VersionedTable snapshots. */
  private val q65 = QuerySpec(
    "q65_corpus_diff",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val old = docs.where(col("doc_id") % 10 =!= 0)
      val neu = docs.where(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Dedup.corpusDiff(old, neu, "doc_id", "text")
        .groupBy("status").agg(count(lit(1)).as("n_docs"))
        .orderBy(col("status"))
    },
    Some("""WITH o AS (SELECT doc_id, md5(text) AS h FROM documents
        WHERE doc_id % 10 <> 0),
      n AS (SELECT doc_id,
          md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS h
        FROM documents WHERE doc_id % 7 <> 0),
      d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          CASE WHEN o.h IS NULL THEN 'added'
               WHEN n.h IS NULL THEN 'removed'
               WHEN o.h <> n.h THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM o FULL JOIN n ON o.doc_id = n.doc_id)
      SELECT status, count(*) AS n_docs FROM d GROUP BY 1 ORDER BY 1"""))

  /** Corpus-level boilerplate stripping ([[graft.operators.Dedup
    * .boilerplateStrip]]): non-overlapping 8-word segments hashed per-row
    * ([[graft.functions.SegmentHashes]]), segments in >= 3 distinct docs
    * dropped everywhere — the CCNet/RefinedWeb "line dedup" pass for
    * single-line documents. */
  private val q66 = QuerySpec(
    "q66_boilerplate_strip",
    (s, dir) => Dedup.boilerplateStrip(t(s, dir, "documents"),
        "doc_id", "text", segWords = 8, maxDocFreq = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH base AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
      segs AS (SELECT doc_id, unnest(list_transform(range(len(arr) // 8),
          i -> ('0x' || substr(md5(array_to_string(
            list_slice(arr, i*8 + 1, i*8 + 8), ' ')), 1, 15))::BIGINT))
          AS seg_hash
        FROM base),
      hot AS (SELECT seg_hash FROM (
          SELECT seg_hash, count(DISTINCT doc_id) AS dfd FROM segs GROUP BY 1)
        WHERE dfd >= 3),
      per AS (SELECT s.doc_id, count(*) AS n_segs,
          CAST(sum(CASE WHEN h.seg_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dropped
        FROM segs s LEFT JOIN hot h ON s.seg_hash = h.seg_hash GROUP BY 1)
      SELECT b.doc_id, len(b.arr) AS n_tokens,
        coalesce(p.n_segs, 0) AS n_segs,
        coalesce(p.n_dropped, 0) AS n_dropped,
        len(b.arr) - coalesce(p.n_dropped, 0) * 8 AS kept_tokens
      FROM base b LEFT JOIN per p ON b.doc_id = p.doc_id
      ORDER BY b.doc_id"""))

  /** Corpus vocabulary top-k by global term frequency
    * ([[TextAnalysis.vocabTopK]]) — tokenizer-vocab construction / Zipf
    * sanity check; per-doc term counts row-local, top-k via
    * TakeOrderedAndProject. */
  private val q67 = QuerySpec(
    "q67_vocab_topk",
    (s, dir) => TextAnalysis.vocabTopK(t(s, dir, "documents"), "text", k = 30)
      .orderBy(col("rnk")),
    Some("""WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      v AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf_total, count(*) AS df
        FROM tf GROUP BY 1),
      ranked AS (SELECT tok, tf_total, df,
          row_number() OVER (ORDER BY tf_total DESC, tok) AS rnk FROM v)
      SELECT tok, tf_total, df, rnk FROM ranked WHERE rnk <= 30
      ORDER BY rnk"""))

  /** SemDeDup-style semantic dedup ([[Similarity.semanticDedup]]): IVF-cell
    * assignment (seed centroids, the q33 scheme), in-cell pairs only,
    * drop the higher id of any pair with cosine >= 0.4. */
  private val q68 = {
    val (nlist, minCos) = (16, 0.4)
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q68_semantic_dedup",
      (s, dir) => Similarity.semanticDedup(t(s, dir, "embeddings"),
          nlist = nlist, minCosine = minCos)
        .orderBy(col("vec_id")),
      Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cent_vec
          FROM embeddings WHERE vec_id < $nlist),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
        assigned AS (SELECT vec_id, cv, cid FROM (
            SELECT vec_id, cv, cid,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY ${cosSql("cv", "cent_vec")} DESC, cid) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        dropped AS (SELECT DISTINCT r.vec_id FROM assigned l JOIN assigned r
            ON l.cid = r.cid AND l.vec_id < r.vec_id
          WHERE ${cosSql("l.cv", "r.cv")} >= $minCos)
        SELECT a.vec_id, a.cid, (d.vec_id IS NULL) AS keep
        FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
        ORDER BY a.vec_id"""))
  }

  /** Exact quality-quantile gate ([[TextAnalysis.qualityGate]], keep top
    * 30%) — equivalent to a global row_number over (score desc, id) but
    * computed via the score histogram, so no corpus-wide single-partition
    * window. The oracle states it the declarative way; 0.3 is forced to
    * DOUBLE there because DuckDB would otherwise read it as DECIMAL and
    * round floor(0.3·N) differently than IEEE doubles do. */
  private val q69 = QuerySpec(
    "q69_quality_gate",
    (s, dir) => TextAnalysis.qualityGate(t(s, dir, "documents"),
        "doc_id", "text", keepFrac = 0.3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some(s"""WITH scored AS (SELECT doc_id, $QualityScoreSql AS score
        FROM documents),
      ranked AS (SELECT doc_id, score,
          row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM scored)
      SELECT doc_id, score,
        rnk <= CAST(floor(CAST(0.3 AS DOUBLE) * (SELECT count(*) FROM scored))
          AS BIGINT) AS keep
      FROM ranked ORDER BY doc_id"""))

  /** Epoch-weighted mixing ([[graft.operators.ScaleOps.epochMix]]):
    * "2.5 epochs of src0, 2 of src1, 0.4 of src2, 1.25 of src3, 0.5 of
    * everything else" — floor(w) copies per doc plus a hash-chosen extra
    * for the fractional epoch. Weights quantized to permille in the driver
    * (integer literals in both plans). */
  private val q70 = QuerySpec(
    "q70_epoch_mix",
    (s, dir) => graft.operators.ScaleOps.epochMix(t(s, dir, "documents"),
        "source", "doc_id",
        Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.4, "src3" -> 1.25),
        defaultWeight = 0.5)
      .select(col("doc_id"), col("source"), col("copy_idx"))
      .orderBy(col("doc_id"), col("copy_idx")),
    Some("""WITH w AS (SELECT doc_id, source,
        (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 2
            WHEN 'src2' THEN 0 WHEN 'src3' THEN 1 ELSE 0 END)
        + (CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483647 % 1000 <
            (CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 0
              WHEN 'src2' THEN 400 WHEN 'src3' THEN 250 ELSE 500 END)
          THEN 1 ELSE 0 END) AS n_copies
        FROM documents)
      SELECT doc_id, source, unnest(range(n_copies)) AS copy_idx
      FROM w WHERE n_copies > 0
      ORDER BY doc_id, copy_idx"""))

  /** Quality-aware duplicate-cluster survivorship
    * ([[graft.operators.Components.keepersByScore]]): the q57 closure with
    * the keeper chosen by HIGHEST quality score (ties → min id) instead of
    * min id — what a production pipeline actually ships (keep the best copy,
    * not the first-crawled). */
  private val q71 = QuerySpec(
    "q71_quality_keepers",
    (s, dir) => {
      import graft.operators.Components
      val docs = t(s, dir, "documents")
      val edges = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        .where(col("est_jaccard") >= 0.5)
      val comp = Components.connectedComponents(edges, "id_a", "id_b")
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      Components.keepersByScore(comp, scored, "doc_id", "quality")
        .select(col("id").as("doc_id"), col("comp").as("cluster_id"),
          col("score").as("quality"), col("is_keeper"))
        .orderBy(col("doc_id"))
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
      scored AS (SELECT doc_id, $QualityScoreSql AS quality FROM documents),
      ranked AS (SELECT m.id, m.component, s.quality,
          row_number() OVER (PARTITION BY m.component
            ORDER BY s.quality DESC, m.id) AS rn
        FROM membership m JOIN scored s ON s.doc_id = m.id)
      SELECT id AS doc_id, component AS cluster_id, quality,
        rn = 1 AS is_keeper
      FROM ranked ORDER BY doc_id"""))

  /** Incremental dedup ([[graft.operators.Dedup
    * .minhashCandidatesIncremental]]): the new batch (doc_id % 4 = 0)
    * pairs against the standing corpus and itself; old × old is never
    * re-paired. The oracle states the same result declaratively: full
    * candidates filtered to pairs touching a new doc. */
  private val q72 = QuerySpec(
    "q72_incremental_dedup",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.minhashCandidatesIncremental(
          docs.where(col("doc_id") % 4 =!= 0),
          docs.where(col("doc_id") % 4 === 0),
          "doc_id", "text", shingleSize = 3, numHashes = 32, bands = 16)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH ${minhashCtes(numHashes = 32, bands = 16)}
      SELECT id_a, id_b, est_jaccard FROM cand
      WHERE id_a % 4 = 0 OR id_b % 4 = 0
      ORDER BY id_a, id_b"""))

  /** Out-of-vocabulary rate per doc vs the corpus top-50 vocabulary
    * ([[TextAnalysis.oovRate]]) — tokenizer-coverage analysis; the vocab
    * tie-break at the k-boundary is (tf_total desc, tok) in both engines. */
  private val q73 = QuerySpec(
    "q73_oov_rate",
    (s, dir) => TextAnalysis.oovRate(t(s, dir, "documents"),
        "doc_id", "text", k = 50)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      v AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf_total FROM tf GROUP BY 1),
      vocab AS (SELECT tok FROM (SELECT tok,
          row_number() OVER (ORDER BY tf_total DESC, tok) AS rnk FROM v)
        WHERE rnk <= 50),
      per AS (SELECT t.doc_id,
          CAST(sum(t.c) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN w.tok IS NULL THEN t.c ELSE 0 END) AS BIGINT)
            AS oov_tokens
        FROM tf t LEFT JOIN vocab w ON t.tok = w.tok GROUP BY 1)
      SELECT doc_id, n_tokens, oov_tokens,
        round(CAST(oov_tokens AS DOUBLE) / n_tokens, 6) AS oov_rate
      FROM per ORDER BY doc_id"""))

  /** Bloom-filter pre-filtered semi-join ([[graft.operators.ScaleOps
    * .bloomSemiJoin]]): high-value order keys → bloom probe in the lineitem
    * scan stage ([[graft.functions.BloomMightContain]], codegen'd) → residual
    * exact semi-join. Result-identical to the plain IN-subquery the oracle
    * states (no false negatives; residual join kills false positives). */
  private val q74 = QuerySpec(
    "q74_bloom_semi_join",
    (s, dir) => graft.operators.ScaleOps.bloomSemiJoin(
        t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders").where(col("o_totalprice") > 450000), "o_orderkey",
        expectedDistinct = 50000, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, count(*) AS n_rows,
        round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
      GROUP BY 1 ORDER BY 1"""))

  /** Shingle containment pairs ([[Dedup.containmentPairs]]):
    * shared / min(|A|,|B|) — catches a short doc quoted whole inside a long
    * one, which Jaccard scores near 0. Same inverted-index CTEs as q21,
    * different final scalar. */
  private val q75 = QuerySpec(
    "q75_containment_pairs",
    (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, minContainment = 0.5, minShared = 2, maxDocFreq = 20)
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("containment"), 6).as("containment"))
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
        WHERE a.doc_id < b.doc_id GROUP BY 1, 2 HAVING count(*) >= 2)
      SELECT id_a, id_b, shared,
        round(CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment
      FROM pairs
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
      ORDER BY id_a, id_b"""))

  /** Zipf-law fit over the top-50 vocabulary ([[TextAnalysis.zipfSlope]]) —
    * corpus-health drift gauge; closed-form least squares from raw sums in
    * both engines (built-in covar/var one-pass updates order differently). */
  private val q76 = QuerySpec(
    "q76_zipf_slope",
    (s, dir) => TextAnalysis.zipfSlope(t(s, dir, "documents"), "text", k = 50),
    Some("""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
      v AS (SELECT tok, count(*) AS tf_total FROM toks GROUP BY 1),
      ranked AS (SELECT tf_total,
          row_number() OVER (ORDER BY tf_total DESC, tok) AS rnk FROM v),
      pts AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(tf_total AS DOUBLE)) AS y
        FROM ranked WHERE rnk <= 50),
      s AS (SELECT count(*) AS n_terms, sum(x) AS sx, sum(y) AS sy,
          sum(x*y) AS sxy, sum(x*x) AS sxx FROM pts)
      SELECT n_terms,
        round((n_terms*sxy - sx*sy) / (n_terms*sxx - sx*sx), 6) AS slope,
        round((sy - ((n_terms*sxy - sx*sy) / (n_terms*sxx - sx*sx)) * sx) / n_terms, 6)
          AS intercept
      FROM s"""))

  /** Per-doc n-gram novelty vs the corpus's global first appearance
    * ([[Dedup.noveltyRates]]) — is a crawl batch adding content or
    * re-crawling? min-id aggregate + 1:1 join back on the shingle key. */
  private val q77 = QuerySpec(
    "q77_novelty_rate",
    (s, dir) => Dedup.noveltyRates(t(s, dir, "documents"), "doc_id", "text", n = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
          list_transform(range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
            i -> array_to_string(list_slice(str_split(text, ' '), i, i + 2), ' ')),
          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647))) AS sh
        FROM documents),
      fs AS (SELECT sh, min(doc_id) AS first_id FROM sh GROUP BY 1),
      per AS (SELECT s.doc_id, count(*) AS n_shingles,
          CAST(sum(CASE WHEN f.first_id < s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_seen
        FROM sh s JOIN fs f ON s.sh = f.sh GROUP BY 1)
      SELECT doc_id, n_shingles, n_seen,
        round(CAST(1 AS DOUBLE) - CAST(n_seen AS DOUBLE) / n_shingles, 6) AS novelty
      FROM per ORDER BY doc_id"""))

  /** Deterministic importance sampling ([[graft.operators.ScaleOps
    * .importanceSample]]): per-doc keep-probability proportional to the
    * quality score (clamped, permille-quantized, floor not round — half-up
    * tie behavior differs between engines), decided by the engine-portable
    * hash — the quality-weighted downsample between q69's hard gate and
    * q35's uniform sample. */
  private val q78 = QuerySpec(
    "q78_importance_sample",
    (s, dir) => graft.operators.ScaleOps.importanceSample(
        t(s, dir, "documents"), "doc_id",
        TextAnalysis.qualityScore(col("text")), rate = 0.9)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id")),
    Some(s"""WITH scored AS (SELECT doc_id, source, $QualityScoreSql AS score
        FROM documents),
      p AS (SELECT doc_id, source,
          least(greatest(CAST(floor(score * CAST(0.9 AS DOUBLE) * 1000) AS BIGINT), 0), 1000)
            AS pm
        FROM scored)
      SELECT doc_id, source FROM p
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 2147483647 % 1000 < pm
      ORDER BY doc_id"""))

  /** Cross-source duplication matrix: minhash near-dup pairs rolled up to
    * (source, source) cells — "which sources copy which", the provenance
    * report behind per-source dedup budgeting. Pairs travel id-only; the
    * source lookup is a narrow id→source join after the pair count has
    * already collapsed. Cells are unordered (least/greatest) so A→B and
    * B→A land in one cell. */
  private val q79 = QuerySpec(
    "q79_dup_matrix",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 32, bands = 16)
        .where(col("est_jaccard") >= 0.5)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("source", "src_b"), "id_b")
        .groupBy(least(col("src_a"), col("src_b")).as("source_x"),
          greatest(col("src_a"), col("src_b")).as("source_y"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("source_x"), col("source_y"))
    },
    Some(s"""WITH ${minhashCtes(numHashes = 32, bands = 16)},
      close_pairs AS (SELECT id_a, id_b FROM cand WHERE est_jaccard >= 0.5),
      j AS (SELECT least(da.source, db.source) AS source_x,
          greatest(da.source, db.source) AS source_y
        FROM close_pairs p JOIN documents da ON da.doc_id = p.id_a
          JOIN documents db ON db.doc_id = p.id_b)
      SELECT source_x, source_y, count(*) AS n_pairs FROM j
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** The composed corpus health report ([[graft.jobs.CorpusReport]]) as a
    * value-checked query: per-source volume/quality/dup/novelty/OOV plus
    * the corpus-level Zipf fit, all in one result — every constituent is an
    * operator this catalog already oracle-checks (q19/q24/q67/q73/q76/q77);
    * this row proves the COMPOSITION (joins, rollup, corpus-row stitching)
    * is value-faithful too. */
  private val q80 = QuerySpec(
    "q80_corpus_report",
    (s, dir) => graft.jobs.CorpusReport.run(t(s, dir, "documents"))
      .orderBy(col("is_corpus_row"), col("source")),
    Some(s"""WITH ${minhashCtes(numHashes = 32, bands = 16)},
      dup_ids AS (SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM cand WHERE est_jaccard >= 0.8
        UNION ALL SELECT id_b FROM cand WHERE est_jaccard >= 0.8)),
      nsh AS (SELECT doc_id, unnest(list_distinct(hh)) AS shh FROM hs),
      fsn AS (SELECT shh, min(doc_id) AS first_id FROM nsh GROUP BY 1),
      nov AS (SELECT n.doc_id, count(*) AS n_sh,
          CAST(sum(CASE WHEN f.first_id < n.doc_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_seen
        FROM nsh n JOIN fsn f ON n.shh = f.shh GROUP BY 1),
      novelty AS (SELECT doc_id,
          round(CAST(1 AS DOUBLE) - CAST(n_seen AS DOUBLE) / n_sh, 6) AS novelty
        FROM nov),
      tk AS (SELECT doc_id, unnest(t) AS tok FROM toks),
      tf AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
      v AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf_total FROM tf GROUP BY 1),
      vocab AS (SELECT tok FROM (SELECT tok,
          row_number() OVER (ORDER BY tf_total DESC, tok) AS rnk FROM v)
        WHERE rnk <= 50),
      oov AS (SELECT t.doc_id, CAST(sum(t.c) AS BIGINT) AS n_toks,
          CAST(sum(CASE WHEN w.tok IS NULL THEN t.c ELSE 0 END) AS BIGINT) AS oovt
        FROM tf t LEFT JOIN vocab w ON t.tok = w.tok GROUP BY 1),
      oovr AS (SELECT doc_id, round(CAST(oovt AS DOUBLE) / n_toks, 6) AS oov_rate
        FROM oov),
      ranked AS (SELECT tf_total,
          row_number() OVER (ORDER BY tf_total DESC, tok) AS rnk FROM v),
      pts AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(tf_total AS DOUBLE)) AS y
        FROM ranked WHERE rnk <= 50),
      zs AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
          sum(x*y) AS sxy, sum(x*x) AS sxx FROM pts),
      zipf AS (SELECT round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
          round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept
        FROM zs),
      base AS (SELECT doc_id, source,
          CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
          $QualityScoreSql AS quality
        FROM documents),
      per AS (SELECT b.doc_id, b.source, b.n_tokens, b.quality,
          CASE WHEN d.id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
          nv.novelty, o.oov_rate
        FROM base b LEFT JOIN dup_ids d ON b.doc_id = d.id
        LEFT JOIN novelty nv ON nv.doc_id = b.doc_id
        LEFT JOIN oovr o ON o.doc_id = b.doc_id),
      rolled AS (SELECT source,
          count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          round(avg(quality), 6) AS mean_quality,
          round(CAST(sum(is_dup) AS DOUBLE) / count(*), 6) AS near_dup_share,
          round(avg(novelty), 6) AS mean_novelty,
          round(avg(oov_rate), 6) AS mean_oov_rate,
          CAST(GROUPING(source) AS INTEGER) AS is_corpus_row
        FROM per GROUP BY ROLLUP(source))
      SELECT r.source, r.n_docs, r.total_tokens, r.mean_quality,
        r.near_dup_share, r.mean_novelty, r.mean_oov_rate, r.is_corpus_row,
        CASE WHEN r.is_corpus_row = 1 THEN z.slope END AS zipf_slope,
        CASE WHEN r.is_corpus_row = 1 THEN z.intercept END AS zipf_intercept
      FROM rolled r CROSS JOIN zipf z
      ORDER BY r.is_corpus_row, r.source"""))

  /** Self-trained word-bigram LM score ([[TextAnalysis.wordLmScore]]) —
    * q61's token-level sibling (the CCNet filter): same arithmetic
    * contract (integer counts → one double division → ln → weighted avg →
    * round), bigrams from [[graft.functions.NgramCounts]] (WordShingles
    * semantics: a doc of ≤ 2 tokens is its own single "bigram"). */
  private val q81 = QuerySpec(
    "q81_word_lm_score",
    (s, dir) => TextAnalysis.wordLmScore(t(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
      bg0 AS (SELECT doc_id, unnest(CASE WHEN len(arr) <= 2
            THEN [array_to_string(arr, ' ')]
            ELSE list_transform(range(1, len(arr)),
              i -> array_to_string(list_slice(arr, i, i + 1), ' ')) END) AS bg
        FROM t),
      bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY 1, 2),
      cab AS (SELECT bg, CAST(sum(n) AS BIGINT) AS cab FROM bgc GROUP BY 1),
      ca AS (SELECT split_part(bg, ' ', 1) AS pfx, CAST(sum(cab) AS BIGINT) AS ca
        FROM cab GROUP BY 1),
      model AS (SELECT bg, cab, ca FROM cab JOIN ca
        ON split_part(cab.bg, ' ', 1) = ca.pfx)
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        round(sum(n * ln(CAST(cab AS DOUBLE) / ca)) / CAST(sum(n) AS DOUBLE), 6)
          AS lm_score
      FROM bgc JOIN model USING (bg)
      GROUP BY 1 ORDER BY 1"""))

  /** Heavy-hitter tokens via the mergeable Misra-Gries sketch
    * ([[graft.operators.ScaleOps.frequentItemsChecked]]): tokens with ≥ 1%
    * of total occurrences, per-partition sketches merged on the driver,
    * exact-verified over the guaranteed candidate superset — the q32
    * pattern (sketch internally, engine-portable exact values + a provable
    * bound flag outward) applied to frequencies. */
  private val q82 = QuerySpec(
    "q82_frequent_tokens",
    (s, dir) => graft.operators.ScaleOps.frequentItemsChecked(
        t(s, dir, "documents")
          .select(explode(graft.functions.TokenCounts(col("text"))).as("tc"))
          .select(col("tc.tok").as("tok"), col("tc.tf").as("tf")),
        "tok", weightCol = Some("tf"), minShare = 0.01)
      .orderBy(col("tok")),
    Some("""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS tok FROM documents),
      c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY 1),
      t AS (SELECT CAST(sum(n_exact) AS BIGINT) AS total FROM c)
      SELECT tok, n_exact, TRUE AS within_bound
      FROM c, t
      WHERE n_exact >= greatest(
        CAST(floor(CAST(0.01 AS DOUBLE) * total) AS BIGINT), 1)
      ORDER BY tok"""))

  /** OR-amplified multi-table LSH ANN ([[Similarity.lshTopKMulti]]) — q29
    * with recall made tunable: `numTables` independent sign-LSH signatures
    * (disjoint hyperplane ranges of the same md5 family), a candidate on ANY
    * collision, id-only pair dedup before the exact re-rank. The oracle
    * replays every table's signature from the identical md5 plane weights,
    * so the approximate result still value-matches exactly. */
  private val q83 = {
    val (tables, planes) = (2, 6)
    QuerySpec(
      "q83_ann_lsh_multi",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopKMulti(emb, emb.where(col("vec_id") < 16), k = 5,
            numTables = tables, numPlanes = planes)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH sig AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          list_transform(range(0, $tables), t ->
            list_reduce(list_transform(range(0, $planes), p ->
              CASE WHEN list_reduce(list_transform(range(1, len(embedding) + 1), i ->
                  embedding[i]::DOUBLE *
                    ((('0x' || substr(md5((t * $planes + p)::VARCHAR || '_' ||
                        (i - 1)::VARCHAR), 1, 15))::BIGINT
                      % 2147483647)::DOUBLE / 2147483647.0 - 0.5)),
                (x, y) -> x + y) >= 0 THEN 1 << p ELSE 0 END),
              (x, y) -> x + y)) AS buckets
        FROM embeddings),
      tb AS (SELECT vec_id, t.t AS t, buckets[t.t + 1] AS bucket
        FROM sig, range(0, $tables) AS t(t)),
      cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM (SELECT * FROM tb WHERE vec_id < 16) q
        JOIN tb c USING (t, bucket)
        WHERE q.vec_id <> c.vec_id),
      scored AS (SELECT query_id, neighbor_id,
          list_reduce(list_transform(range(1, len(qs.v) + 1), i -> qs.v[i] * cs.v[i]),
            (x, y) -> x + y) /
          (sqrt(list_reduce(list_transform(range(1, len(qs.v) + 1), i -> qs.v[i] * qs.v[i]),
            (x, y) -> x + y)) *
           sqrt(list_reduce(list_transform(range(1, len(cs.v) + 1), i -> cs.v[i] * cs.v[i]),
            (x, y) -> x + y))) AS cosine
        FROM cand
        JOIN sig qs ON qs.vec_id = query_id
        JOIN sig cs ON cs.vec_id = neighbor_id),
      ranked AS (SELECT query_id, neighbor_id, cosine,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored)
      SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
      FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))
  }

  /** Shared DuckDB CTE chain replaying [[Dedup.cdcChunks]]' boundary rule:
    * rolling window fold (acc·257 + stableHash31(token)) mod P over the last
    * `w` tokens, boundary where ≡ 0 mod `d`, final position always cut. */
  private def cdcCtes(w: Int, d: Int): String =
    s"""t AS (SELECT doc_id, str_split(text, ' ') AS toks FROM documents),
      h AS (SELECT doc_id, toks, len(toks) AS n, list_transform(toks, s ->
          ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS hs FROM t),
      b AS (SELECT doc_id, toks, n,
          list_filter(range(${w}::BIGINT, n + 1), i ->
            list_reduce(list_prepend(0::BIGINT, list_slice(hs, i - $w + 1, i)),
              (acc, x) -> (acc * 257 + x) % 2147483647) % $d = 0) AS bpos
        FROM h),
      e AS (SELECT doc_id, toks,
          CASE WHEN len(bpos) > 0 AND bpos[len(bpos)] = n THEN bpos
               ELSE list_append(bpos, n) END AS ends FROM b),
      ks AS (SELECT doc_id, toks, ends,
          unnest(range(1, len(ends) + 1)) AS k FROM e),
      chunks AS (SELECT doc_id, k - 1 AS chunk_idx,
          CASE WHEN k = 1 THEN 1::BIGINT ELSE ends[(k - 1)::INT] + 1 END AS start_tok,
          ends[k::INT] AS end_tok,
          ('0x' || substr(md5(array_to_string(
              list_slice(toks, (CASE WHEN k = 1 THEN 1::BIGINT
                ELSE ends[(k - 1)::INT] + 1 END)::INT, ends[k::INT]::INT), ' ')),
            1, 15))::BIGINT % 2147483647 AS chunk_hash
        FROM ks)"""

  /** Content-defined chunking ([[Dedup.cdcChunks]] — fused O(n) rolling
    * window in one codegen pass): one row per chunk with its 1-based token
    * range and content hash. Boundaries depend only on local content, so
    * shifted/embedded passages re-chunk identically — what fixed-width
    * segmenting (q66) structurally misses. */
  private val q84 = QuerySpec(
    "q84_cdc_chunks",
    (s, dir) => Dedup.cdcChunks(t(s, dir, "documents"), "doc_id", "text",
        window = 8, divisor = 16)
      .orderBy(col("id"), col("chunk_idx")),
    Some(s"""WITH ${cdcCtes(8, 16)}
      SELECT doc_id AS id, chunk_idx, start_tok, end_tok, chunk_hash
      FROM chunks ORDER BY id, chunk_idx"""))

  /** Duplicated CDC chunks across documents ([[Dedup.cdcDupChunks]]) — the
    * chunk-grain dup report: embedded quotes, shifted boilerplate, licensed
    * passages. One chunk_hash-keyed aggregate over the narrow chunk table. */
  private val q85 = QuerySpec(
    "q85_cdc_dup_chunks",
    (s, dir) => Dedup.cdcDupChunks(t(s, dir, "documents"), "doc_id", "text",
        window = 8, divisor = 16, minDocs = 2)
      .orderBy(col("chunk_hash")),
    Some(s"""WITH ${cdcCtes(8, 16)}
      SELECT chunk_hash, count(*) AS n_occurrences,
        count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
      FROM chunks GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
      ORDER BY chunk_hash"""))

  /** Chunk-grain decontamination ([[Dedup.contaminatedIdsByChunk]]) — q51's
    * n-gram leak guard at CDC-chunk grain: flags only long verbatim spans
    * (chunk hashes collide on whole content-defined passages, not topical
    * 3-gram overlap), and catches reference text EMBEDDED at any offset.
    * Same q51 reference split (doc_id % 97). */
  private val q86 = QuerySpec(
    "q86_decontaminate_chunks",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contaminatedIdsByChunk(
          docs.where(col("doc_id") % 97 =!= 0), "doc_id", "text",
          docs.where(col("doc_id") % 97 === 0), "text",
          window = 8, divisor = 8, minShared = 1)
        .select(col("id").as("doc_id"), col("shared_chunks"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${cdcCtes(8, 8)},
      c AS (SELECT DISTINCT doc_id, chunk_hash FROM chunks WHERE doc_id % 97 <> 0),
      r AS (SELECT DISTINCT chunk_hash FROM chunks WHERE doc_id % 97 = 0)
      SELECT doc_id, count(*) AS shared_chunks
      FROM c JOIN r USING (chunk_hash)
      GROUP BY 1 HAVING count(*) >= 1 ORDER BY 1"""))

  /** Multi-pattern policy/blocklist stats ([[TextAnalysis.policyHits]] —
    * one fused Aho–Corasick pass per document, cost independent of
    * pattern count). The operator counts ALL occurrences (overlapping
    * included); every oracle pattern below is border-free (no proper
    * prefix that is also a suffix), so DuckDB's greedy replace-count
    * equals the all-occurrences count exactly — the overlap semantics
    * themselves are pinned by the brute-force property spec. "table"
    * nested inside "big table" exercises cross-pattern containment. */
  private val q87 = {
    val pats = Seq("slow filter", "big table", "table", "hash join",
      "vector scan")
    val patList = pats.map(p => s"'$p'").mkString("[", ",", "]")
    QuerySpec(
      "q87_policy_hits",
      (s, dir) => TextAnalysis.policyHits(t(s, dir, "documents"),
          "doc_id", "text", pats)
        .where(col("n_hits") > 0)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id")),
      Some(s"""WITH pats AS (SELECT unnest($patList) AS p),
        occ AS (SELECT d.doc_id,
            (len(d.text) - len(replace(d.text, pats.p, ''))) // len(pats.p) AS c
          FROM documents d CROSS JOIN pats)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_hits,
          CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_patterns_hit
        FROM occ GROUP BY 1 HAVING sum(c) > 0 ORDER BY 1"""))
  }

  /** BM25 top-k lexical retrieval ([[graft.operators.Retrieval.bm25TopK]]) —
    * postings filtered to the query terms in the scan stage, per-term scores
    * fixed to micro-units before the per-doc sum (order-free integer Σ), and
    * the oracle SQL mirrors the Spark expression's parenthesization token for
    * token so every double matches bit-for-bit. `(1.2 + 1.0)` stays a SUM in
    * the SQL: the Scala side computes `lit(k1 + 1.0)` in double arithmetic,
    * and parsing the pre-added literal "2.2" yields a DIFFERENT double. */
  private val q88 = {
    val terms = Seq("hash", "stream", "vector", "big")
    val termList = terms.map(p => s"'$p'").mkString("(", ",", ")")
    QuerySpec(
      "q88_bm25_topk",
      (s, dir) => graft.operators.Retrieval.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text", terms, k = 20)
        .withColumnRenamed("id", "doc_id"),
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
          FROM tf JOIN dfreq USING (tok) CROSS JOIN stats)
        SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro,
          count(*) AS n_terms
        FROM term_scores GROUP BY 1
        ORDER BY score_micro DESC, doc_id LIMIT 20"""))
  }

  /** Exact repeated-substring spans at 8-gram grain
    * ([[Dedup.repeatedSpans]]) — the exact-substring dedup cut: maximal
    * token ranges whose every 8-token window occurs ≥2 times corpus-wide.
    * Window identity travels as the stable 60-bit hash in BOTH engines, so
    * even a collision collapses identically. */
  private val q89 = QuerySpec(
    "q89_repeated_spans",
    (s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"),
        "doc_id", "text", n = 8)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("span_start")),
    Some("""WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t
        FROM documents),
      grams AS (SELECT doc_id, i - 1 AS pos,
          ('0x' || substr(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT
            % 2147483647 AS h
        FROM toks, LATERAL unnest(range(1, greatest(len(t) - 8 + 1, 1) + 1))
          AS u(i)),
      rep AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
      hits AS (SELECT doc_id, pos FROM grams JOIN rep USING (h)),
      marked AS (SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = 1
            THEN 0 ELSE 1 END AS brk
        FROM hits),
      spans AS (SELECT doc_id, pos,
          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span
        FROM marked)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        CAST(max(pos) + 8 - 1 AS BIGINT) AS span_end,
        count(*) AS n_windows
      FROM spans GROUP BY doc_id, span ORDER BY doc_id, span_start"""))

  /** Token-budget gate ([[TextAnalysis.tokenBudgetGate]]) — "the best
    * 30k-token subset": greedy prefix in (quality desc, id) order, Σ tokens
    * ≤ budget. The oracle's corpus-wide cumsum window IS the global sort the
    * operator's histogram construction avoids. */
  private val q90 = QuerySpec(
    "q90_token_budget_gate",
    (s, dir) => TextAnalysis.tokenBudgetGate(t(s, dir, "documents"),
        "doc_id", "text", budgetTokens = 30000L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some(s"""WITH scored AS (SELECT doc_id, $QualityScoreSql AS score,
        CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents),
      ordered AS (SELECT doc_id, score, n_tokens,
          sum(n_tokens) OVER (ORDER BY score DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM scored)
      SELECT doc_id, score, n_tokens, cum <= 30000 AS keep
      FROM ordered ORDER BY doc_id"""))

  /** BPE first-merge pair table ([[TextAnalysis.bpePairStats]]) — adjacent
    * char-pair frequencies weighted by word frequency, computed over the
    * collapsed VOCABULARY (never the corpus tokens). */
  private val q91 = QuerySpec(
    "q91_bpe_pair_stats",
    (s, dir) => TextAnalysis.bpePairStats(t(s, dir, "documents"), "text",
        k = 30)
      .orderBy(col("rnk")),
    Some("""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS tok
        FROM documents),
      vocab AS (SELECT tok, count(*) AS freq FROM toks
        WHERE len(tok) >= 2 GROUP BY 1),
      pairs AS (SELECT substr(tok, i, 1) AS a, substr(tok, i + 1, 1) AS b,
          tok, freq
        FROM vocab, LATERAL unnest(range(1, len(tok))) AS u(i)),
      agg AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS pair_count,
          count(DISTINCT tok) AS n_words FROM pairs GROUP BY 1, 2),
      ranked AS (SELECT a, b, pair_count, n_words,
          row_number() OVER (ORDER BY pair_count DESC, a, b) AS rnk FROM agg)
      SELECT a, b, pair_count, n_words, rnk FROM ranked WHERE rnk <= 30
      ORDER BY rnk"""))

  /** Cluster-balanced downsample ([[Similarity.cellBalancedSample]]):
    * ≤ cap vectors per IVF cell (seed centroids, the q33 scheme),
    * md5-hash-ranked survivors — the diversity-preserving coreset cut. */
  private val q92 = {
    val (nlist, cap) = (8, 12)
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q92_cluster_balanced_sample",
      (s, dir) => Similarity.cellBalancedSample(
          t(s, dir, "embeddings"), nlist = nlist, cap = cap)
        .orderBy(col("cid"), col("vec_id")),
      Some(s"""WITH cent AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cent_vec
          FROM embeddings WHERE vec_id < $nlist),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
          FROM embeddings),
        assigned AS (SELECT neighbor_id, cid FROM (
            SELECT neighbor_id, cid,
              row_number() OVER (PARTITION BY neighbor_id
                ORDER BY ${cosSql("cv", "cent_vec")} DESC, cid) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        capped AS (SELECT neighbor_id AS vec_id, cid, row_number() OVER (
            PARTITION BY cid
            ORDER BY ('0x' || substr(md5(CAST(neighbor_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483647, neighbor_id) AS rn
          FROM assigned)
        SELECT vec_id, cid FROM capped WHERE rn <= $cap
        ORDER BY cid, vec_id"""))
  }

  /** Hard-negative mining ([[Similarity.hardNegatives]]): top-5 most-similar
    * DIFFERENT-label vectors per query — contrastive-training prep. */
  private val q93 = {
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q93_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb, emb.where(col("vec_id") < 8), k = 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            col("neighbor_label"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, label AS q_label,
          embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
          embedding::DOUBLE[] AS cv FROM embeddings),
        scored AS (SELECT query_id, neighbor_id, neighbor_label,
            ${cosSql("qv", "cv")} AS cosine
          FROM c, q WHERE q_label <> neighbor_label),
        ranked AS (SELECT query_id, neighbor_id, neighbor_label, cosine,
            row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, neighbor_label,
          round(cosine, 6) AS cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))
  }

  /** Temperature-scaled source mix ([[ScaleOps.temperatureWeights]], α=0.5):
    * per-source sampling weights `(n_s/N)^α` normalized in integer
    * micro-units so the doubles match DuckDB bit-for-bit. */
  private val q94 = QuerySpec(
    "q94_temperature_mix",
    (s, dir) => graft.operators.ScaleOps.temperatureWeights(
        t(s, dir, "documents"), "source", alpha = 0.5)
      .orderBy(col("source")),
    Some("""WITH counts AS (SELECT source, count(*) AS n_rows
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM counts),
      scored AS (SELECT source, n_rows,
          CAST(round(pow(CAST(n_rows AS DOUBLE) / n_total, 0.5) * 1000000.0, 0)
            AS BIGINT) AS p_micro
        FROM counts CROSS JOIN tot),
      denom AS (SELECT CAST(sum(p_micro) AS BIGINT) AS micro_total FROM scored)
      SELECT source, n_rows, p_micro,
        round(CAST(p_micro AS DOUBLE) / micro_total, 6) AS weight
      FROM scored CROSS JOIN denom ORDER BY source"""))

  /** Label-noise screen ([[Similarity.labelOutliers]]): bottom-5 cosine to
    * the own-class mean-embedding prototype, per label — mislabel suspects.
    * Prototype means are micro-quantized integer sums (order-free) so the
    * doubles match DuckDB bit-for-bit. */
  private val q95 = {
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q95_label_outliers",
      (s, dir) => Similarity.labelOutliers(t(s, dir, "embeddings"), k = 5)
        .select(col("vec_id"), col("label"),
          round(col("proto_cosine"), 6).as("proto_cosine"), col("rnk"))
        .orderBy(col("label"), col("rnk")),
      Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
          FROM embeddings),
        dims AS (SELECT label, i AS pos,
            CAST(round(v[i] * 1000000.0, 0) AS BIGINT) AS micro
          FROM e, LATERAL unnest(range(1, len(v) + 1)) AS u(i)),
        proto AS (SELECT label, pos, CAST(sum(micro) AS BIGINT) AS s_micro,
            count(*) AS n
          FROM dims GROUP BY 1, 2),
        pvec AS (SELECT label, list(CAST(s_micro AS DOUBLE) / n ORDER BY pos)
            AS p FROM proto GROUP BY 1),
        scored AS (SELECT e.vec_id, e.label, ${cosSql("v", "p")} AS c
          FROM e JOIN pvec USING (label)),
        ranked AS (SELECT vec_id, label, c, row_number() OVER (
            PARTITION BY label ORDER BY c ASC, vec_id) AS rnk FROM scored)
        SELECT vec_id, label, round(c, 6) AS proto_cosine, rnk
        FROM ranked WHERE rnk <= 5 ORDER BY label, rnk"""))
  }

  /** Leakage-free split ([[graft.operators.Components.componentSplit]]):
    * near-dup clusters (simhash pairs → connected components) hash-split as
    * UNITS, so no eval doc has a training-side near-duplicate. */
  private val q96 = QuerySpec(
    "q96_leakfree_split",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val edges = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 1, bands = 2)
      graft.operators.Components.componentSplit(docs, "doc_id", edges,
          "id_a", "id_b", Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${simhashPairsSql(maxHamming = 1, bands = 2)},
      und AS (SELECT id_a AS a, id_b AS b FROM close_pairs
        UNION SELECT id_b, id_a FROM close_pairs),
      walk(id, comp) AS (
        SELECT a, a FROM und
        UNION
        SELECT u.a, w.comp FROM und u JOIN walk w ON w.id = u.b),
      comp AS (SELECT id, min(comp) AS component FROM walk GROUP BY 1),
      lab AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
      b AS (SELECT doc_id, component,
          ('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 15))::BIGINT
            % 2147483647 % 1000 AS bucket FROM lab)
      SELECT doc_id, component, CASE WHEN bucket < 800 THEN 'train'
        WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id"""))

  /** BPE apply ([[TextAnalysis.bpeSegment]]): segment the vocabulary under a
    * fixed 8-merge table (the sf0.01 q91 top pairs, frozen as literals —
    * applying ANY fixed rank-ordered table is the operator's contract),
    * report the 20 highest-frequency words' segmentations plus the
    * corpus-token compression this tokenizer achieves. */
  private val q97 = {
    val merges = Seq("e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r",
      "s" -> "t", "m" -> "e", "t" -> "o", "a" -> "t")
    val mergeSqlInner = merges.foldLeft(
      "' ' || array_to_string(str_split(tok, ''), ' ') || ' '") {
      case (acc, (a, b)) => s"replace($acc, ' $a $b ', ' $a$b ')" }
    QuerySpec(
      "q97_bpe_segment",
      (s, dir) => TextAnalysis.bpeSegment(t(s, dir, "documents"), "text",
          merges)
        .orderBy(col("freq").desc, col("tok")).limit(20),
      Some(s"""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS tok
          FROM documents),
        vocab AS (SELECT tok, count(*) AS freq FROM toks GROUP BY 1),
        seg AS (SELECT tok, freq, trim($mergeSqlInner) AS segmented
          FROM vocab)
        SELECT tok, freq, segmented,
          CAST(len(str_split(segmented, ' ')) AS BIGINT) AS n_symbols
        FROM seg ORDER BY freq DESC, tok LIMIT 20"""))
  }

  /** Range-dimension join ([[ScaleOps.rangeBucketJoin]]): events banded by
    * value range via bucket expansion + equi join + residual predicate —
    * the hash-join plan of a range lookup (the naive BETWEEN join plans
    * BNLJ; the catalog sweep enforces this one does NOT). Sums travel as
    * integer cents so the per-band Σ is fold-order-free. */
  private val q98 = {
    val bands = Seq((0.0, 1.0, "b0_micro"), (1.0, 5.0, "b1_small"),
      (5.0, 20.0, "b2_mid"), (20.0, 100.0, "b3_large"),
      (100.0, 1000.0, "b4_huge"))
    val bandsSql = bands.map { case (lo, hi, b) => s"($lo, $hi, '$b')" }
      .mkString(", ")
    QuerySpec(
      "q98_range_band_join",
      (s, dir) => {
        import s.implicits._
        val dims = bands.toDF("lo", "hi", "band")
        graft.operators.ScaleOps.rangeBucketJoin(
            t(s, dir, "events").select(col("event_id"), col("value")),
            "value", dims, "lo", "hi", bucketWidth = 10.0)
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100.0, 0).cast("long")).as("sum_cents"))
          .orderBy(col("band"))
      },
      Some(s"""WITH bands(lo, hi, band) AS (VALUES $bandsSql),
        j AS (SELECT e.value, b.band FROM events e JOIN bands b
          ON e.value >= b.lo AND e.value < b.hi)
        SELECT band, count(*) AS n_events,
          CAST(sum(CAST(round(value * 100.0, 0) AS BIGINT)) AS BIGINT)
            AS sum_cents
        FROM j GROUP BY 1 ORDER BY 1"""))
  }

  /** Per-source quality quantiles ([[ScaleOps.groupQuantiles]]): p50/p90/p99
    * of the 6dp quality score per source, via the bounded per-group
    * histogram — no per-group sort of raw rows. The oracle mirrors the
    * ceil(n·p/1000) discrete-quantile selection exactly. */
  private val q99 = QuerySpec(
    "q99_source_quantiles",
    (s, dir) => graft.operators.ScaleOps.groupQuantiles(
        t(s, dir, "documents"), "source",
        TextAnalysis.qualityScore(col("text")),
        Seq(500, 900, 990))
      .orderBy(col("source"), col("p_permille")),
    Some(s"""WITH scored AS (SELECT source, $QualityScoreSql AS v
        FROM documents),
      hist AS (SELECT source, v, count(*) AS c FROM scored GROUP BY 1, 2),
      cum AS (SELECT source, v, c,
          sum(c) OVER (PARTITION BY source ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(c) OVER (PARTITION BY source) AS n
        FROM hist),
      q AS (
        SELECT source, CAST(500 AS BIGINT) AS p_permille, min(v) AS q
        FROM cum WHERE cum >= (n * 500 + 999) // 1000 GROUP BY 1
        UNION ALL
        SELECT source, CAST(900 AS BIGINT), min(v)
        FROM cum WHERE cum >= (n * 900 + 999) // 1000 GROUP BY 1
        UNION ALL
        SELECT source, CAST(990 AS BIGINT), min(v)
        FROM cum WHERE cum >= (n * 990 + 999) // 1000 GROUP BY 1)
      SELECT source, p_permille, q FROM q ORDER BY source, p_permille"""))

  /** Signal-agreement analysis ([[ScaleOps.microPearson]]): per-source
    * Pearson r between the cheap heuristic quality score and the char-LM
    * score — "is the fast filter a proxy for perplexity?". Sufficient
    * statistics are exact integer micro-sums, so r is bit-identical in any
    * engine (built-in corr() is not: running-covariance fold order). */
  private val q100 = QuerySpec(
    "q100_score_correlation",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = TextAnalysis.charLmScore(docs, "doc_id", "text")
        .select(col("id").as("doc_id"), col("lm_score"))
      val joined = docs.select(col("doc_id"), col("source"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .join(lm, Seq("doc_id"))
      graft.operators.ScaleOps.microPearson(joined, "source",
          col("quality"), col("lm_score"))
        .orderBy(col("source"))
    },
    Some(s"""WITH bg0 AS (SELECT doc_id,
        unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
      FROM documents),
      bgc AS (SELECT doc_id, bg, count(*) AS n FROM bg0 GROUP BY 1, 2),
      cab AS (SELECT bg, CAST(sum(n) AS BIGINT) AS cab FROM bgc GROUP BY 1),
      ca AS (SELECT substr(bg, 1, 1) AS pfx, CAST(sum(cab) AS BIGINT) AS ca
        FROM cab GROUP BY 1),
      model AS (SELECT bg, cab, ca FROM cab JOIN ca
        ON substr(cab.bg, 1, 1) = ca.pfx),
      lm AS (SELECT doc_id,
          round(sum(n * ln(CAST(cab AS DOUBLE) / ca)) / CAST(sum(n) AS DOUBLE), 6)
            AS lm_score
        FROM bgc JOIN model USING (bg) GROUP BY 1),
      q AS (SELECT doc_id, source, $QualityScoreSql AS quality FROM documents),
      m AS (SELECT q.source,
          CAST(round(q.quality * 1000000.0, 0) AS BIGINT) AS xm,
          CAST(round(lm.lm_score * 1000000.0, 0) AS BIGINT) AS ym
        FROM q JOIN lm USING (doc_id)),
      agg AS (SELECT source, count(*) AS n, sum(xm) AS sx, sum(ym) AS sy,
          sum(xm * ym) AS sxy, sum(xm * xm) AS sxx, sum(ym * ym) AS syy
        FROM m GROUP BY 1)
      SELECT source, n,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
      FROM agg ORDER BY source"""))

  /** int8-quantized IVF ANN ([[Similarity.int8IvfTopK]]): quantized
    * storage AND bucketed search in one index — cell assignment, probe
    * ranking, and scoring are all the exact-integer int8 cosine, so the
    * whole approximate index replays bit-for-bit in the oracle (the
    * rounding matches: both engines round half away from zero). The
    * brute-force int8 checkpoint remains as [[Similarity.int8TopK]]
    * (recall-spec'd against float in OperatorSpecs); the catalog entry is
    * the scale path — score-everything dies at 100× the corpus, cell
    * probing doesn't. */
  private val q101 = {
    val (nlist, nprobe) = (16, 4)
    val i8cos = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q101_ann_int8",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.int8IvfTopK(emb, emb.where(col("vec_id") < 8), k = 5,
            nlist = nlist, nprobe = nprobe)
          .select(col("query_id"), col("rank"), col("neighbor_id"),
            round(col("q_cosine"), 6).as("q_cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH qz AS (SELECT vec_id,
          list_transform(embedding::DOUBLE[], x -> round(x * 127.0 /
            list_max(list_transform(embedding::DOUBLE[], y -> abs(y))), 0)) AS v
          FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cent_vec FROM qz
          WHERE vec_id < $nlist),
        c AS (SELECT vec_id AS neighbor_id, v AS cv FROM qz),
        assigned AS (SELECT neighbor_id, cv, cid FROM (
            SELECT neighbor_id, cv, cid,
              row_number() OVER (PARTITION BY neighbor_id
                ORDER BY ${i8cos("cv", "cent_vec")} DESC, cid) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, v AS qv FROM qz WHERE vec_id < 8),
        probes AS (SELECT query_id, qv, cid FROM (
            SELECT query_id, qv, cid,
              row_number() OVER (PARTITION BY query_id
                ORDER BY ${i8cos("qv", "cent_vec")} DESC, cid) AS rn
            FROM q CROSS JOIN cent) WHERE rn <= $nprobe),
        scored AS (SELECT query_id, neighbor_id,
            ${i8cos("qv", "cv")} AS q_cosine
          FROM assigned JOIN probes USING (cid)
          WHERE query_id <> neighbor_id),
        ranked AS (SELECT query_id, neighbor_id, q_cosine,
            row_number() OVER (PARTITION BY query_id
              ORDER BY q_cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, rank, neighbor_id, round(q_cosine, 6) AS q_cosine
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""))
  }

  /** Cross-corpus LM scoring ([[TextAnalysis.charLmScoreAgainst]]): every
    * document scored under a model trained ONLY on the doc_id%7=0 reference
    * slice — the CCNet trusted-reference perplexity filter, with unseen
    * bigrams surfaced as `oov_bigrams` instead of smoothed away. */
  private val q102 = QuerySpec(
    "q102_cross_lm_score",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.charLmScoreAgainst(
          docs.where(col("doc_id") % 7 === 0), docs, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH rbg AS (SELECT
        unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
      FROM documents WHERE doc_id % 7 = 0),
      cab AS (SELECT bg, CAST(count(*) AS BIGINT) AS cab FROM rbg GROUP BY 1),
      ca AS (SELECT substr(bg, 1, 1) AS pfx, CAST(sum(cab) AS BIGINT) AS ca
        FROM cab GROUP BY 1),
      model AS (SELECT bg, cab, ca FROM cab JOIN ca
        ON substr(cab.bg, 1, 1) = ca.pfx),
      dbg AS (SELECT doc_id,
          unnest(list_transform(range(1, length(text)), i -> substr(text, i, 2))) AS bg
        FROM documents),
      dbgc AS (SELECT doc_id, bg, count(*) AS n FROM dbg GROUP BY 1, 2)
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        CAST(coalesce(sum(n) FILTER (WHERE cab IS NULL), 0) AS BIGINT)
          AS oov_bigrams,
        round(sum(n * ln(CAST(cab AS DOUBLE) / ca)) FILTER (WHERE cab IS NOT NULL)
          / CAST(sum(n) FILTER (WHERE cab IS NOT NULL) AS DOUBLE), 6) AS lm_score
      FROM dbgc LEFT JOIN model USING (bg)
      GROUP BY 1 ORDER BY 1"""))

  /** Quality-weighted per-source subsample
    * ([[graft.operators.ScaleOps.weightedCapPerKey]], Efraimidis–Spirakis
    * A-Res with the md5 uniform): 5 docs per source, selection probability
    * proportional to quality — reproducible bit-for-bit because the
    * "random" draw is the engine-portable hash. */
  private val q103 = QuerySpec(
    "q103_weighted_sample",
    (s, dir) => graft.operators.ScaleOps.weightedCapPerKey(
        t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextAnalysis.qualityScore(col("text")).as("quality")),
        "source", "doc_id", col("quality"), cap = 5)
      .orderBy(col("source"), col("doc_id")),
    Some(s"""WITH scored AS (SELECT doc_id, source, $QualityScoreSql AS quality
        FROM documents),
      keyed AS (SELECT doc_id, source, quality,
          pow((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 2147483647 + 1.0) / 2147483648.0,
            1.0 / quality) AS k
        FROM scored WHERE quality > 0),
      ranked AS (SELECT doc_id, source, quality, row_number() OVER (
          PARTITION BY source ORDER BY k DESC, doc_id) AS rn
        FROM keyed)
      SELECT doc_id, source, quality FROM ranked WHERE rn <= 5
      ORDER BY source, doc_id"""))

  /** Behavioral sequence assembly
    * ([[graft.operators.ScaleOps.orderedSequencePerKey]]): one
    * (ts, event_id)-ordered event-type sequence per user — the event-log →
    * training-sequence step, order pinned in-array (collect order is
    * nondeterministic; the sorted struct array is not). */
  private val q104 = QuerySpec(
    "q104_event_sequences",
    (s, dir) => graft.operators.ScaleOps.orderedSequencePerKey(
        t(s, dir, "events").where(col("user_id") < 200),
        "user_id", Seq("ts", "event_id"), "event_type")
      .orderBy(col("user_id")),
    Some("""SELECT user_id, count(*) AS n_items,
        string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
      FROM events WHERE user_id < 200 GROUP BY 1 ORDER BY 1"""))

  /** Temperature-targeted epoch materialization
    * ([[graft.operators.ScaleOps.epochPlanFromTemperature]]): α=0.5 weights
    * × a 30k-row budget → per-source copy factors → the deterministic
    * hash-mixed epoch — the full mix-design loop (q94's weights made
    * executable), oracle-replayed end to end. */
  private val q105 = {
    val budget = 30000L
    QuerySpec(
      "q105_epoch_plan",
      (s, dir) => graft.operators.ScaleOps.epochPlanFromTemperature(
          t(s, dir, "documents"), "source", "doc_id",
          alpha = 0.5, budgetRows = budget)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows_out"),
          countDistinct(col("doc_id")).as("n_docs"),
          max(col("copy_idx")).as("max_copy"))
        .orderBy(col("source")),
      Some(s"""WITH counts AS (SELECT source, count(*) AS n_rows
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM counts),
        scored AS (SELECT source, n_rows,
            CAST(round(pow(CAST(n_rows AS DOUBLE) / n_total, 0.5) * 1000000.0, 0)
              AS BIGINT) AS p_micro
          FROM counts CROSS JOIN tot),
        denom AS (SELECT CAST(sum(p_micro) AS BIGINT) AS micro_total FROM scored),
        wts AS (SELECT source, n_rows,
            round(CAST(p_micro AS DOUBLE) / micro_total, 6) AS weight
          FROM scored CROSS JOIN denom),
        plan AS (SELECT source,
            CAST(round(1000.0 * $budget * weight / n_rows, 0) AS BIGINT) AS cp
          FROM wts),
        w AS (SELECT d.doc_id, d.source,
            (cp // 1000) + (CASE WHEN
              ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 2147483647 % 1000 < cp % 1000 THEN 1 ELSE 0 END) AS n_copies
          FROM documents d JOIN plan USING (source)),
        mixed AS (SELECT doc_id, source, unnest(range(n_copies)) AS copy_idx
          FROM w WHERE n_copies > 0)
        SELECT source, count(*) AS n_rows_out,
          count(DISTINCT doc_id) AS n_docs,
          CAST(max(copy_idx) AS BIGINT) AS max_copy
        FROM mixed GROUP BY 1 ORDER BY 1"""))
  }

  /** Pattern-class redaction ([[TextAnalysis.redactPatterns]]) — q44's
    * fixed PII scrub generalized to configurable (class, regex) pairs WITH
    * per-class occurrence counts: per-doc counts + the md5 of the
    * rewritten text, value-checked end to end (the hash pins every
    * replacement position). Patterns stay in the Java∩RE2 common dialect
    * so both engines run the SAME regexes. */
  private val q106 = QuerySpec(
    "q106_redact_classes",
    (s, dir) => TextAnalysis.redactPatterns(t(s, dir, "documents"),
        "doc_id", "text",
        Seq("ent" -> "\\b(customer|supplier)\\b",
            "op" -> "\\b(scan|sort|merge)\\b"))
      .select(col("id"), col("n_ent"), col("n_op"),
        md5(col("redacted")).as("redacted_hash"))
      .orderBy(col("id")),
    Some("""SELECT doc_id AS id,
        CAST(len(regexp_extract_all(text, '\b(customer|supplier)\b')) AS BIGINT)
          AS n_ent,
        CAST(len(regexp_extract_all(text, '\b(scan|sort|merge)\b')) AS BIGINT)
          AS n_op,
        md5(regexp_replace(
          regexp_replace(text, '\b(customer|supplier)\b', '<ENT>', 'g'),
          '\b(scan|sort|merge)\b', '<OP>', 'g')) AS redacted_hash
      FROM documents ORDER BY id"""))

  /** Deterministic training shuffle ([[graft.operators.ScaleOps.shardShuffle]]):
    * every doc gets (shard, pos) from the md5 hash — the reproducible
    * pseudo-random read order a trainer consumes, oracle-replayed exactly
    * (same hash family ⇒ same permutation in both engines). */
  private val q107 = QuerySpec(
    "q107_shard_shuffle",
    (s, dir) => graft.operators.ScaleOps.shardShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", numShards = 16)
      .orderBy(col("shard"), col("pos")),
    Some("""WITH h AS (SELECT doc_id, source,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM documents)
      SELECT doc_id, source, CAST(hv % 16 AS INT) AS shard,
        row_number() OVER (PARTITION BY hv % 16 ORDER BY hv, doc_id) AS pos
      FROM h ORDER BY shard, pos"""))

  /** Context-window chunking ([[TextAnalysis.chunkByTokens]]): 16-token
    * windows, 4-token overlap (stride 12); the md5 chunk hash value-checks
    * every window's exact token span. */
  private val q108 = QuerySpec(
    "q108_chunk_windows",
    (s, dir) => TextAnalysis.chunkByTokens(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 16, overlap = 4)
      .orderBy(col("id"), col("chunk_idx")),
    Some("""WITH base AS (SELECT doc_id AS id, str_split(text, ' ') AS t,
          CAST(len(str_split(text, ' ')) AS BIGINT) AS n
        FROM documents),
      idx AS (SELECT id, t, unnest(range(0,
            1 + CAST(ceil(greatest(n - 16, 0) / 12.0) AS BIGINT))) AS chunk_idx
        FROM base),
      w AS (SELECT id, chunk_idx,
          list_slice(t, chunk_idx * 12 + 1, chunk_idx * 12 + 16) AS wt
        FROM idx)
      SELECT id, chunk_idx, CAST(len(wt) AS BIGINT) AS n_chunk_tokens,
        md5(array_to_string(wt, ' ')) AS chunk_hash
      FROM w ORDER BY id, chunk_idx"""))

  /** q109's oracle CTE chain — naive-Bayes train + score + per-doc argmax
    * rank, verbatim — shared by q179 (margins) and q180 (agreement), which
    * put different finals on `ranked`. */
  private val NbOracleCtes = """tk AS (SELECT doc_id AS id, lang AS label,
          unnest(str_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT id, label, tok, CAST(count(*) AS BIGINT) AS c
        FROM tk GROUP BY 1, 2, 3),
      ckt AS (SELECT label AS cls, tok, CAST(sum(c) AS BIGINT) AS kct
        FROM tf GROUP BY 1, 2),
      ctot AS (SELECT cls, CAST(sum(kct) AS BIGINT) AS ctot FROM ckt GROUP BY 1),
      vocab AS (SELECT DISTINCT tok FROM tf),
      vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
      dpc AS (SELECT lang AS cls, count(*) AS nd FROM documents GROUP BY 1),
      tot AS (SELECT count(*) AS ntot FROM documents),
      priors AS (SELECT cls,
          CAST(round(ln(CAST(nd AS DOUBLE) / ntot) * 1000000.0, 0) AS BIGINT)
            AS prq
        FROM dpc CROSS JOIN tot),
      model AS (SELECT vocab.tok, ct.cls,
          CAST(round(ln((coalesce(k.kct, 0) + 1.0) / (ct.ctot + vs.v))
            * 1000000.0, 0) AS BIGINT) AS llq
        FROM vocab CROSS JOIN ctot ct CROSS JOIN vs
        LEFT JOIN ckt k ON k.tok = vocab.tok AND k.cls = ct.cls),
      post AS (SELECT tf.id, tf.label, m.cls,
          CAST(sum(tf.c * m.llq) AS BIGINT) AS ll
        FROM tf JOIN model m ON m.tok = tf.tok GROUP BY 1, 2, 3),
      scored AS (SELECT post.id, post.label, post.cls,
          post.ll + p.prq AS post_q
        FROM post JOIN priors p ON p.cls = post.cls),
      ranked AS (SELECT id, label, cls, post_q, row_number() OVER (
          PARTITION BY id ORDER BY post_q DESC, cls) AS rn
        FROM scored)"""

  /** Self-trained naive-Bayes language classifier
    * ([[TextAnalysis.naiveBayesPredict]] on the `lang` label): closed-form
    * multinomial fit, micro-nat integer posteriors ⇒ the argmax (and every
    * tie) is engine-exact, so predicted labels hash-match — the
    * quality/language-filter stage of the curation recipes with its
    * training loop replayed by the oracle. */
  private val q109 = QuerySpec(
    "q109_nb_predict",
    (s, dir) => TextAnalysis.naiveBayesPredict(t(s, dir, "documents"),
        "doc_id", "text", "lang")
      .orderBy(col("id")),
    Some(s"""WITH $NbOracleCtes
      SELECT id, label, cls AS predicted, post_q, (cls = label) AS correct
      FROM ranked WHERE rn = 1 ORDER BY id"""))

  /** Per-source z-score ensemble gate
    * ([[graft.operators.ScaleOps.zscoreBlend]]): three quality signals
    * standardized within source and blended 0.5/0.3/0.2 — the multi-signal
    * curation rank with exact integer moments (z and blend bit-match). */
  private val q110 = QuerySpec(
    "q110_zscore_blend",
    (s, dir) => {
      val toks = split(col("text"), " ")
      graft.operators.ScaleOps.zscoreBlend(t(s, dir, "documents"),
        "source", "doc_id", Seq(
          ("quality", TextAnalysis.qualityScore(col("text")), 0.5),
          ("dr", size(array_distinct(toks)).cast("double") / size(toks), 0.3),
          ("len", log(lit(1.0) + col("n_chars")), 0.2)))
        .orderBy(col("id"))
    },
    Some(s"""WITH sig AS (SELECT doc_id AS id, source AS grp,
        CAST(round($QualityScoreSql * 1000000.0, 0) AS BIGINT) AS m_q,
        CAST(round((CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
          / len(str_split(text, ' '))) * 1000000.0, 0) AS BIGINT) AS m_dr,
        CAST(round(ln(1.0 + n_chars) * 1000000.0, 0) AS BIGINT) AS m_len
      FROM documents),
      st AS (SELECT grp, count(*) AS n,
          CAST(sum(m_q) AS BIGINT) AS s_q, CAST(sum(m_q*m_q) AS BIGINT) AS ss_q,
          CAST(sum(m_dr) AS BIGINT) AS s_dr, CAST(sum(m_dr*m_dr) AS BIGINT) AS ss_dr,
          CAST(sum(m_len) AS BIGINT) AS s_len, CAST(sum(m_len*m_len) AS BIGINT) AS ss_len
        FROM sig GROUP BY 1),
      z AS (SELECT sig.id, sig.grp,
          CASE WHEN n > 1 AND sqrt((CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0)) > 0
            THEN (CAST(m_q AS DOUBLE) - CAST(s_q AS DOUBLE)/CAST(n AS DOUBLE))
              / sqrt((CAST(ss_q AS DOUBLE) - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0))
            ELSE 0.0 END AS z_q,
          CASE WHEN n > 1 AND sqrt((CAST(ss_dr AS DOUBLE) - CAST(s_dr AS DOUBLE)*CAST(s_dr AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0)) > 0
            THEN (CAST(m_dr AS DOUBLE) - CAST(s_dr AS DOUBLE)/CAST(n AS DOUBLE))
              / sqrt((CAST(ss_dr AS DOUBLE) - CAST(s_dr AS DOUBLE)*CAST(s_dr AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0))
            ELSE 0.0 END AS z_dr,
          CASE WHEN n > 1 AND sqrt((CAST(ss_len AS DOUBLE) - CAST(s_len AS DOUBLE)*CAST(s_len AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0)) > 0
            THEN (CAST(m_len AS DOUBLE) - CAST(s_len AS DOUBLE)/CAST(n AS DOUBLE))
              / sqrt((CAST(ss_len AS DOUBLE) - CAST(s_len AS DOUBLE)*CAST(s_len AS DOUBLE)/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE) - 1.0))
            ELSE 0.0 END AS z_len
        FROM sig JOIN st USING (grp))
      SELECT id, grp, round(z_q, 6) AS z_quality, round(z_dr, 6) AS z_dr,
        round(z_len, 6) AS z_len,
        round(z_q * CAST(0.5 AS DOUBLE) + z_dr * CAST(0.3 AS DOUBLE)
          + z_len * CAST(0.2 AS DOUBLE), 6) AS blend
      FROM z ORDER BY id"""))

  /** Embedding cluster-quality gauge ([[Similarity.clusterQuality]]):
    * per-label cohesion vs nearest-other-prototype cosine and the margin
    * between them — the label-noise/split-leak early warning. */
  private val q111 = {
    val cosSql = (a: String, b: String) =>
      s"""list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]),
          (x, y) -> x + y) /
        (sqrt(list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i]),
          (x, y) -> x + y)) *
         sqrt(list_reduce(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]),
          (x, y) -> x + y)))"""
    QuerySpec(
      "q111_cluster_quality",
      (s, dir) => Similarity.clusterQuality(t(s, dir, "embeddings"))
        .orderBy(col("label")),
      Some(s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
          FROM embeddings),
        dims AS (SELECT label, i AS pos,
            CAST(round(v[i] * 1000000.0, 0) AS BIGINT) AS micro
          FROM e, LATERAL unnest(range(1, len(v) + 1)) AS u(i)),
        proto AS (SELECT label, pos, CAST(sum(micro) AS BIGINT) AS s_micro,
            count(*) AS np
          FROM dims GROUP BY 1, 2),
        pvec AS (SELECT label, list(CAST(s_micro AS DOUBLE) / np ORDER BY pos)
            AS p FROM proto GROUP BY 1),
        coh AS (SELECT e.label, count(*) AS n,
            CAST(sum(CAST(round(${cosSql("v", "p")} * 1000000.0, 0) AS BIGINT))
              AS BIGINT) AS s_cm
          FROM e JOIN pvec USING (label) GROUP BY 1),
        cohesion AS (SELECT label, n,
            CAST(s_cm AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0 AS cohesion
          FROM coh),
        pairs AS (SELECT a.label, b.label AS nn_label,
            ${cosSql("a.p", "b.p")} AS nn_cosine
          FROM pvec a JOIN pvec b ON a.label <> b.label),
        nearest AS (SELECT label, nn_label, nn_cosine, row_number() OVER (
            PARTITION BY label ORDER BY nn_cosine DESC, nn_label) AS rn
          FROM pairs)
        SELECT c.label, c.n, round(c.cohesion, 6) AS cohesion, nr.nn_label,
          round(nr.nn_cosine, 6) AS nn_cosine,
          round(c.cohesion - nr.nn_cosine, 6) AS margin
        FROM cohesion c JOIN nearest nr ON nr.label = c.label AND nr.rn = 1
        ORDER BY c.label"""))
  }

  /** Unigram drift movers ([[TextAnalysis.unigramDriftMovers]]): the 20
    * tokens whose probability differs most between the en and de slices —
    * the crawl-drift monitoring readout, exact integer deltas. */
  private val q112 = QuerySpec(
    "q112_unigram_drift",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.unigramDriftMovers(
          docs.where(col("lang") === "en"), docs.where(col("lang") === "de"),
          "text", k = 20)
        .orderBy(col("rnk"))
    },
    Some("""WITH ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_a FROM
        (SELECT unnest(str_split(text, ' ')) AS tok FROM documents
         WHERE lang = 'en') GROUP BY 1),
      cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_b FROM
        (SELECT unnest(str_split(text, ' ')) AS tok FROM documents
         WHERE lang = 'de') GROUP BY 1),
      tot AS (SELECT (SELECT CAST(sum(c_a) AS BIGINT) FROM ca) AS tot_a,
        (SELECT CAST(sum(c_b) AS BIGINT) FROM cb) AS tot_b),
      j AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
          coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b,
          CAST(round(CAST(coalesce(c_a, 0) AS DOUBLE) * 1000000.0 / tot_a, 0)
            AS BIGINT) AS pa_micro,
          CAST(round(CAST(coalesce(c_b, 0) AS DOUBLE) * 1000000.0 / tot_b, 0)
            AS BIGINT) AS pb_micro
        FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok CROSS JOIN tot),
      d AS (SELECT tok, c_a, c_b, pa_micro, pb_micro,
          pa_micro - pb_micro AS delta_micro FROM j),
      r AS (SELECT tok, c_a, c_b, pa_micro, pb_micro, delta_micro,
          row_number() OVER (ORDER BY abs(delta_micro) DESC, tok) AS rnk
        FROM d)
      SELECT tok, c_a, c_b, pa_micro, pb_micro, delta_micro, rnk
      FROM r WHERE rnk <= 20 ORDER BY rnk"""))

  /** Greedy ordered funnel ([[graft.operators.EventOps.funnelSteps]]):
    * signup → view → click → purchase per user, counted per stage. The
    * oracle replays the equivalent chained-first-occurrence form: stage k's
    * match is the earliest (ts, event_id) of that type strictly after
    * stage k-1's match — provably the same greedy subsequence walk the
    * Spark-side fold performs in one pass. */
  private val q113 = QuerySpec(
    "q113_funnel_steps",
    (s, dir) => graft.operators.EventOps.funnelSteps(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"), "event_type",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step")),
    Some("""WITH
      s1 AS (SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'signup') WHERE rn = 1),
      s2 AS (SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
          row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s1 ON e.user_id = s1.user_id
          AND (e.ts, e.event_id) > (s1.ts, s1.event_id)
        WHERE e.event_type = 'view') WHERE rn = 1),
      s3 AS (SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
          row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s2 ON e.user_id = s2.user_id
          AND (e.ts, e.event_id) > (s2.ts, s2.event_id)
        WHERE e.event_type = 'click') WHERE rn = 1),
      s4 AS (SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
          row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s3 ON e.user_id = s3.user_id
          AND (e.ts, e.event_id) > (s3.ts, s3.event_id)
        WHERE e.event_type = 'purchase') WHERE rn = 1)
      SELECT 1 AS step, 'signup' AS step_name, count(*) AS users FROM s1
      UNION ALL SELECT 2, 'view', count(*) FROM s2
      UNION ALL SELECT 3, 'click', count(*) FROM s3
      UNION ALL SELECT 4, 'purchase', count(*) FROM s4
      ORDER BY step"""))

  /** First-order event-type transition matrix
    * ([[graft.operators.EventOps.eventTransitions]]): per-user lag
    * adjacency counts + row-normalized micro-probabilities. */
  private val q114 = QuerySpec(
    "q114_event_transitions",
    (s, dir) => graft.operators.EventOps.eventTransitions(
        t(s, dir, "events"), "user_id", Seq("ts", "event_id"), "event_type")
      .orderBy(col("prev_type"), col("next_type")),
    Some("""WITH p AS (SELECT
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type,
        event_type AS next_type
      FROM events),
      c AS (SELECT prev_type, next_type, count(*) AS n FROM p
        WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
        CAST(round(n * 1000000.0 / sum(n) OVER (PARTITION BY prev_type), 0)
          AS BIGINT) AS p_micro
      FROM c ORDER BY 1, 2"""))

  /** Trailing 1-hour rolling features
    * ([[graft.operators.EventOps.trailingStats]]): per event, the same
    * user's event count and value sum over the closed trailing hour — the
    * RANGE-frame window shape that replaces the quadratic time-predicate
    * self-join. */
  private val q115 = QuerySpec(
    "q115_rolling_stats",
    (s, dir) => graft.operators.EventOps.trailingStats(
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          expr("ts div 1000000000").as("ts_sec"), col("value")),
        "user_id", col("ts_sec"), "value", trailingSec = 3600L)
      .select(col("event_id"), col("n_trail"),
        round(col("sum_trail"), 2).as("sum_trail"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id,
        count(*) OVER w AS n_trail,
        round(sum(value) OVER w, 2) AS sum_trail
      FROM (SELECT event_id, user_id, value,
          epoch_ns(ts) // 1000000000 AS ts_sec FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Retention cohorts ([[graft.operators.EventOps.retentionCohorts]]):
    * users cohorted by first active day, activity counted per
    * (cohort_day, day_offset) cell — one shuffle, per-user distinct days
    * collapsing map-side. */
  private val q116 = QuerySpec(
    "q116_retention_cohorts",
    (s, dir) => graft.operators.EventOps.retentionCohorts(
        t(s, dir, "events"), "user_id", expr("ts div 86400000000000"))
      .orderBy(col("cohort_day"), col("day_offset")),
    Some("""WITH d AS (SELECT DISTINCT user_id,
        epoch_ns(ts) // 86400000000000 AS day FROM events),
      f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
      SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
        count(*) AS n_users
      FROM d JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Mergeable HLL distinct rollup
    * ([[graft.operators.ScaleOps.sketchDistinctRollup]]): daily user
    * sketches unioned into weekly actives — re-aggregation WITHOUT
    * re-scanning raw events. Oracle = the q32 checked-sketch pattern: the
    * exact twin plus the (provably TRUE) error-bound flag; a sketch
    * drifting out of bound flips the flag and fails the hash match. */
  private val q117 = QuerySpec(
    "q117_sketch_rollup",
    (s, dir) => graft.operators.ScaleOps.sketchDistinctRollup(
        t(s, dir, "events"), expr("ts div 86400000000000"), "user_id",
        day => floor(day / 7))
      .orderBy(col("rollup")),
    Some("""WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day, user_id
        FROM events)
      SELECT day // 7 AS rollup,
        CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        TRUE AS within_bound
      FROM d GROUP BY 1 ORDER BY 1"""))

  /** Population-stability drift gate ([[graft.operators.ScaleOps.psiDrift]]):
    * per-source PSI of the n_chars length distribution (50-char bins) vs the
    * pooled rest — the "did this source/snapshot drift?" scalar. Exact
    * cross-engine: each bin's term rounds to integer micro-units BEFORE the
    * per-group sum (ln's last-ulp wobble is absorbed; the BIGINT sum is
    * fold-order-free). Oracle replays the same dense grid / complement
    * arithmetic over bounded CTEs. */
  private val q118 = QuerySpec(
    "q118_psi_drift",
    (s, dir) => graft.operators.ScaleOps.psiDrift(
        t(s, dir, "documents"), "source", expr("n_chars div 50"))
      .orderBy(col("source")),
    Some("""WITH counts AS (SELECT source AS g, n_chars // 50 AS bin,
        count(*) AS c FROM documents GROUP BY 1, 2),
      gs AS (SELECT DISTINCT g FROM counts),
      bs AS (SELECT DISTINCT bin FROM counts),
      grid AS (SELECT gs.g, bs.bin, coalesce(counts.c, 0) AS c
        FROM gs CROSS JOIN bs
        LEFT JOIN counts ON counts.g = gs.g AND counts.bin = bs.bin),
      tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot_g, count(*) AS nb
        FROM grid GROUP BY 1),
      bint AS (SELECT bin, CAST(sum(c) AS BIGINT) AS glob_bin
        FROM grid GROUP BY 1),
      gt AS (SELECT CAST(sum(c) AS BIGINT) AS grand FROM grid),
      terms AS (SELECT grid.g,
          (CAST(grid.c AS DOUBLE) + 1)
            / (CAST(tot.tot_g AS DOUBLE) + 1 * CAST(tot.nb AS DOUBLE)) AS pa,
          (CAST(bint.glob_bin - grid.c AS DOUBLE) + 1)
            / (CAST(gt.grand - tot.tot_g AS DOUBLE)
               + 1 * CAST(tot.nb AS DOUBLE)) AS pb
        FROM grid JOIN tot ON tot.g = grid.g
        JOIN bint ON bint.bin = grid.bin CROSS JOIN gt)
      SELECT g AS source,
        CAST(sum(CAST(round((pa - pb) * ln(pa / pb) * 1000000.0, 0)
          AS BIGINT)) AS BIGINT) AS psi_micro
      FROM terms GROUP BY 1 ORDER BY 1"""))

  /** Categorical PSI drift ([[graft.operators.ScaleOps.psiDriftCategorical]]):
    * per-source drift of the LANGUAGE distribution vs the pooled rest —
    * the q118 grid arithmetic with the bin key passed through as a string
    * (language/license/format gates need no numeric binning). */
  private val q120 = QuerySpec(
    "q120_psi_lang",
    (s, dir) => graft.operators.ScaleOps.psiDriftCategorical(
        t(s, dir, "documents"), "source", col("lang"))
      .orderBy(col("source")),
    Some("""WITH counts AS (SELECT source AS g, lang AS bin,
        count(*) AS c FROM documents GROUP BY 1, 2),
      gs AS (SELECT DISTINCT g FROM counts),
      bs AS (SELECT DISTINCT bin FROM counts),
      grid AS (SELECT gs.g, bs.bin, coalesce(counts.c, 0) AS c
        FROM gs CROSS JOIN bs
        LEFT JOIN counts ON counts.g = gs.g AND counts.bin = bs.bin),
      tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot_g, count(*) AS nb
        FROM grid GROUP BY 1),
      bint AS (SELECT bin, CAST(sum(c) AS BIGINT) AS glob_bin
        FROM grid GROUP BY 1),
      gt AS (SELECT CAST(sum(c) AS BIGINT) AS grand FROM grid),
      terms AS (SELECT grid.g,
          (CAST(grid.c AS DOUBLE) + 1)
            / (CAST(tot.tot_g AS DOUBLE) + 1 * CAST(tot.nb AS DOUBLE)) AS pa,
          (CAST(bint.glob_bin - grid.c AS DOUBLE) + 1)
            / (CAST(gt.grand - tot.tot_g AS DOUBLE)
               + 1 * CAST(tot.nb AS DOUBLE)) AS pb
        FROM grid JOIN tot ON tot.g = grid.g
        JOIN bint ON bint.bin = grid.bin CROSS JOIN gt)
      SELECT g AS source,
        CAST(sum(CAST(round((pa - pb) * ln(pa / pb) * 1000000.0, 0)
          AS BIGINT)) AS BIGINT) AS psi_micro
      FROM terms GROUP BY 1 ORDER BY 1"""))

  /** Reference-based PSI ([[graft.operators.ScaleOps.psiVsReference]]): each
    * source's length distribution vs the FULL corpus histogram — the
    * textbook current-vs-expected stability form (q118 is vs pooled rest);
    * reference = the whole-corpus n_chars histogram, so a source matching
    * the corpus mix scores ~0 and an outlier source pops. */
  private val q121 = QuerySpec(
    "q121_psi_vs_reference",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val ref = docs.select(expr("n_chars div 50").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("c"))
      graft.operators.ScaleOps.psiVsReference(
          docs, "source", expr("n_chars div 50"), ref)
        .orderBy(col("source"))
    },
    Some("""WITH counts AS (SELECT source AS g, n_chars // 50 AS bin,
        count(*) AS c FROM documents GROUP BY 1, 2),
      ref AS (SELECT n_chars // 50 AS bin, count(*) AS rc
        FROM documents GROUP BY 1),
      gs AS (SELECT DISTINCT g FROM counts),
      bs AS (SELECT DISTINCT bin FROM
        (SELECT bin FROM counts UNION SELECT bin FROM ref)),
      grid AS (SELECT gs.g, bs.bin, coalesce(counts.c, 0) AS c,
          coalesce(ref.rc, 0) AS rc
        FROM gs CROSS JOIN bs
        LEFT JOIN counts ON counts.g = gs.g AND counts.bin = bs.bin
        LEFT JOIN ref ON ref.bin = bs.bin),
      tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS tot_g, count(*) AS nb
        FROM grid GROUP BY 1),
      rt AS (SELECT CAST(sum(rc) AS BIGINT) AS ref_tot FROM ref),
      terms AS (SELECT grid.g,
          (CAST(grid.c AS DOUBLE) + 1)
            / (CAST(tot.tot_g AS DOUBLE) + 1 * CAST(tot.nb AS DOUBLE)) AS pa,
          (CAST(grid.rc AS DOUBLE) + 1)
            / (CAST(rt.ref_tot AS DOUBLE) + 1 * CAST(tot.nb AS DOUBLE)) AS pb
        FROM grid JOIN tot ON tot.g = grid.g CROSS JOIN rt)
      SELECT g AS source,
        CAST(sum(CAST(round((pa - pb) * ln(pa / pb) * 1000000.0, 0)
          AS BIGINT)) AS BIGINT) AS psi_micro
      FROM terms GROUP BY 1 ORDER BY 1"""))

  /** Last-touch conversion attribution
    * ([[graft.operators.EventOps.lastTouchAttribution]]): each purchase is
    * credited to the user's most recent prior click/view ("direct" when
    * nothing precedes) — one exchange on user_id, the running last-touch
    * carried by a ROWS frame ending at -1, never a per-conversion lookback
    * self-join. */
  private val q119 = QuerySpec(
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
  private val q122 = QuerySpec(
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
  private val q123 = QuerySpec(
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
  private val q124 = QuerySpec(
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
  private val q125 = QuerySpec(
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
  private val q126 = QuerySpec(
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
  private val q127 = QuerySpec(
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
  private val q128 = QuerySpec(
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
  private val q129 = QuerySpec(
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
  private val q130 = QuerySpec(
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
  private val q131 = QuerySpec(
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
  private val q132 = QuerySpec(
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
  private val q133 = QuerySpec(
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
  private val q134 = QuerySpec(
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
  private val q135 = QuerySpec(
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
  private val q136 = QuerySpec(
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
  private val q137 = {
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
  private val q138 = QuerySpec(
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
  private val q139 = QuerySpec(
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
  private val q140 = QuerySpec(
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
  private val q141 = QuerySpec(
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
  private val q142 = QuerySpec(
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
  private val q143 = QuerySpec(
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
  private val q144 = QuerySpec(
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
  private val q145 = QuerySpec(
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
  private val q146 = QuerySpec(
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
  private val q147 = QuerySpec(
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
  private val q148 = QuerySpec(
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
  private val q149 = QuerySpec(
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
  private val q150 = QuerySpec(
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
  private val q151 = QuerySpec(
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
  private val q152 = QuerySpec(
    "q152_shipping_lag",
    (s, dir) => t(s, dir, "orders")
      .join(t(s, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
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
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, count(*) AS n_lines,
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
      GROUP BY 1 ORDER BY 1"""))

  /** Per-nation ABC (Pareto) customer classes: rank customers by revenue
    * within their nation, class A = the head covering ≤ 70% of nation
    * revenue, B to ≤ 90%, C the tail — cumulative shares tested by exact
    * integer cross-multiplication of micro sums (no float share forms).
    * Partitioned windows keep the rank parallel per nation. */
  private val q153 = QuerySpec(
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
  private val q154 = QuerySpec(
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
  private val q155 = QuerySpec(
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
  private val q156 = QuerySpec(
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
  private val q157 = QuerySpec(
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
  private val q158 = {
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
  private val q159 = QuerySpec(
    "q159_crosslang_dups",
    (s, dir) => {
      val fp = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
      fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
            col("a.lang") =!= col("b.lang"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
        .orderBy("id_a", "id_b")
    },
    Some("""WITH fp AS (SELECT doc_id, lang,
        CASE WHEN len(str_split(text, ' ')) = 0 THEN 0
          ELSE list_reduce(
            list_transform(str_split(text, ' '),
              t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 100003),
            (acc, x) -> (acc * 31 + x) % 1000000007)
        END AS fp
        FROM documents)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        a.lang AS lang_a, b.lang AS lang_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        AND a.lang <> b.lang
      ORDER BY 1, 2"""))

  /** Benford first-digit profile of order values — the classic
    * fabricated-numbers screen auditors run on financial columns. Digit
    * extraction goes through exact integer cents rendered as a string
    * (integer-to-string is engine-identical where double formatting is
    * not); shares are integer-division micros against a 1-row total. */
  private val q160 = QuerySpec(
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
  private def channelFact(df: DataFrame): DataFrame =
    df.select(col("brand"), col("channel"), col("audience"), col("year"),
        col("month"), col("zip_code"), col("dma"), col("state"),
        col("country"), round(col("reach"), 2).as("reach"),
        round(col("engage"), 2).as("engage"), round(col("cost"), 2).as("cost"))
      .orderBy(col("year"), col("month"), col("dma"))

  private val channelFactSelect =
    """SELECT brand, channel, audience, year, month, zip_code, dma, state,
      country, round(reach, 2) AS reach, round(engage, 2) AS engage,
      round(cost, 2) AS cost"""

  /** §2.11 tam_ce (S1:94-183): calls→MDM→org chain, priority CASE,
    * inline budget VALUES, window allocation over (brand, year). */
  private val q161 = QuerySpec(
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
  private val q162 = QuerySpec(
    "q162_nvs_dtc_display",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcDisplay(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.ddChain}
      $channelFactSelect FROM dd_fin ORDER BY year, month, dma"""))

  /** §2.11 dtc_paid_search (S1:323-416). */
  private val q163 = QuerySpec(
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
  private val q164 = QuerySpec(
    "q164_nvs_dtc_poc",
    (s, dir) => {
      graft.jobs.NvsStaging.register(s, dir)
      channelFact(graft.jobs.NvsPipeline.dtcPoc(s))
    },
    Some(s"""WITH ${graft.jobs.NvsStaging.oracleCtes},
      ${graft.jobs.NvsStaging.dpChain}
      $channelFactSelect FROM dp_fin ORDER BY year, month, dma"""))

  /** §2.11 dtc_paid_social (S1:502-578): no cost cutoff, LEFT join. */
  private val q165 = QuerySpec(
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
  private val q166 = QuerySpec(
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
  private val q167 = QuerySpec(
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
  private val q168 = QuerySpec(
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
  private val q169 = QuerySpec(
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
  private val q170 = QuerySpec(
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
  private val q171 = QuerySpec(
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
  private val q172 = {
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
  private val q173 = {
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
  private val q174 = {
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
  private val q175 = {
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
  private val q176 = {
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
  private val q177 = QuerySpec(
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
  private val q178 = {
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
  private val q179 = {
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
  private val q180 = QuerySpec(
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
    Some {
      val hitExpr = TextAnalysis.StopwordsByLang.map { case (lang, ws) =>
        val list = ws.map(w => s"'$w'").mkString("[", ",", "]")
        s"CAST(len(list_filter(str_split(text, ' '), t -> list_contains($list, t))) AS BIGINT) AS ${lang}_hits"
      }.mkString(",\n          ")
      val langs = TextAnalysis.StopwordsByLang.map(_._1)
      val bestExpr = langs.map(l => s"${l}_hits").reduce((a, b) => s"greatest($a, $b)")
      val caseArms = langs.map(l => s"WHEN ${l}_hits = best THEN '$l'").mkString(" ")
      s"""WITH $NbOracleCtes,
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
    })

  /** Approximate functional-dependency audit
    * ([[graft.operators.DataChecks.fdViolations]], the TANE g₃ error):
    * (source → lang) / (lang → source) on documents and
    * (user_id → event_type) on events — min-rows-to-remove counts and
    * micro violation rates per declared dependency. */
  private val q181 = {
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
  private val q182 = QuerySpec(
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
  private val q183 = {
    val cuts = Seq(10L, 20L, 50L, 100L, 200L, 500L, 1000L, 2000L, 5000L)
    QuerySpec(
      "q183_vocab_growth",
      (s, dir) => TextAnalysis.vocabGrowth(t(s, dir, "documents"),
          "doc_id", "text", cuts)
        .orderBy(col("cut_id")),
      Some(s"""WITH toks AS (SELECT doc_id, unnest(str_split(text, ' '))
            AS tok FROM documents),
        fs AS (SELECT tok, min(doc_id) AS first_id FROM toks GROUP BY 1),
        grid AS (SELECT unnest([${cuts.mkString(", ")}]::BIGINT[])
            AS cut_id),
        v AS (SELECT cut_id,
            CAST(count(*) FILTER (WHERE first_id <= cut_id) AS BIGINT)
              AS vocab_size
          FROM fs CROSS JOIN grid GROUP BY 1),
        d AS (SELECT cut_id,
            CAST(count(*) FILTER (WHERE doc_id <= cut_id) AS BIGINT)
              AS n_docs,
            CAST(coalesce(sum(len(str_split(text, ' ')))
              FILTER (WHERE doc_id <= cut_id), 0) AS BIGINT) AS cum_tokens
          FROM documents CROSS JOIN grid GROUP BY 1)
        SELECT cut_id, n_docs, cum_tokens, vocab_size
        FROM d JOIN v USING (cut_id) ORDER BY cut_id"""))
  }

  /** 2-criteria Pareto frontier ([[graft.operators.ScaleOps
    * .paretoFrontier]]): docs not dominated under (maximize distinct-token
    * types, minimize total tokens) — the lexical-density skyline. The
    * oracle replays the prefix-max formulation (sort + RANGE window);
    * the engine runs it distributed (bucketed prefix-max, no global
    * sort) — same rows either way. */
  private val q184 = QuerySpec(
    "q184_pareto_frontier",
    (s, dir) => graft.operators.ScaleOps.paretoFrontier(
        t(s, dir, "documents").select(col("doc_id"),
          size(graft.functions.TokenCounts(col("text"))).cast("long")
            .as("nd"),
          size(split(col("text"), " ")).cast("long").as("nt")),
        "doc_id", col("nd"), col("nt"))
      .orderBy(col("min_v"), col("max_v"), col("doc_id")),
    Some("""WITH pts AS (SELECT doc_id,
          CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS max_v,
          CAST(len(str_split(text, ' ')) AS BIGINT) AS min_v
        FROM documents),
      m AS (SELECT *,
          max(max_v) OVER (ORDER BY min_v
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mlt,
          max(max_v) OVER (PARTITION BY min_v) AS meq
        FROM pts)
      SELECT doc_id, max_v, min_v FROM m
      WHERE (mlt IS NULL OR mlt < max_v) AND meq <= max_v
      ORDER BY min_v, max_v, doc_id"""))

  /** Markov stationary distribution over event types
    * ([[graft.operators.EventOps.stationaryDistribution]]): q114's
    * transition matrix iterated 8 rounds from uniform, sink types
    * self-looped, every step floor-quantized to int64 micro so both
    * engines replay the identical integers (the oracle unrolls the 8
    * rounds as CTEs). */
  private val q185 = {
    val rounds = 8
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (SELECT e.next_type AS t,
            CAST(sum(p.pi * e.p_micro) // 1000000 AS BIGINT) AS pi
          FROM p${r - 1} p JOIN edges e ON e.prev_type = p.t GROUP BY 1)"""
    }.mkString(",\n        ")
    QuerySpec(
      "q185_stationary_markov",
      (s, dir) => graft.operators.EventOps.stationaryDistribution(
          t(s, dir, "events"), "user_id", Seq("ts", "event_id"),
          "event_type", rounds)
        .orderBy(col("event_type")),
      Some(s"""WITH p AS (SELECT
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type,
          event_type AS next_type
        FROM events),
        c AS (SELECT prev_type, next_type, count(*) AS n FROM p
          WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        trans AS (SELECT prev_type, next_type,
            CAST(round(n * 1000000.0 / sum(n) OVER (PARTITION BY prev_type),
              0) AS BIGINT) AS p_micro
          FROM c),
        types AS (SELECT DISTINCT event_type AS t FROM events),
        ntypes AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
        sinks AS (SELECT t AS prev_type, t AS next_type,
            CAST(1000000 AS BIGINT) AS p_micro FROM types
          WHERE t NOT IN (SELECT DISTINCT prev_type FROM trans)),
        edges AS (SELECT prev_type, next_type, p_micro FROM trans
          UNION ALL SELECT prev_type, next_type, p_micro FROM sinks),
        p0 AS (SELECT t, CAST(1000000 // k AS BIGINT) AS pi
          FROM types CROSS JOIN ntypes),
        $roundCtes
        SELECT ty.t AS event_type, CAST(coalesce(p.pi, 0) AS BIGINT)
          AS pi_micro
        FROM types ty LEFT JOIN p$rounds p ON p.t = ty.t
        ORDER BY event_type"""))
  }

  /** MMR diversified top-k ([[graft.operators.Retrieval.mmrTopK]]) over
    * the q88 BM25 candidates: greedy λ·relevance − (1−λ)·max-Jaccard
    * re-rank, exact permille·micro integers; the oracle unrolls the k
    * greedy steps (each an argmax LIMIT 1 over the not-yet-picked
    * candidates carrying the picked list forward). */
  private val q186 = {
    val terms = Seq("hash", "stream", "vector", "big")
    val termList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    val (c, k, lam) = (32, 10, 700L)
    val stepCtes = (2 to k).map { r =>
      s"""s$r AS (SELECT c.id, c.rel_n,
            ${lam} * c.rel_n - ${1000L - lam} * coalesce(
              (SELECT max(sim_micro) FROM sims
               WHERE (ida = c.id AND list_contains(s${r - 1}.picked, idb))
                  OR (idb = c.id AND list_contains(s${r - 1}.picked, ida))),
              0) AS mmr,
            list_append(s${r - 1}.picked, c.id) AS picked
          FROM cand c, s${r - 1}
          WHERE NOT list_contains(s${r - 1}.picked, c.id)
          ORDER BY mmr DESC, c.id LIMIT 1)"""
    }.mkString(",\n        ")
    val unionAll = (1 to k)
      .map(r => s"SELECT ${r}::BIGINT AS sel_rank, id, rel_n, mmr FROM s$r")
      .mkString("\n          UNION ALL ")
    QuerySpec(
      "q186_mmr_topk",
      (s, dir) => graft.operators.Retrieval.mmrTopK(
          t(s, dir, "documents"), "doc_id", "text", terms, c, k, lam)
        .select(col("sel_rank"), col("id").as("doc_id"),
          col("rel_n_micro"), col("mmr_q"))
        .orderBy(col("sel_rank")),
      // MATERIALIZED pins the shared CTEs: the k unrolled greedy steps each
      // reference `sims`/`cand`, and DuckDB's default inlining re-derives
      // the whole candidate pipeline per step (measured 36.9 s → 0.38 s at
      // sf0.1 — an unfair oracle, not a real baseline)
      Some(s"""WITH docs AS MATERIALIZED (SELECT doc_id,
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
        scored AS MATERIALIZED (SELECT doc_id,
            CAST(sum(micro) AS BIGINT) AS score_micro
          FROM term_scores GROUP BY 1
          ORDER BY score_micro DESC, doc_id LIMIT $c),
        mx AS (SELECT max(score_micro) AS ms FROM scored),
        cand AS MATERIALIZED (SELECT doc_id AS id,
            CAST((score_micro * 1000000) // ms AS BIGINT) AS rel_n
          FROM scored CROSS JOIN mx),
        ctoks AS MATERIALIZED (SELECT doc_id AS id,
            unnest(list_distinct(toks)) AS tok
          FROM docs WHERE doc_id IN (SELECT id FROM cand)),
        csize AS (SELECT id, CAST(count(*) AS BIGINT) AS nt FROM ctoks
          GROUP BY 1),
        sims AS MATERIALIZED (SELECT a.id AS ida, b.id AS idb,
            CAST((count(*) * 1000000) //
              (any_value(sa.nt) + any_value(sb.nt) - count(*)) AS BIGINT)
              AS sim_micro
          FROM ctoks a JOIN ctoks b ON a.tok = b.tok AND a.id < b.id
          JOIN csize sa ON sa.id = a.id JOIN csize sb ON sb.id = b.id
          GROUP BY a.id, b.id),
        s1 AS (SELECT id, rel_n, ${lam} * rel_n AS mmr, [id] AS picked
          FROM cand ORDER BY mmr DESC, id LIMIT 1),
        $stepCtes
        SELECT sel_rank, id AS doc_id, CAST(rel_n AS BIGINT)
            AS rel_n_micro, CAST(mmr AS BIGINT) AS mmr_q
        FROM ($unionAll)
        ORDER BY sel_rank"""))
  }

  /** Per-dimension embedding hygiene audit ([[Similarity
    * .embeddingAudit]]): n/mean/variance/zero-fraction per coordinate in
    * exact int64 micro — dead dims, biased dims, padding bugs. */
  private val q187 = QuerySpec(
    "q187_embedding_audit",
    (s, dir) => Similarity.embeddingAudit(t(s, dir, "embeddings"),
        "embedding")
      .orderBy(col("dim")),
    Some("""WITH q AS (SELECT i - 1 AS dim,
          CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0, 0) AS BIGINT)
            AS vq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
      a AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(vq) AS BIGINT) AS s,
          CAST(sum(vq * vq) AS BIGINT) AS s2,
          CAST(count(*) FILTER (WHERE vq = 0) AS BIGINT) AS n_zero
        FROM q GROUP BY 1)
      SELECT CAST(dim AS BIGINT) AS dim, n,
        CAST(s // n AS BIGINT) AS mean_micro,
        CAST((n * s2 - s * s) // (n * n * 1000000) AS BIGINT) AS var_micro,
        CAST((n_zero * 1000000) // n AS BIGINT) AS zero_frac_micro
      FROM a ORDER BY dim"""))

  /** Tokenizer fertility per language ([[TextAnalysis
    * .tokenizerFertility]]): BPE-ish subwords per whitespace word — the
    * cross-lingual context-window price list feeding q177's token-share
    * mixture. */
  private val q188 = QuerySpec(
    "q188_tokenizer_fertility",
    (s, dir) => TextAnalysis.tokenizerFertility(t(s, dir, "documents"),
        "text", col("lang"))
      .orderBy(col("lang")),
    Some(s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS ws_tokens,
        CAST(sum(len(regexp_extract_all(text,
          '${TextAnalysis.BpePattern.replace("'", "''")}'))) AS BIGINT)
          AS bpe_tokens,
        CAST((sum(len(regexp_extract_all(text,
            '${TextAnalysis.BpePattern.replace("'", "''")}'))) * 1000000) //
          sum(len(str_split(text, ' '))) AS BIGINT) AS fertility_micro
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Split-conformal prediction sets ([[TextAnalysis.conformalSets]]):
    * calibration threshold on even ids, coverage + set size on odd ids,
    * α grid {5%, 10%, 20%} — q179's risk–coverage with a finite-sample
    * guarantee attached. Milli-nat nonconformity keeps the threshold
    * histogram bounded; every division truncates identically. */
  private val q189 = {
    val alphas = Seq(50L, 100L, 200L)
    QuerySpec(
      "q189_conformal_sets",
      (s, dir) => TextAnalysis.conformalSets(t(s, dir, "documents"),
          "doc_id", "text", "lang", alphas, _ % 2 === 0)
        .orderBy(col("alpha_permille")),
      Some(s"""WITH $NbOracleCtes,
        p12 AS (SELECT id, max(CASE WHEN rn = 1 THEN post_q END) AS p1,
            max(CASE WHEN rn = 2 THEN post_q END) AS p2
          FROM ranked WHERE rn <= 2 GROUP BY 1),
        nc AS (SELECT r.id, r.label, r.cls,
            (CASE WHEN r.rn = 1 THEN coalesce(p12.p2, p12.p1)
              ELSE p12.p1 END - r.post_q) // 1000 AS nc_mq,
            (r.id % 2 = 0) AS is_cal
          FROM ranked r JOIN p12 ON p12.id = r.id),
        caln AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM nc
          WHERE is_cal AND cls = label),
        calc AS (SELECT nc_mq, sum(count(*)) OVER (ORDER BY nc_mq) AS cum
          FROM nc WHERE is_cal AND cls = label GROUP BY nc_mq),
        grid AS (SELECT unnest([${alphas.mkString(", ")}]::BIGINT[])
            AS alpha_permille),
        ks AS (SELECT alpha_permille, n_cal,
            ((n_cal + 1) * (1000 - alpha_permille) + 999) // 1000 AS k_rank
          FROM grid CROSS JOIN caln),
        thr AS (SELECT alpha_permille, n_cal, k_rank,
            min(CASE WHEN cum >= k_rank THEN nc_mq END) AS threshold_mq
          FROM ks CROSS JOIN calc GROUP BY 1, 2, 3),
        ev AS (SELECT * FROM nc WHERE NOT is_cal),
        agg AS (SELECT t.alpha_permille, t.n_cal, t.k_rank, t.threshold_mq,
            CAST(count(DISTINCT e.id) AS BIGINT) AS n_eval,
            CAST(count(*) FILTER (WHERE e.cls = e.label AND
              (t.threshold_mq IS NULL OR e.nc_mq <= t.threshold_mq))
              AS BIGINT) AS n_covered,
            CAST(count(*) FILTER (WHERE t.threshold_mq IS NULL OR
              e.nc_mq <= t.threshold_mq) AS BIGINT) AS set_size_sum
          FROM thr t CROSS JOIN ev e GROUP BY 1, 2, 3, 4)
        SELECT alpha_permille, n_cal, CAST(k_rank AS BIGINT) AS k_rank,
          threshold_mq, n_eval, n_covered,
          CAST((n_covered * 1000000) // n_eval AS BIGINT) AS coverage_micro,
          set_size_sum,
          CAST((set_size_sum * 1000000) // n_eval AS BIGINT)
            AS avg_set_size_micro
        FROM agg ORDER BY alpha_permille"""))
  }

  /** Per-class precision/recall/F1 of the NB classifier against the lang
    * metadata ([[graft.operators.DataChecks.classifierReport]]) — q180
    * names the agreement, this names WHICH classes are safe. */
  private val q190 = QuerySpec(
    "q190_classifier_report",
    (s, dir) => graft.operators.DataChecks.classifierReport(
        TextAnalysis.naiveBayesPredict(t(s, dir, "documents"),
          "doc_id", "text", "lang"),
        col("label"), col("predicted"))
      .orderBy(col("label")),
    Some(s"""WITH $NbOracleCtes,
      pred AS (SELECT id, label AS t, cls AS p FROM ranked WHERE rn = 1),
      cells AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n FROM pred
        GROUP BY 1, 2),
      rt AS (SELECT t AS label, CAST(sum(n) AS BIGINT) AS n_truth
        FROM cells GROUP BY 1),
      ct AS (SELECT p AS label, CAST(sum(n) AS BIGINT) AS n_pred
        FROM cells GROUP BY 1),
      dg AS (SELECT t AS label, n AS tp FROM cells WHERE t = p),
      j AS (SELECT coalesce(rt.label, ct.label) AS label,
          coalesce(n_truth, 0) AS n_truth, coalesce(n_pred, 0) AS n_pred
        FROM rt FULL JOIN ct ON rt.label = ct.label),
      f AS (SELECT j.label, j.n_truth, j.n_pred,
          coalesce(dg.tp, 0) AS tp FROM j LEFT JOIN dg ON dg.label = j.label)
      SELECT label, n_truth, n_pred, tp,
        CAST(n_pred - tp AS BIGINT) AS fp, CAST(n_truth - tp AS BIGINT)
          AS fn,
        CAST(CASE WHEN n_pred = 0 THEN 0
          ELSE (tp * 1000000) // n_pred END AS BIGINT) AS precision_micro,
        CAST(CASE WHEN n_truth = 0 THEN 0
          ELSE (tp * 1000000) // n_truth END AS BIGINT) AS recall_micro,
        CAST(CASE WHEN n_pred + n_truth = 0 THEN 0
          ELSE (2 * tp * 1000000) // (n_pred + n_truth) END AS BIGINT)
          AS f1_micro
      FROM f ORDER BY label"""))

  /** Batch retrieval quality eval ([[graft.operators.Retrieval
    * .rankEval]]): MRR + nDCG@10 per query against the graded tf
    * relevance standard (gain floored at relMin=2) — whether the ranker
    * actually orders well, per query. Discount constants are generated
    * ONCE in Scala and injected into both engines. */
  private val q191 = {
    val queries = Seq(
      "q_hash" -> Seq("hash", "table"),
      "q_sort" -> Seq("sort", "merge", "scan"),
      "q_stream" -> Seq("stream", "window"),
      "q_vector" -> Seq("vector", "index"))
    val (k, relMin) = (10, 2L)
    val allTerms = queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString("(", ", ", ")")
    val qtVals = queries.flatMap { case (q, ts) =>
      ts.map(t => s"('$q', '$t')") }.mkString(", ")
    val wVals = graft.operators.Retrieval.dcgWeightsMicro(k).zipWithIndex
      .map { case (w, i) => s"(${i + 1}, ${w})" }.mkString(", ")
    QuerySpec(
      "q191_rank_eval",
      (s, dir) => graft.operators.Retrieval.rankEval(
          t(s, dir, "documents"), "doc_id", "text", queries, k, relMin)
        .withColumn("first_rel_rank", col("first_rel_rank").cast("long"))
        .orderBy(col("qid")),
      Some(s"""WITH docs AS MATERIALIZED (SELECT doc_id,
          len(str_split(text, ' ')) AS dl, str_split(text, ' ') AS toks
          FROM documents),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs),
        posts AS (SELECT doc_id, any_value(dl) AS dl, tok, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM docs)
          WHERE tok IN $allTerms GROUP BY doc_id, tok),
        dfreq AS (SELECT tok, count(*) AS df FROM posts GROUP BY 1),
        qt(qid, tok) AS (VALUES $qtVals),
        ts AS (SELECT qt.qid, p.doc_id AS id, p.tf,
            CAST(round(ln(((n_docs - df) + 0.5) / (df + 0.5) + 1.0) *
              ((p.tf * (1.2 + 1.0)) /
               (p.tf + 1.2 * (1.0 - 0.75 + 0.75 *
                 (CAST(p.dl AS DOUBLE) / avgdl)))) * 1000000.0, 0)
              AS BIGINT) AS micro
          FROM posts p JOIN qt ON qt.tok = p.tok
          JOIN dfreq ON dfreq.tok = p.tok CROSS JOIN stats),
        scored AS MATERIALIZED (SELECT qid, id,
            CAST(sum(micro) AS BIGINT) AS score_micro,
            CAST(sum(tf) AS BIGINT) AS rel_raw
          FROM ts GROUP BY 1, 2),
        g AS (SELECT *, CASE WHEN rel_raw >= $relMin THEN rel_raw
            ELSE 0 END AS gain FROM scored),
        wts(rn, w) AS (VALUES $wVals),
        rk AS (SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY score_micro DESC, id) AS rn FROM g),
        dcg AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_ranked,
            CAST(sum(gain * w) AS BIGINT) AS dcg_micro,
            min(CASE WHEN gain > 0 THEN rn END) AS first_rel_rank
          FROM rk JOIN wts USING (rn) WHERE rn <= $k GROUP BY 1),
        irk AS (SELECT qid, gain, row_number() OVER (PARTITION BY qid
            ORDER BY gain DESC, id) AS rn FROM g WHERE gain > 0),
        idcg AS (SELECT qid, CAST(sum(gain * w) AS BIGINT) AS idcg_micro
          FROM irk JOIN wts USING (rn) WHERE rn <= $k GROUP BY 1),
        nrel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel FROM g
          WHERE gain > 0 GROUP BY 1)
        SELECT d.qid, d.n_ranked, coalesce(n.n_rel, 0) AS n_rel,
          CAST(d.first_rel_rank AS BIGINT) AS first_rel_rank,
          CAST(coalesce(1000000 // d.first_rel_rank, 0) AS BIGINT)
            AS mrr_micro,
          d.dcg_micro,
          CAST(coalesce(i.idcg_micro, 0) AS BIGINT) AS idcg_micro,
          CAST(CASE WHEN coalesce(i.idcg_micro, 0) = 0 THEN 0
            ELSE (d.dcg_micro * 1000000) // i.idcg_micro END AS BIGINT)
            AS ndcg_micro
        FROM dcg d LEFT JOIN idcg i ON i.qid = d.qid
        LEFT JOIN nrel n ON n.qid = d.qid
        ORDER BY d.qid"""))
  }

  /** l-diversity audit ([[graft.operators.DataChecks
    * .lDiversityViolations]]): (nation, segment) classes where every
    * customer shares one account-balance sign — k-anonymous yet fully
    * leaky classes that q145 cannot see. */
  private val q192 = QuerySpec(
    "q192_l_diversity",
    (s, dir) => graft.operators.DataChecks.lDiversityViolations(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"),
        when(col("c_acctbal") < 0, lit("neg")).otherwise(lit("nonneg")),
        l = 2)
      .orderBy(col("c_nationkey"), col("c_mktsegment")),
    Some("""WITH s AS (SELECT c_nationkey, c_mktsegment,
          CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS sv
        FROM customer),
      c AS (SELECT c_nationkey, c_mktsegment, sv, count(*) AS c
        FROM s GROUP BY 1, 2, 3),
      g AS (SELECT c_nationkey, c_mktsegment,
          CAST(sum(c) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_distinct_sensitive
        FROM c GROUP BY 1, 2)
      SELECT * FROM g WHERE n_distinct_sensitive < 2
      ORDER BY c_nationkey, c_mktsegment"""))

  /** Fano-factor burstiness per event type ([[graft.operators.EventOps
    * .fanoFactor]], hourly windows): dispersion of per-window counts —
    * ≈1e6 Poisson-organic, ≫1e6 bursty, ≪1e6 metronomic. */
  private val q193 = QuerySpec(
    "q193_fano_burstiness",
    (s, dir) => graft.operators.EventOps.fanoFactor(
        t(s, dir, "events"), "event_type", windowSec = 3600L)
      .orderBy(col("event_type")),
    Some("""WITH pw AS (SELECT event_type,
          epoch_ns(ts) // 3600000000000 AS w, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      anchor AS (SELECT min(w) AS w_lo, max(w) AS w_hi FROM pw),
      a AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
          CAST(sum(c * c) AS BIGINT) AS s2,
          CAST(count(*) AS BIGINT) AS n_active_windows
        FROM pw GROUP BY 1)
      SELECT event_type, n_events,
        CAST(w_hi - w_lo + 1 AS BIGINT) AS n_windows, n_active_windows,
        CAST((n_events * 1000000) // (w_hi - w_lo + 1) AS BIGINT)
          AS mean_micro,
        CAST((((w_hi - w_lo + 1) * s2 - n_events * n_events) * 1000000) //
          ((w_hi - w_lo + 1) * n_events) AS BIGINT) AS fano_micro
      FROM a CROSS JOIN anchor ORDER BY event_type"""))

  /** Contamination rate per source ([[Dedup.contaminationBySource]]):
    * q51's decontamination semi-join rolled up by provenance — "drop the
    * source, not the docs" evidence. Same ref/corpus split and shingle
    * parameters as q51. */
  private val q194 = QuerySpec(
    "q194_contamination_by_source",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val ref = docs.where(col("doc_id") % 97 === 0)
      val corpus = docs.where(col("doc_id") % 97 =!= 0)
      Dedup.contaminationBySource(corpus, "doc_id", "text", "source",
          ref, "text", n = 3, minShared = 3, maxDocFreq = 1000)
        .orderBy(col("source"))
    },
    Some("""WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
          list_transform(range(1, greatest(len(str_split(text, ' ')) - 2, 1) + 1),
            i -> array_to_string(list_slice(str_split(text, ' '), i, i + 2), ' ')),
          s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647))) AS sh
        FROM documents),
      corpus AS (SELECT doc_id, sh FROM (
          SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df
          FROM sh WHERE doc_id % 97 <> 0)
        WHERE df <= 1000),
      ref AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      bad AS (SELECT doc_id FROM corpus JOIN ref USING (sh)
        GROUP BY 1 HAVING count(*) >= 3),
      srcs AS (SELECT doc_id, source FROM documents WHERE doc_id % 97 <> 0),
      per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM srcs GROUP BY 1),
      bs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_contaminated
        FROM srcs WHERE doc_id IN (SELECT doc_id FROM bad) GROUP BY 1)
      SELECT per.source, per.n_docs,
        coalesce(bs.n_contaminated, 0) AS n_contaminated,
        CAST((coalesce(bs.n_contaminated, 0) * 1000000) // per.n_docs
          AS BIGINT) AS rate_micro
      FROM per LEFT JOIN bs ON bs.source = per.source
      ORDER BY per.source"""))

  /** Shard-skew audit ([[graft.operators.ScaleOps.shardSkewAudit]]) of
    * the q107 sharding, token-weighted: per shard, rows, tokens, share,
    * and the signed deviation from the uniform share. */
  private val q195 = QuerySpec(
    "q195_shard_skew",
    (s, dir) => graft.operators.ScaleOps.shardSkewAudit(
        t(s, dir, "documents"), "doc_id", numShards = 16,
        size(split(col("text"), " ")).cast("long"))
      .orderBy(col("shard")),
    Some("""WITH r AS (SELECT
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 16 AS INT) AS shard,
          CAST(len(str_split(text, ' ')) AS BIGINT) AS w
        FROM documents),
      per AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(w) AS BIGINT) AS weight FROM r GROUP BY 1),
      tot AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM per)
      SELECT shard, n_rows, weight,
        CAST((weight * 1000000) // w_total AS BIGINT) AS share_micro,
        CAST((weight * 16 * 1000000) // w_total - 1000000 AS BIGINT)
          AS dev_from_uniform_micro
      FROM per CROSS JOIN tot ORDER BY shard"""))

  /** Active-learning label routing ([[TextAnalysis.labelRouting]]): the
    * 5 lowest-margin docs per predicted class — the class-balanced
    * human-review queue under q179's auto-accept cut. */
  private val q196 = QuerySpec(
    "q196_label_routing",
    (s, dir) => TextAnalysis.labelRouting(t(s, dir, "documents"),
        "doc_id", "text", "lang", perClassK = 5)
      .select(col("predicted"), col("rnk"), col("id").as("doc_id"),
        col("margin_q"))
      .orderBy(col("predicted"), col("rnk")),
    Some(s"""WITH $NbOracleCtes,
      top2 AS (SELECT id,
          max(CASE WHEN rn = 1 THEN post_q END) AS p1,
          max(CASE WHEN rn = 2 THEN post_q END) AS p2,
          max(CASE WHEN rn = 1 THEN cls END) AS predicted
        FROM ranked WHERE rn <= 2 GROUP BY id),
      m AS (SELECT id, predicted,
          p1 - coalesce(p2, p1) AS margin_q FROM top2),
      rk AS (SELECT predicted, id, margin_q, row_number() OVER (
          PARTITION BY predicted ORDER BY margin_q, id) AS rnk FROM m)
      SELECT predicted, CAST(rnk AS BIGINT) AS rnk, id AS doc_id, margin_q
      FROM rk WHERE rnk <= 5 ORDER BY predicted, rnk"""))

  /** Join-key skew profile ([[graft.operators.ScaleOps.keySkewProfile]])
    * over events.user_id: top-20 hot keys + distribution entropy — the
    * "should I salt this join?" pre-flight. */
  private val q197 = QuerySpec(
    "q197_key_skew_profile",
    (s, dir) => graft.operators.ScaleOps.keySkewProfile(
        t(s, dir, "events"), "user_id", topK = 20)
      .orderBy(col("rnk")),
    Some("""WITH counts AS (SELECT CAST(user_id AS VARCHAR) AS key,
          CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_keys FROM counts),
      ent AS (SELECT CAST(sum(CAST(floor(
            -(CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE)) *
            ln(CAST(c AS DOUBLE) / CAST(n_rows AS DOUBLE)) * 1000000.0
            + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
        FROM counts CROSS JOIN n),
      topk AS (SELECT key, c, row_number() OVER (ORDER BY c DESC, key)
          AS rnk FROM counts)
      SELECT CAST(rnk AS BIGINT) AS rnk, key, c AS n_rows_key,
        n_rows, n_keys,
        CAST((c * 1000000) // n_rows AS BIGINT) AS share_micro,
        entropy_micro
      FROM topk CROSS JOIN n CROSS JOIN ent
      WHERE rnk <= 20 ORDER BY rnk"""))

  /** Frequency-threshold vocabulary curve
    * ([[TextAnalysis.vocabThresholdCurve]]): vocab size / coverage / OOV
    * at each candidate min_count floor — the "where does the Zipf tail
    * stop paying for itself" knee-finder, q183's complementary axis. */
  private val q198 = {
    val grid = Seq(1L, 2L, 3L, 5L, 10L, 20L, 50L, 100L)
    QuerySpec(
      "q198_vocab_threshold_curve",
      (s, dir) => TextAnalysis.vocabThresholdCurve(t(s, dir, "documents"),
          "text", grid)
        .orderBy(col("min_count")),
      Some(s"""WITH toks AS (SELECT unnest(str_split(text, ' ')) AS tok
            FROM documents),
        types AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS total_types,
            CAST(sum(c) AS BIGINT) AS t_total FROM types),
        grid AS (SELECT unnest([${grid.mkString(", ")}]::BIGINT[])
            AS min_count),
        per AS (SELECT min_count,
            CAST(count(*) FILTER (WHERE c >= min_count) AS BIGINT)
              AS vocab_size,
            CAST(coalesce(sum(c) FILTER (WHERE c >= min_count), 0)
              AS BIGINT) AS kept_tokens
          FROM types CROSS JOIN grid GROUP BY 1)
        SELECT min_count, vocab_size, total_types, kept_tokens,
          t_total AS total_tokens,
          CAST((kept_tokens * 1000000) // t_total AS BIGINT)
            AS coverage_micro,
          CAST(((t_total - kept_tokens) * 1000000) // t_total AS BIGINT)
            AS oov_micro
        FROM per CROSS JOIN tot ORDER BY min_count"""))
  }

  /** Source × language joint census with independence lift
    * ([[graft.operators.DataChecks.jointCensus]]): which sources
    * over/under-produce which languages — 1e6 = independent mix. */
  private val q199 = QuerySpec(
    "q199_source_lang_census",
    (s, dir) => graft.operators.DataChecks.jointCensus(
        t(s, dir, "documents"), col("source"), col("lang"))
      .select(col("x").as("source"), col("y").as("lang"), col("n"),
        col("n_x").as("n_source"), col("n_y").as("n_lang"),
        col("n_total"), col("lift_micro"))
      .orderBy(col("source"), col("lang")),
    Some("""WITH cells AS (SELECT source, lang,
          CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2),
      rm AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_source
        FROM cells GROUP BY 1),
      cm AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
        FROM cells GROUP BY 1),
      tt AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells)
      SELECT source, lang, n, n_source, n_lang, n_total,
        CAST(floor((CAST(n AS DOUBLE) / CAST(n_source AS DOUBLE)) *
          (CAST(n_total AS DOUBLE) / CAST(n_lang AS DOUBLE)) *
          1000000.0 + 0.5) AS BIGINT) AS lift_micro
      FROM cells JOIN rm USING (source) JOIN cm USING (lang) CROSS JOIN tt
      ORDER BY source, lang"""))

  /** Session entry/exit census ([[graft.operators.EventOps
    * .sessionEntryExit]]): per landing event type, sessions opened,
    * bounce rate, mean session length — q30's sessionization turned into
    * the acquisition-leak report. */
  private val q200 = QuerySpec(
    "q200_session_entry_exit",
    (s, dir) => graft.operators.EventOps.sessionEntryExit(
        t(s, dir, "events"), "user_id", gapSec = 1800)
      .orderBy(col("entry_type")),
    Some("""WITH marked AS (SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      grp AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked),
      grp2 AS (SELECT *,
          row_number() OVER (PARTITION BY user_id, sid
            ORDER BY ts, event_id) AS rn_a,
          row_number() OVER (PARTITION BY user_id, sid
            ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM grp),
      sess AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
          max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
          max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
        FROM grp2 GROUP BY 1, 2),
      census AS (SELECT entry_type,
          CAST(count(*) AS BIGINT) AS n_sessions,
          CAST(count(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
          CAST(sum(n_events) AS BIGINT) AS n_ev,
          CAST(count(*) FILTER (WHERE exit_type = entry_type) AS BIGINT)
            AS n_exit_same
        FROM sess GROUP BY 1)
      SELECT entry_type, n_sessions, n_bounces,
        CAST((n_bounces * 1000000) // n_sessions AS BIGINT) AS bounce_micro,
        CAST((n_ev * 1000000) // n_sessions AS BIGINT) AS len_micro,
        n_exit_same
      FROM census ORDER BY entry_type"""))

  // ----------------------------------------------------------- catalog

  val all: Seq[QuerySpec] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38, q39, q40,
    q41, q42, q43, q44, q45, q46, q47, q48, q49, q50,
    q51, q52, q53, q54, q55, q56, q57, q58, q59, q60,
    q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
    q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83,
    q84, q85, q86, q87, q88, q89, q90, q91, q92, q93, q94, q95, q96, q97,
    q98, q99, q100, q101, q102, q103, q104, q105, q106, q107, q108, q109,
    q110, q111, q112, q113, q114, q115, q116, q117, q118, q119, q120, q121,
    q122, q123, q124, q125, q126, q127, q128, q129, q130, q131, q132,
    q133, q134, q135, q136, q137, q138, q139, q140, q141, q142,
    q143, q144, q145, q146, q147, q148, q149, q150, q151, q152, q153,
    q154, q155, q156, q157, q158, q159, q160,
    q161, q162, q163, q164, q165, q166, q167, q168, q169, q170, q171,
    q172, q173, q174, q175, q176, q177, q178, q179, q180, q181, q182,
    q183, q184, q185, q186, q187, q188, q189, q190, q191, q192, q193,
    q194, q195, q196, q197, q198, q199, q200)
}
