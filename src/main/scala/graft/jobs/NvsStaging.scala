package graft.jobs

import org.apache.spark.sql.SparkSession

/** Deterministic staging-table derivation for the driver's oracle gate over
  * the eight composed §2.11 reference queries (q161–q168).
  *
  * The reference pipeline reads 17 Glue-catalog staging tables
  * (FIXTURES.md §A). The driver's correctness gate can only hand DuckDB the
  * ten shipped parquet tables, so the staging shapes are DERIVED from those
  * tables with pure modular arithmetic over `c_custkey` / `n_nationkey` —
  * the same trick q126 uses to derive CDC snapshots from `customer`. The
  * Spark side registers the derived shapes as the temp views
  * [[NvsPipeline]] reads; [[oracleCtes]] is the DuckDB replay of the SAME
  * derivation, so both engines see identical staging rows at every scale
  * factor.
  *
  * Determinism contract (QueryCatalog scaladoc): every derived measure is
  * integer-valued (sums are exact doubles in any fold order); money strings
  * are built by string concat, never locale formatting; the only inexact
  * reals in the whole §2.11 family are tam_ce's 1/display_order reach
  * shares (rounded at 6dp) and its window-allocated costs (2dp).
  *
  * Branch coverage mirrors the test fixtures (NvsFixtures): NULL npi_num
  * calls (dropped, S1:132), non-brand org rows (array_contains drop,
  * S1:131), unknown-DMA '999' rows (inner dim join drop), NULL zip_cd
  * weekly rows (S1:831), yrwk 202353 rows (S1:837 cutoff), 2023 rows in
  * the 2022 search vintage (S1:584 cutoff), a 2024 social reach gap in
  * months 07-12 (fires the missing-cost probe S1:1004-1027), and an
  * unmapped 'EHR' unpivot cost row (no-ELSE CASE → NULL channel through
  * the coalesce-key FULL JOIN).
  */
object NvsStaging {

  /** Spark-dialect yyyymm over k, cycling 202201..202412. */
  private def ymS(k: String) =
    s"CAST((2022 + ($k % 36) DIV 12) * 100 + 1 + ($k % 36) % 12 AS INT)"

  /** Register every staging temp view NvsPipeline reads, derived from the
    * shipped parquet under `dir`. Idempotent; cheap (lazy views). */
  def register(s: SparkSession, dir: String): Unit = {
    import s.implicits._

    // One bottom scan for the whole staging fabric (guide §5/§6): every
    // derived staging view reads `nvs_src_k`, and a composed query re-scans
    // customer.parquet once PER VIEW REFERENCE without this (q168's 6-view
    // union holds 18 such references — 18 parquet scans of the same file
    // plus 18 projections). Persisting the one-column projection turns all
    // but the first into cache reads; CacheScope-registered, so the query
    // owner's drain releases it after the action. Values are unchanged by
    // construction — the cache stores exactly the rows the scan produced.
    graft.core.CacheScope.persist(
      s.read.parquet(s"$dir/customer.parquet").selectExpr("c_custkey AS k"))
      .createOrReplaceTempView("nvs_src_k")
    s.read.parquet(s"$dir/nation.parquet")
      .createOrReplaceTempView("nvs_src_nation")

    // A.4 demographics: one DMA per nation row (dma_code 100..124)
    s.sql("""SELECT CAST(100 + n_nationkey AS STRING) AS dma_code,
        n_name AS dma_name,
        lpad(CAST(n_nationkey AS STRING), 5, '0') AS zip
      FROM nvs_src_nation""").createOrReplaceTempView("demographics")

    // A.1 sales calls — all four vintages are views of the same derived
    // table; the pipeline's disjoint yrmo range filters slice it.
    val calls = s.sql(s"""SELECT
        CASE WHEN k % 97 = 0 THEN NULL
          ELSE concat('N', CAST(k % 200 AS STRING)) END AS npi_num,
        lpad(CAST(k % 500 AS STRING), 5, '0') AS zip_cd,
        'C' AS city, 'S' AS state, 'XOLAIR' AS brand,
        ${ymS("k")} AS yrmo,
        CASE WHEN k % 5 = 0 THEN '1' ELSE '0' END AS call_p1,
        CASE WHEN k % 5 = 1 THEN '1' ELSE '0' END AS call_p2,
        CASE WHEN k % 5 = 2 THEN '1' ELSE '0' END AS call_p3,
        '1' AS calls,
        CASE WHEN k % 5 = 3 THEN '1' ELSE '0' END AS lunch_n_learn_calls
      FROM nvs_src_k""")
    Seq("nvs_calls_v1", "nvs_calls_v2", "nvs_calls_v3", "nvs_calls_v4")
      .foreach(calls.createOrReplaceTempView)

    // A.2 / A.3: one MDM + org row per distinct k%200 residue; every 10th
    // org carries no XOLAIR (array_contains drop)
    s.sql("""SELECT DISTINCT concat('N', CAST(k % 200 AS STRING)) AS npi_number,
        concat('M', CAST(k % 200 AS STRING)) AS mdm_id
      FROM nvs_src_k""").createOrReplaceTempView("mdm_profile")
    s.sql("""SELECT DISTINCT concat('M', CAST(k % 200 AS STRING)) AS mdm_id,
        CASE WHEN (k % 200) % 10 = 0 THEN array('OTHER')
          ELSE array('XOLAIR', 'OTHER') END AS product_brand_name,
        lpad(CAST(k % 200 AS STRING), 5, '0') AS mdm_zip
      FROM nvs_src_k""").createOrReplaceTempView("hcp_org_map")

    // A.5-A.8 DTC media: one derived table per family (value prime P keeps
    // families distinct), vintage views all alias the full table
    def media(prime: Int, extra: String, withClicks: Boolean): String = {
      val clicks =
        if (withClicks) s", CAST((k * $prime) % 97 AS STRING) AS clicks" else ""
      s"""SELECT ${ymS("k")} AS year_mth, $extra,
        CASE WHEN k % 50 = 0 THEN '999'
          ELSE CAST(100 + k % 25 AS STRING) END AS dma_code,
        CAST(1 + (k * $prime) % 997 AS STRING) AS impressions$clicks
      FROM nvs_src_k"""
    }
    val dd = s.sql(media(1, "'X' AS dma_region", withClicks = true))
    Seq("dtc_display_v1", "dtc_display_v2", "dtc_display_v3")
      .foreach(dd.createOrReplaceTempView)
    val ds = s.sql(media(3, "'X' AS dma_name", withClicks = true))
    Seq("dtc_search_v1", "dtc_search_v2", "dtc_search_v3")
      .foreach(ds.createOrReplaceTempView)
    val dp = s.sql(media(5, "'X' AS dma", withClicks = false))
    Seq("poc_v1", "poc_v2", "poc_v3").foreach(dp.createOrReplaceTempView)
    val so = s.sql(media(7, "'X' AS dma_name", withClicks = true))
    Seq("social_v1", "social_v2").foreach(so.createOrReplaceTempView)

    // A.9 HCP search: v1 is daily 2022 (every 11th row leaks into 2023 and
    // is cut by the <= '2022-12-31' filter); v2/v3 are monthly
    s.sql("""SELECT
        CASE WHEN k % 50 = 0 THEN '999'
          ELSE CAST(100 + k % 25 AS STRING) END AS dma_code,
        concat(CASE WHEN k % 11 = 0 THEN '2023' ELSE '2022' END, '-',
          lpad(CAST(1 + k % 12 AS STRING), 2, '0'), '-',
          lpad(CAST(1 + k % 28 AS STRING), 2, '0')) AS activity_date,
        CAST(1 + (k * 11) % 997 AS STRING) AS impressions,
        CAST((k * 11) % 97 AS STRING) AS clicks
      FROM nvs_src_k""").createOrReplaceTempView("hcp_search_v1")
    s.sql("""SELECT
        CASE WHEN k % 50 = 0 THEN '999'
          ELSE CAST(100 + k % 25 AS STRING) END AS dma_code,
        CAST(202301 + k % 12 AS INT) AS year_mth,
        CAST(1 + (k * 13) % 997 AS STRING) AS impressions,
        CAST((k * 13) % 97 AS STRING) AS clicks
      FROM nvs_src_k""").createOrReplaceTempView("hcp_search_v2")
    s.sql("""SELECT
        CASE WHEN k % 50 = 0 THEN '999'
          ELSE CAST(100 + k % 25 AS STRING) END AS dma_code,
        CAST(202401 + k % 12 AS INT) AS year_mth,
        CAST(1 + (k * 17) % 997 AS STRING) AS impressions,
        CAST((k * 17) % 97 AS STRING) AS clicks
      FROM nvs_src_k""").createOrReplaceTempView("hcp_search_v3")

    // A.12 HCP omni weekly long: 7 legacy channels, 104 weeks across
    // 2022-2023, every 103rd row week 53 (cut), every 89th a NULL zip (cut)
    s.sql("""SELECT
        CASE CAST(k % 7 AS INT)
          WHEN 0 THEN 'EHR' WHEN 1 THEN '3RD_PARTY_EMAIL' WHEN 2 THEN 'POC'
          WHEN 3 THEN 'DISPLAY' WHEN 4 THEN 'VIDEO' WHEN 5 THEN 'CUSTOM'
          ELSE 'ENDEMIC_SOCIAL' END AS channel,
        CAST(CASE WHEN k % 103 = 0 THEN 202353
          ELSE (2022 + (k % 104) DIV 52) * 100 + 1 + (k % 104) % 52
          END AS INT) AS yrwk,
        CASE WHEN k % 89 = 0 THEN NULL
          ELSE lpad(CAST(k % 300 AS STRING), 5, '0') END AS zip_cd,
        CASE WHEN k % 3 = 0 THEN 'ENGAGEMENT' ELSE 'REACH' END AS metric,
        CAST(1 + (k * 23) % 499 AS STRING) AS value
      FROM nvs_src_k""").createOrReplaceTempView("hcp_all_weekly")

    // A.13 HCP monthly 2024 sources; social covers months 01-06 ONLY so
    // Paid Social alloc rows 07-12 go unmatched → the missing-cost probe
    s.sql("""SELECT
        CASE CAST(k % 5 AS INT)
          WHEN 0 THEN 'Digital Display' WHEN 1 THEN 'EHR' WHEN 2 THEN 'Video'
          WHEN 3 THEN 'Custom' ELSE '3rd Party Email' END AS ipmm_channel,
        CAST(100 + k % 25 AS INT) AS dma_code,
        CAST(202401 + k % 12 AS INT) AS year_mth,
        CAST(1 + (k * 29) % 499 AS DOUBLE) AS impressions,
        CAST((k * 29) % 97 AS DOUBLE) AS clicks
      FROM nvs_src_k""").createOrReplaceTempView("hcp_all_new")
    s.sql("""SELECT CAST(100 + k % 25 AS INT) AS dma_code,
        CAST(202401 + k % 12 AS INT) AS year_mth,
        CAST(1 + (k * 31) % 211 AS DOUBLE) AS impressions
      FROM nvs_src_k""").createOrReplaceTempView("hcp_poc_new")
    s.sql("""SELECT CAST(100 + k % 25 AS INT) AS dma_code,
        CAST(202401 + k % 6 AS INT) AS year_mth,
        CAST(1 + (k * 37) % 499 AS DOUBLE) AS impressions,
        CAST((k * 37) % 53 AS DOUBLE) AS clicks
      FROM nvs_src_k""").createOrReplaceTempView("hcp_social_new")

    // A.10 wide costs: 36 month rows 2022-01..2024-12, comma-money built by
    // concat (all values whole thousands, column offsets 1/41/81/121/161)
    (0 until 36).map { mi =>
      (f"${2022 + mi / 12}-${1 + mi % 12}%02d",
        s"${1 + mi},000.00", s"${41 + mi},000.00", s"${81 + mi},000.00",
        s"${121 + mi},000.00", s"${161 + mi},000.00")
    }.toDF("date_month_", "dtc_display_", "dtc_search", "dtc_poc",
        "dtc_social", "npp")
      .createOrReplaceTempView("costs_wide")

    // A.11 unpivot costs: 2024 months × 10 (audience, channel) rows;
    // 'Online Video' folds into Custom, 'EHR' maps to NULL (no-ELSE CASE)
    val chans = Seq(
      ("DTC", "Digital Display", 10), ("DTC", "Paid Search", 20),
      ("HCP", "Paid Search", 30), ("HCP", "Digital Display", 40),
      ("HCP", "Endemic Social", 50), ("HCP", "Custom", 60),
      ("HCP", "POC", 70), ("HCP", "3rd Party Email", 80),
      ("HCP", "Online Video", 90), ("HCP", "EHR", 100))
    (for { mi <- 0 until 12; (aud, ch, base) <- chans }
      yield (202401 + mi, aud, ch, (base + mi) * 10.0))
      .toDF("year_month", "audience", "channel", "cost")
      .createOrReplaceTempView("costs_unpivot")
  }

  // ------------------------------------------------------ DuckDB replay

  /** DuckDB yyyymm over k (integer-division twin of [[ymS]]). */
  private def ymD(k: String) =
    s"CAST((2022 + ($k % 36) // 12) * 100 + 1 + ($k % 36) % 12 AS INTEGER)"

  private def dmaD(k: String) =
    s"CASE WHEN $k % 50 = 0 THEN '999' ELSE CAST(100 + $k % 25 AS VARCHAR) END"

  /** Shared staging CTE block (no leading WITH): the DuckDB twin of
    * [[register]] — identical rows at every scale factor. */
  val oracleCtes: String = s"""
    k AS (SELECT c_custkey AS k FROM customer),
    demo AS (SELECT CAST(100 + n_nationkey AS VARCHAR) AS dma_code,
      n_name AS dma_name FROM nation),
    cw AS (SELECT concat(CAST(2022 + mi // 12 AS VARCHAR), '-',
        lpad(CAST(1 + mi % 12 AS VARCHAR), 2, '0')) AS date_month_,
      concat(CAST(1 + mi AS VARCHAR), ',000.00') AS dtc_display_,
      concat(CAST(41 + mi AS VARCHAR), ',000.00') AS dtc_search,
      concat(CAST(81 + mi AS VARCHAR), ',000.00') AS dtc_poc,
      concat(CAST(121 + mi AS VARCHAR), ',000.00') AS dtc_social,
      concat(CAST(161 + mi AS VARCHAR), ',000.00') AS npp
      FROM range(36) t(mi)),
    cu AS (SELECT 202401 + mi AS year_month, aud AS audience,
      chn AS channel, CAST((base + mi) * 10 AS DOUBLE) AS cost
      FROM (VALUES ('DTC','Digital Display',10),('DTC','Paid Search',20),
        ('HCP','Paid Search',30),('HCP','Digital Display',40),
        ('HCP','Endemic Social',50),('HCP','Custom',60),('HCP','POC',70),
        ('HCP','3rd Party Email',80),('HCP','Online Video',90),
        ('HCP','EHR',100)) c(aud, chn, base), range(12) t(mi))"""

  /** One DTC channel chain (prefix-named CTEs so chains compose in q168).
    * Emits `<p>fin` with the 12-column windowAllocated shape. */
  private def dtcChain(p: String, prime: Int, channel: String,
      engage: String, costs: String, join: String): String = s"""
    ${p}src AS (SELECT ${ymD("k")} AS year_mth, ${dmaD("k")} AS dma_code,
      CAST(1 + (k * $prime) % 997 AS VARCHAR) AS impressions,
      CAST((k * $prime) % 97 AS VARCHAR) AS clicks FROM k),
    ${p}cl AS (SELECT 'XOLAIR' AS brand, '$channel' AS channel,
      'DTC' AS audience,
      substr(CAST(year_mth AS VARCHAR), 1, 4) AS year,
      substr(CAST(year_mth AS VARCHAR), 5, 2) AS month,
      dma_code, CAST(NULL AS VARCHAR) AS zip_code,
      CAST(NULL AS VARCHAR) AS state, 'US' AS country,
      sum(CAST(impressions AS DOUBLE)) AS reach, $engage AS engage
      FROM ${p}src GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9),
    ${p}dj AS (SELECT c.*, d.dma_name AS dma FROM ${p}cl c
      JOIN demo d ON c.dma_code = d.dma_code),
    ${p}co AS ($costs),
    ${p}fin AS (SELECT dj.brand, dj.channel, dj.audience, dj.year,
      CAST(dj.month AS INTEGER) AS month, dj.zip_code, dj.dma, dj.state,
      dj.country, dj.reach, dj.engage,
      co.cost * dj.reach /
        sum(dj.reach) OVER (PARTITION BY dj.brand, dj.month, dj.year) AS cost
      FROM ${p}dj dj $join JOIN ${p}co co
        ON dj.year = co.year AND dj.month = co.month)"""

  private def wideCosts(moneyCol: String, cutoff: Boolean): String = {
    val filt = if (cutoff) " WHERE date_month_ <= '2023-12'" else ""
    s"""SELECT substr(date_month_, 1, 4) AS year,
      substr(date_month_, 6, 2) AS month,
      CAST(replace($moneyCol, ',', '') AS DOUBLE) AS cost FROM cw$filt"""
  }

  private def unpivotCosts(audience: String, channelUpper: String): String =
    s"""SELECT substr(CAST(year_month AS VARCHAR), 1, 4) AS year,
      substr(CAST(year_month AS VARCHAR), 5, 2) AS month, cost
      FROM cu WHERE audience = '$audience'
        AND upper(channel) = '$channelUpper'"""

  val ddChain: String = dtcChain("dd_", 1, "Display",
    "sum(CAST(clicks AS DOUBLE))",
    wideCosts("dtc_display_", cutoff = true) +
      " UNION ALL " + unpivotCosts("DTC", "DIGITAL DISPLAY"), "")
  val dsChain: String = dtcChain("ds_", 3, "Paid Search",
    "sum(CAST(clicks AS DOUBLE))",
    wideCosts("dtc_search", cutoff = true) +
      " UNION ALL " + unpivotCosts("DTC", "PAID SEARCH"), "")
  val dpChain: String = dtcChain("dp_", 5, "Point of Care",
    "max(CAST(NULL AS DOUBLE))",
    wideCosts("dtc_poc", cutoff = true), "LEFT")
  val dsoChain: String = dtcChain("dso_", 7, "Paid Social",
    "sum(CAST(clicks AS DOUBLE))",
    wideCosts("dtc_social", cutoff = false), "LEFT")

  /** tam_ce replay: S1:94-183 over the derived calls/MDM/org shapes.
    * array_contains(product_brand_name,'XOLAIR') replays as the provably
    * equivalent residue predicate ((k%200)%10 <> 0 by construction). */
  val tamChain: String = s"""
    tc_calls AS (SELECT
      CASE WHEN k % 97 = 0 THEN NULL
        ELSE concat('N', CAST(k % 200 AS VARCHAR)) END AS npi_num,
      ${ymD("k")} AS yrmo,
      CASE WHEN k % 5 = 0 THEN '1' ELSE '0' END AS call_p1,
      CASE WHEN k % 5 = 1 THEN '1' ELSE '0' END AS call_p2,
      CASE WHEN k % 5 = 2 THEN '1' ELSE '0' END AS call_p3,
      CASE WHEN k % 5 = 3 THEN '1' ELSE '0' END AS lunch_n_learn_calls
      FROM k),
    tc_mdm AS (SELECT DISTINCT concat('N', CAST(k % 200 AS VARCHAR)) AS npi_number,
      concat('M', CAST(k % 200 AS VARCHAR)) AS mdm_id FROM k),
    tc_org AS (SELECT DISTINCT concat('M', CAST(k % 200 AS VARCHAR)) AS mdm_id,
      (k % 200) % 10 <> 0 AS has_brand,
      lpad(CAST(k % 200 AS VARCHAR), 5, '0') AS mdm_zip FROM k),
    tc_norm AS (SELECT o.mdm_zip AS zip_code, c.yrmo AS year_month,
      'XOLAIR' AS product_brand_name,
      CASE WHEN c.call_p1 = '1' OR c.lunch_n_learn_calls = '1' THEN 1
           WHEN c.call_p2 = '1' THEN 2
           WHEN c.call_p3 = '1' THEN 3 END AS display_order
      FROM tc_calls c JOIN tc_mdm m ON c.npi_num = m.npi_number
      JOIN tc_org o ON m.mdm_id = o.mdm_id AND o.has_brand
      WHERE c.npi_num IS NOT NULL),
    tc_budget(brand, cost, year) AS (VALUES ('XOLAIR', 32000000.0, '2022'),
      ('XOLAIR', 32000000.0, '2023'), ('XOLAIR', 36583323.0, '2024')),
    tc_hc AS (SELECT n.product_brand_name, n.year_month,
      n.zip_code AS zip, 'CE' AS audience, 'tam_hd' AS channel,
      1.0 / n.display_order AS reach, b.cost
      FROM tc_norm n JOIN tc_budget b ON n.product_brand_name = b.brand
        AND substr(CAST(n.year_month AS VARCHAR), 1, 4) = b.year),
    tc_fa AS (SELECT product_brand_name, 'NVS' AS source, year_month, zip,
      audience, channel, reach, CAST(NULL AS DOUBLE) AS engage,
      cost * reach / sum(reach) OVER (PARTITION BY product_brand_name,
        substr(CAST(year_month AS VARCHAR), 1, 4)) AS cost
      FROM tc_hc),
    tc_fin AS (SELECT product_brand_name, source, year_month,
      CAST(zip AS VARCHAR) AS zip, audience, channel,
      sum(reach) AS reach, sum(engage) AS engage, sum(cost) AS cost
      FROM tc_fa GROUP BY 1, 2, 3, 4, 5, 6)"""

  /** hcp_paid_search replay: S1:580-679 (ratio allocation via
    * aggregate-of-aggregate + join-back). */
  val hsChain: String = s"""
    hs_v1 AS (SELECT ${dmaD("k")} AS dma_code,
      concat(CASE WHEN k % 11 = 0 THEN '2023' ELSE '2022' END, '-',
        lpad(CAST(1 + k % 12 AS VARCHAR), 2, '0'), '-',
        lpad(CAST(1 + k % 28 AS VARCHAR), 2, '0')) AS activity_date,
      CAST(1 + (k * 11) % 997 AS VARCHAR) AS impressions,
      CAST((k * 11) % 97 AS VARCHAR) AS clicks FROM k),
    hs_u AS (
      SELECT dma_code, strftime(CAST(activity_date AS DATE), '%Y%m') AS year_mth,
        impressions, clicks FROM hs_v1 WHERE activity_date <= '2022-12-31'
      UNION ALL
      SELECT ${dmaD("k")}, CAST(202301 + k % 12 AS VARCHAR),
        CAST(1 + (k * 13) % 997 AS VARCHAR), CAST((k * 13) % 97 AS VARCHAR)
      FROM k
      UNION ALL
      SELECT ${dmaD("k")}, CAST(202401 + k % 12 AS VARCHAR),
        CAST(1 + (k * 17) % 997 AS VARCHAR), CAST((k * 17) % 97 AS VARCHAR)
      FROM k),
    hs_cl AS (SELECT 'XOLAIR' AS brand, 'Paid Search' AS channel,
      'HCP' AS audience,
      substr(CAST(year_mth AS VARCHAR), 1, 4) AS year,
      substr(CAST(year_mth AS VARCHAR), 5, 2) AS month,
      dma_code, CAST(NULL AS VARCHAR) AS zip_code,
      CAST(NULL AS VARCHAR) AS state, 'US' AS country,
      sum(CAST(impressions AS DOUBLE)) AS reach,
      sum(CAST(clicks AS DOUBLE)) AS engage
      FROM hs_u GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9),
    hs_dj AS (SELECT c.*, d.dma_name AS dma FROM hs_cl c
      JOIN demo d ON c.dma_code = d.dma_code),
    hs_co AS (
      SELECT substr(date_month_, 1, 4) AS year,
        substr(date_month_, 6, 2) AS month,
        CAST(replace(npp, ',', '') AS DOUBLE) * 0.16 AS cost
      FROM cw WHERE date_month_ <= '2023-12'
      UNION ALL
      SELECT substr(CAST(year_month AS VARCHAR), 1, 4),
        substr(CAST(year_month AS VARCHAR), 5, 2), sum(cost)
      FROM cu WHERE audience = 'HCP' AND upper(channel) = 'PAID SEARCH'
      GROUP BY 1, 2),
    hs_mr AS (SELECT year, month, sum(reach) AS tot
      FROM hs_dj GROUP BY 1, 2),
    hs_fin AS (SELECT d.brand, d.channel, d.audience, d.year,
      CAST(d.month AS INTEGER) AS month, d.zip_code, d.dma, d.state,
      d.country, d.reach, d.engage, (d.reach / m.tot) * c.cost AS cost
      FROM hs_dj d JOIN hs_mr m ON d.year = m.year AND d.month = m.month
      JOIN hs_co c ON d.year = c.year AND d.month = c.month)"""

  /** hcp_all_channels replay: S1:817-1066 — weekly pivot, week→month,
    * old∪new normalization, share-spread ∪ unpivot costs, the coalesce-key
    * FULL JOIN missing-cost probe, and the /11 /9 back-spread. */
  val haChain: String = s"""
    ha_w AS (SELECT
      CASE CAST(k % 7 AS INTEGER)
        WHEN 0 THEN 'EHR' WHEN 1 THEN '3RD_PARTY_EMAIL' WHEN 2 THEN 'POC'
        WHEN 3 THEN 'DISPLAY' WHEN 4 THEN 'VIDEO' WHEN 5 THEN 'CUSTOM'
        ELSE 'ENDEMIC_SOCIAL' END AS channel,
      CAST(CASE WHEN k % 103 = 0 THEN 202353
        ELSE (2022 + (k % 104) // 52) * 100 + 1 + (k % 104) % 52
        END AS INTEGER) AS yrwk,
      CASE WHEN k % 89 = 0 THEN NULL
        ELSE lpad(CAST(k % 300 AS VARCHAR), 5, '0') END AS zip_cd,
      CASE WHEN k % 3 = 0 THEN 'ENGAGEMENT' ELSE 'REACH' END AS metric,
      CAST(1 + (k * 23) % 499 AS VARCHAR) AS value
      FROM k),
    ha_pv AS (SELECT 'XOLAIR' AS brand, channel, 'HCP' AS audience,
      substr(CAST(yrwk AS VARCHAR), 1, 4) AS year,
      substr(CAST(yrwk AS VARCHAR), 5, 2) AS week,
      zip_cd AS zip_code, CAST(NULL AS VARCHAR) AS dma,
      CAST(NULL AS VARCHAR) AS state, 'US' AS country,
      sum(CASE WHEN metric = 'REACH' THEN CAST(value AS DOUBLE) END) AS reach,
      sum(CASE WHEN metric = 'ENGAGEMENT' THEN CAST(value AS DOUBLE) END) AS engage
      FROM ha_w WHERE zip_cd IS NOT NULL AND yrwk <= 202352
      GROUP BY ALL),
    ha_wm AS (SELECT brand,
      CASE WHEN channel = 'EHR' THEN 'EHR/EMR'
           WHEN channel = '3RD_PARTY_EMAIL' THEN 'Third-Party Email'
           WHEN channel = 'POC' THEN 'Point of Care'
           WHEN channel = 'DISPLAY' THEN 'Display'
           WHEN channel IN ('VIDEO', 'CUSTOM') THEN 'Custom'
           WHEN channel = 'ENDEMIC_SOCIAL' THEN 'Paid Social' END AS channel,
      audience, year,
      CAST(month(CAST(year || '-01-01' AS DATE) +
        ((CAST(week AS INTEGER) - 1) // 4) * INTERVAL 1 MONTH) AS INTEGER) AS month,
      zip_code, dma, state, country, reach, engage FROM ha_pv),
    ha_old AS (SELECT brand, channel, audience, year, month,
      CAST(zip_code AS VARCHAR) AS zip_code, dma, state, country,
      sum(reach) AS reach, sum(engage) AS engage FROM ha_wm GROUP BY ALL),
    ha_na AS (SELECT
      CASE CAST(k % 5 AS INTEGER)
        WHEN 0 THEN 'Digital Display' WHEN 1 THEN 'EHR' WHEN 2 THEN 'Video'
        WHEN 3 THEN 'Custom' ELSE '3rd Party Email' END AS ipmm_channel,
      CAST(100 + k % 25 AS INTEGER) AS dma_code,
      CAST(202401 + k % 12 AS INTEGER) AS year_mth,
      CAST(1 + (k * 29) % 499 AS DOUBLE) AS impressions,
      CAST((k * 29) % 97 AS DOUBLE) AS clicks FROM k),
    ha_np AS (SELECT CAST(100 + k % 25 AS INTEGER) AS dma_code,
      CAST(202401 + k % 12 AS INTEGER) AS year_mth,
      CAST(1 + (k * 31) % 211 AS DOUBLE) AS impressions FROM k),
    ha_ns AS (SELECT CAST(100 + k % 25 AS INTEGER) AS dma_code,
      CAST(202401 + k % 6 AS INTEGER) AS year_mth,
      CAST(1 + (k * 37) % 499 AS DOUBLE) AS impressions,
      CAST((k * 37) % 53 AS DOUBLE) AS clicks FROM k),
    ha_comb AS (
      SELECT ipmm_channel, dma_code, year_mth,
        sum(impressions) AS impressions, sum(clicks) AS clicks
      FROM ha_na WHERE year_mth >= 202401 GROUP BY 1, 2, 3
      UNION ALL
      SELECT 'POC', dma_code, year_mth, sum(impressions),
        CAST(NULL AS DOUBLE)
      FROM ha_np WHERE year_mth >= 202401 GROUP BY 1, 2, 3
      UNION ALL
      SELECT 'Endemic Social', dma_code, year_mth, sum(impressions),
        sum(clicks)
      FROM ha_ns WHERE year_mth >= 202401 GROUP BY 1, 2, 3),
    ha_hr AS (SELECT 'XOLAIR' AS brand, ipmm_channel AS channel,
      'HCP' AS audience, dma_code,
      substr(CAST(year_mth AS VARCHAR), 1, 4) AS year,
      substr(CAST(year_mth AS VARCHAR), 5, 2) AS month,
      CAST(NULL AS VARCHAR) AS zip_code, CAST(NULL AS VARCHAR) AS state,
      'US' AS country,
      sum(impressions) AS reach, sum(clicks) AS engage
      FROM ha_comb GROUP BY ALL),
    ha_new AS (SELECT brand,
      CASE WHEN h.channel = 'EHR' THEN 'EHR/EMR'
           WHEN h.channel = '3rd Party Email' THEN 'Third-Party Email'
           WHEN h.channel = 'POC' THEN 'Point of Care'
           WHEN h.channel = 'Digital Display' THEN 'Display'
           WHEN h.channel IN ('Video', 'Custom') THEN 'Custom'
           WHEN h.channel = 'Endemic Social' THEN 'Paid Social' END AS channel,
      audience, year, month, zip_code, d.dma_name AS dma, state, country,
      reach, engage
      FROM ha_hr h JOIN demo d ON CAST(h.dma_code AS VARCHAR) = d.dma_code),
    ha_all AS (
      SELECT brand, channel, audience, year, CAST(month AS VARCHAR) AS month,
        zip_code, dma, state, country, reach, engage FROM ha_old
      UNION ALL
      SELECT brand, channel, audience, year, month, zip_code, dma, state,
        country, reach, engage FROM ha_new),
    ha_spend AS (SELECT substr(date_month_, 1, 4) AS year,
      substr(date_month_, 6, 2) AS month,
      CAST(replace(npp, ',', '') AS DOUBLE) AS total_cost
      FROM cw WHERE date_month_ <= '2023-12'),
    ha_alloc AS (
      SELECT 'XOLAIR' AS brand, year, month, ch AS channel,
        total_cost * share AS cost
      FROM ha_spend, (VALUES ('Display', 0.39), ('Paid Social', 0.22),
        ('Third-Party Email', 0.06), ('Point of Care', 0.08),
        ('Custom', 0.08), ('EHR/EMR', 0.01)) s(ch, share)
      UNION ALL
      SELECT 'XOLAIR', substr(CAST(year_month AS VARCHAR), 1, 4),
        substr(CAST(year_month AS VARCHAR), 5, 2),
        CASE WHEN channel = 'POC' THEN 'Point of Care'
             WHEN channel = 'Digital Display' THEN 'Display'
             WHEN channel = '3rd Party Email' THEN 'Third-Party Email'
             WHEN channel = 'Endemic Social' THEN 'Paid Social'
             WHEN channel IN ('Online Video', 'Video', 'Custom')
               THEN 'Custom' END,
        sum(cost)
      FROM cu WHERE audience = 'HCP' GROUP BY 1, 2, 3, 4),
    ha_mr AS (SELECT brand, year, month, channel, sum(reach) AS tot
      FROM ha_all GROUP BY 1, 2, 3, 4),
    ha_dmr AS (SELECT d.*, m.brand AS mr_brand, m.year AS mr_year,
      m.month AS mr_month, m.channel AS mr_channel, m.tot
      FROM ha_all d JOIN ha_mr m ON d.year = m.year AND d.month = m.month
        AND d.channel = m.channel),
    ha_probe AS (SELECT
      coalesce(d.brand, ca.brand, d.mr_brand) AS brand,
      coalesce(d.channel, ca.channel, d.mr_channel) AS channel,
      coalesce(d.audience, 'HCP') AS audience,
      coalesce(d.year, ca.year, d.mr_year) AS year,
      coalesce(d.month, ca.month, d.mr_month) AS month,
      d.reach, d.engage,
      CASE WHEN d.reach IS NOT NULL AND d.tot IS NOT NULL
        THEN (d.reach / d.tot) * ca.cost ELSE ca.cost END AS cost
      FROM ha_dmr d FULL JOIN ha_alloc ca
        ON coalesce(d.year, ca.year) = ca.year
        AND coalesce(d.month, ca.month) = ca.month
        AND coalesce(d.channel, ca.channel) = ca.channel
      WHERE coalesce(d.year, ca.year, d.mr_year) = '2024'
        AND d.reach IS NULL),
    ha_mc AS (SELECT brand, channel, audience, year,
      sum(reach) AS reach, sum(engage) AS engage,
      sum(cost) AS missing_cost
      FROM ha_probe WHERE channel IN ('Paid Social', 'Custom')
      GROUP BY 1, 2, 3, 4),
    ha_fin AS (SELECT d.brand, d.channel, d.audience, d.year, d.month,
      d.zip_code, d.dma, d.state, d.country, d.reach, d.engage,
      CASE WHEN d.channel = 'Custom' AND d.year = '2024'
          AND d.audience = 'HCP'
        THEN (d.reach / d.tot) * ca.cost +
          (d.reach / d.tot) * (mc.missing_cost / 11)
        WHEN d.channel = 'Paid Social' AND d.year = '2024'
          AND d.audience = 'HCP'
        THEN (d.reach / d.tot) * ca.cost +
          (d.reach / d.tot) * (mc.missing_cost / 9)
        ELSE (d.reach / d.tot) * ca.cost END AS cost
      FROM ha_dmr d
      JOIN ha_alloc ca ON d.year = ca.year AND d.month = ca.month
        AND d.channel = ca.channel
      LEFT JOIN ha_mc mc ON d.year = mc.year AND d.channel = mc.channel
        AND d.audience = mc.audience)"""
}
