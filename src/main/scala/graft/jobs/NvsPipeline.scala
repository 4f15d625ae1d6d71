package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.ChannelOps._

/** The reference's channel-performance pipeline, re-expressed as composable
  * DataFrame builders (all cites `S1` =
  * `/root/reference/PySpark_Scripts/stage_1_hcp_channel_all_hardcode.py`).
  *
  * Inputs are logical table names resolved through the session catalog
  * (register fixtures or production paths as temp views first — replaces the
  * reference's Glue/Athena catalog indirection, S1:50-91).
  *
  * Fidelity notes (quirks preserved on purpose — SURVEY §7.3):
  *  - CASE expressions with no ELSE yield NULL for unmatched rows
  *    (S1:121-124,843-850);
  *  - lenient casts everywhere (`substring` over int yrmo/year_mth columns,
  *    comma-stripped money strings) — requires ansi=false sessions;
  *  - the weekly→monthly bucket keeps ONLY the month number (the reference
  *    formats '%m', so week 53 wraps into month 2 without touching year,
  *    S1:853 — implemented with the Spark-dialect twin of S1:717);
  *  - two allocation implementations exist (window vs groupBy+join-back) and
  *    both are kept, matching the reference's two code paths;
  *  - the coalesce-keyed FULL JOIN (S1:1024-1025) degrades to a nested-loop
  *    join — ported verbatim; its LEFT side is detail-grain (`allHcp`), but
  *    the OTHER side of the nested loop is the bounded channel × month
  *    allocations grid, so total cost is linear in detail rows × a small
  *    constant — scale-safe without being key-equi.
  */
object NvsPipeline {

  val Brand = "XOLAIR"

  private def T(s: SparkSession, name: String): DataFrame = s.table(name)

  /** `cleaned_dmas` (S1:245-248 et al.): distinct DMA dimension. */
  def cleanedDmas(demographics: DataFrame): DataFrame =
    demographics.select(col("dma_code"), col("dma_name")).distinct()

  /** The DMA dim each view builder joins: the shared persisted copy when
    * the caller composed one (q168's 6-view union re-derived it per view —
    * six nation scans + six distinct exchanges + six broadcast builds for
    * the same ~25 rows; guide §2.4/§5: derive once, share the exchange),
    * else derived fresh exactly as before. Values are identical either
    * way — cleanedDmas is deterministic and the join is broadcast on the
    * same key in both shapes. */
  private def dmasOr(s: SparkSession, shared: Option[DataFrame]): DataFrame =
    shared.getOrElse(cleanedDmas(T(s, "demographics")))

  /** The shared DTC/HCP "nvs_cleaned" shape (S1:252-264): constants + period
    * split + sum of lenient-cast measures, grouped by the six dims. */
  def nvsCleaned(unioned: DataFrame, channel: String, audience: String,
      engageExpr: Column): DataFrame =
    unioned
      .withColumn("brand", lit(Brand))
      .withColumn("channel", lit(channel))
      .withColumn("audience", lit(audience))
      .withColumn("year", substring(col("year_mth").cast("string"), 1, 4))
      .withColumn("month", substring(col("year_mth").cast("string"), 5, 2))
      .withColumn("zip_code", nullOf("string"))
      .withColumn("state", nullOf("string"))
      .withColumn("country", lit("US"))
      .groupBy(col("brand"), col("channel"), col("audience"), col("year"),
        col("month"), col("dma_code"), col("zip_code"), col("state"), col("country"))
      .agg(
        sum(col("impressions").cast("double")).as("reach"),
        engageExpr.as("engage"))

  /** `dma_joined` (S1:266-281): resolve dma_code → dma_name. The dim is tiny
    * (~200 DMAs) — broadcast, no shuffle of the fact side. */
  def dmaJoined(cleaned: DataFrame, dmas: DataFrame,
      castKey: Boolean = false): DataFrame = {
    val key =
      if (castKey) cleaned("dma_code").cast("string") === dmas("dma_code")
      else cleaned("dma_code") === dmas("dma_code")
    cleaned.join(broadcast(dmas), key)
      .select(cleaned("brand"), cleaned("channel"), cleaned("audience"),
        cleaned("month"), cleaned("year"), cleaned("zip_code"),
        dmas("dma_name").as("dma"), cleaned("state"), cleaned("country"),
        cleaned("reach"), cleaned("engage"))
  }

  /** Wide-costs branch (S1:283-289): one money column, comma-stripped,
    * months up to 2023-12 (lexicographic string compare — F-17). */
  def costsWide(costs: DataFrame, moneyCol: String,
      cutoff: Boolean = true): DataFrame = {
    val base = if (cutoff) costs.where(col("date_month_") <= "2023-12") else costs
    base.select(
      substring(col("date_month_"), 1, 4).as("year"),
      substring(col("date_month_"), 6, 2).as("month"),
      parseMoney(col(moneyCol)).as("cost"))
  }

  /** Unpivot-costs branch (S1:291-296): long-form costs filtered to one
    * audience/channel. */
  def costsUnpivot(unpivot: DataFrame, audience: String,
      channelUpper: String): DataFrame =
    unpivot
      .where(col("audience") === audience && upper(col("channel")) === channelUpper)
      .select(
        substring(col("year_month").cast("string"), 1, 4).as("year"),
        substring(col("year_month").cast("string"), 5, 2).as("month"),
        col("cost"))

  /** `final_agg` (S1:298-315): window-based proportional allocation of the
    * monthly budget over DMA reach. Output: the 12-column channel fact. */
  def windowAllocated(dj: DataFrame, costs: DataFrame, joinType: String): DataFrame =
    dj.join(costs.withColumnRenamed("year", "c_year").withColumnRenamed("month", "c_month"),
        dj("year") === col("c_year") && dj("month") === col("c_month"), joinType)
      .select(
        col("brand"), col("channel"), col("audience"), col("year"),
        col("month").cast("integer").as("month"),
        col("zip_code"), col("dma"), col("state"), col("country"),
        col("reach"), col("engage"),
        (col("cost").cast("double") * col("reach") /
          sum(col("reach")).over(Window.partitionBy(col("brand"), col("month"), col("year"))))
          .as("cost"))

  // ------------------------------------------------------------------ tam

  /** `tam_ce` (S1:94-183): sales-call TAM fact. */
  def tamCe(s: SparkSession): DataFrame = {
    import s.implicits._
    val callCols = Seq("npi_num", "zip_cd", "city", "state", "brand", "yrmo",
      "call_p1", "call_p2", "call_p3", "calls", "lunch_n_learn_calls").map(col)
    val raw = Seq(
      T(s, "nvs_calls_v1").select(callCols: _*).where($"yrmo".between(202201, 202206)),
      T(s, "nvs_calls_v2").select(callCols: _*).where($"yrmo".between(202207, 202212)),
      T(s, "nvs_calls_v3").select(callCols: _*).where($"yrmo".between(202301, 202312)),
      T(s, "nvs_calls_v4").select(callCols: _*).where($"yrmo" >= 202401)
    ).reduce(_ union _)

    val mdm = T(s, "mdm_profile")
    val hcp = T(s, "hcp_org_map")
    // S1:117-132: 3-table chain, array-membership predicate, priority CASE
    // with no ELSE (unmatched calls → NULL display_order).
    val normalized = raw.as("nvs")
      .join(mdm.as("mdm"), $"nvs.npi_num" === $"mdm.npi_number")
      .join(hcp.as("hcp"),
        $"mdm.mdm_id" === $"hcp.mdm_id" && array_contains($"hcp.product_brand_name", Brand))
      .where($"nvs.npi_num".isNotNull)
      .select(
        $"hcp.mdm_zip".as("zip_code"),
        $"nvs.yrmo".as("year_month"),
        lit(Brand).as("product_brand_name"),
        caseNoElse(
          ($"call_p1" === "1" || $"lunch_n_learn_calls" === "1") -> lit(1),
          ($"call_p2" === "1") -> lit(2),
          ($"call_p3" === "1") -> lit(3)).as("display_order"))

    // S1:134-140 inline VALUES cost table
    val tamHdCosts = Seq(
      (Brand, 32000000.0, "2022"),
      (Brand, 32000000.0, "2023"),
      (Brand, 36583323.0, "2024")).toDF("brand", "cost", "year")

    // S1:142-154: expression-key join (substring of int ym — lenient cast),
    // reciprocal-rank reach
    val hcpCosts = normalized.as("n")
      .join(tamHdCosts.as("c"),
        $"n.product_brand_name" === $"c.brand" &&
          substring($"n.year_month".cast("string"), 1, 4) === $"c.year")
      .select(
        $"n.product_brand_name", $"n.year_month", $"n.zip_code".as("zip"),
        lit("CE").as("audience"), lit("tam_hd").as("channel"),
        (lit(1.0) / $"display_order").as("reach"), $"c.cost")

    // S1:156-165: window allocation over (brand, year); S1:167-180: group-sum
    val finalAgg = hcpCosts.select(
      $"product_brand_name", lit("NVS").as("source"), $"year_month", $"zip",
      $"audience", $"channel", $"reach", nullOf("double").as("engage"),
      allocateByShare($"cost", $"reach",
        $"product_brand_name", substring($"year_month".cast("string"), 1, 4)).as("cost"))

    finalAgg.groupBy($"product_brand_name", $"source", $"year_month",
        $"zip".cast("string").as("zip"), $"audience", $"channel")
      .agg(
        sum($"reach".cast("double")).as("reach"),
        sum($"engage".cast("double")).as("engage"),
        sum($"cost".cast("double")).as("cost"))
  }

  // -------------------------------------------------------- DTC channels

  private def periodCols(names: String*): Seq[Column] = names.map(col)

  /** `dtc_display` (S1:228-321). */
  def dtcDisplay(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    val cols = periodCols("year_mth", "dma_region", "dma_code", "impressions", "clicks")
    val unioned = Seq(
      T(s, "dtc_display_v1").select(cols: _*).where(col("year_mth").between(202201, 202212)),
      T(s, "dtc_display_v2").select(cols: _*).where(col("year_mth").between(202301, 202312)),
      T(s, "dtc_display_v3").select(cols: _*).where(col("year_mth") >= 202401)
    ).reduce(_ union _)
    val cleaned = nvsCleaned(unioned, "Display", "DTC",
      sum(col("clicks").cast("double")))
    val dj = dmaJoined(cleaned, dmasOr(s, dmas))
    val costs = costsWide(T(s, "costs_wide"), "dtc_display_")
      .union(costsUnpivot(T(s, "costs_unpivot"), "DTC", "DIGITAL DISPLAY"))
    windowAllocated(dj, costs, "inner")
  }

  /** `dtc_paid_search` (S1:323-416). */
  def dtcPaidSearch(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    val cols = periodCols("year_mth", "dma_name", "dma_code", "impressions", "clicks")
    val unioned = Seq(
      T(s, "dtc_search_v1").select(cols: _*).where(col("year_mth").between(202201, 202212)),
      T(s, "dtc_search_v2").select(cols: _*).where(col("year_mth").between(202301, 202312)),
      T(s, "dtc_search_v3").select(cols: _*).where(col("year_mth") >= 202401)
    ).reduce(_ union _)
    val cleaned = nvsCleaned(unioned, "Paid Search", "DTC",
      sum(col("clicks").cast("double")))
    val dj = dmaJoined(cleaned, dmasOr(s, dmas))
    val costs = costsWide(T(s, "costs_wide"), "dtc_search")
      .union(costsUnpivot(T(s, "costs_unpivot"), "DTC", "PAID SEARCH"))
    windowAllocated(dj, costs, "inner")
  }

  /** `dtc_poc` (S1:419-499): no clicks (engage NULL), LEFT join to costs. */
  def dtcPoc(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    val cols = periodCols("year_mth", "dma", "dma_code", "impressions")
    val unioned = Seq(
      T(s, "poc_v1").select(cols: _*).where(col("year_mth").between(202201, 202212)),
      T(s, "poc_v2").select(cols: _*).where(col("year_mth").between(202301, 202312)),
      T(s, "poc_v3").select(cols: _*).where(col("year_mth") >= 202401)
    ).reduce(_ union _)
    val cleaned = nvsCleaned(unioned, "Point of Care", "DTC",
      max(nullOf("double"))) // S1:448: engage is a NULL literal, not a click sum
    val dj = dmaJoined(cleaned, dmasOr(s, dmas))
    val costs = costsWide(T(s, "costs_wide"), "dtc_poc")
    windowAllocated(dj, costs, "left")
  }

  /** `dtc_paid_social` (S1:502-578): 2 vintages, LEFT join, no cost cutoff. */
  def dtcPaidSocial(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    val cols = periodCols("dma_code", "dma_name", "year_mth", "impressions", "clicks")
    val unioned = Seq(
      T(s, "social_v1").select(cols: _*).where(col("year_mth").between(202201, 202212)),
      T(s, "social_v2").select(cols: _*).where(col("year_mth") >= 202301)
    ).reduce(_ union _)
    val cleaned = nvsCleaned(unioned, "Paid Social", "DTC",
      sum(col("clicks").cast("double")))
    val dj = dmaJoined(cleaned, dmasOr(s, dmas))
    val costs = costsWide(T(s, "costs_wide"), "dtc_social", cutoff = false)
    windowAllocated(dj, costs, "left")
  }

  // -------------------------------------------------------- HCP channels

  /** `hcp_paid_search` (S1:580-679): the groupBy+join-back allocation twin
    * (monthly_reach ratio instead of a window). */
  def hcpPaidSearch(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val v1 = T(s, "hcp_search_v1")
      .where($"activity_date" <= "2022-12-31")
      .select($"dma_code",
        date_format($"activity_date".cast("date"), "yyyyMM").as("year_mth"),
        $"impressions", $"clicks")
    val cols = periodCols("dma_code", "year_mth", "impressions", "clicks")
    val v2 = T(s, "hcp_search_v2").select(cols: _*).where($"year_mth".between(202301, 202312))
    val v3 = T(s, "hcp_search_v3").select(cols: _*).where($"year_mth" >= 202401)
    val unioned = v1.union(v2).union(v3)

    val cleaned = nvsCleaned(unioned, "Paid Search", "HCP",
      sum(col("clicks").cast("double")))
    // persisted: dj feeds BOTH the monthly_reach aggregate-of-aggregate and
    // the final ratio join (S1:650-675) — without it each consumer re-runs
    // the 3-vintage union + group-sum + dim join (guide §5)
    val dj = graft.core.CacheScope.persist(
      dmaJoined(cleaned, dmasOr(s, dmas)))

    // S1:634-648: 16% of npp before 2024, summed unpivot rows after
    val costs = costsWide(T(s, "costs_wide"), "npp")
      .withColumn("cost", col("cost") * 0.16)
      .union(
        T(s, "costs_unpivot")
          .where($"audience" === "HCP" && upper($"channel") === "PAID SEARCH")
          .groupBy(
            substring($"year_month".cast("string"), 1, 4).as("year"),
            substring($"year_month".cast("string"), 5, 2).as("month"))
          .agg(sum($"cost").as("cost")))

    // S1:650-675: aggregate-of-aggregate + two joins, ratio allocation
    val monthlyReach = dj.groupBy($"year", $"month")
      .agg(sum($"reach").as("total_monthly_reach"))
    dj.as("dj")
      .join(monthlyReach.as("mr"), $"dj.year" === $"mr.year" && $"dj.month" === $"mr.month")
      .join(costs.as("ca"), $"dj.year" === $"ca.year" && $"dj.month" === $"ca.month")
      .select($"dj.brand", $"dj.channel", $"dj.audience", $"dj.year",
        $"dj.month".cast("integer").as("month"),
        $"dj.zip_code", $"dj.dma", $"dj.state", $"dj.country",
        $"dj.reach", $"dj.engage",
        (($"dj.reach" / $"mr.total_monthly_reach") * $"ca.cost").as("cost"))
  }

  /** Channel-name canonicalization CASEs (S1:843-850 old / S1:922-929 new) —
    * no ELSE: unknown channels map to NULL. */
  private def canonChannelOld(c: Column): Column = caseNoElse(
    c.like("EHR") -> lit("EHR/EMR"),
    c.like("3RD_PARTY_EMAIL") -> lit("Third-Party Email"),
    c.like("POC") -> lit("Point of Care"),
    c.like("DISPLAY") -> lit("Display"),
    c.isin("VIDEO", "CUSTOM") -> lit("Custom"),
    c.like("ENDEMIC_SOCIAL") -> lit("Paid Social"))

  private def canonChannelNew(c: Column): Column = caseNoElse(
    c.like("EHR") -> lit("EHR/EMR"),
    c.like("3rd Party Email") -> lit("Third-Party Email"),
    c.like("POC") -> lit("Point of Care"),
    c.like("Digital Display") -> lit("Display"),
    c.isin("Video", "Custom") -> lit("Custom"),
    c.like("Endemic Social") -> lit("Paid Social"))

  /** `hcp_all_channels` (S1:817-1066) — the monster: weekly long→wide pivot,
    * week→month bucketing, old∪new channel normalization, share-spread ∪
    * unpivot cost reconciliation, missing-cost probe (coalesce-key FULL JOIN),
    * and the /11 /9 back-spread. */
  def hcpAllChannels(s: SparkSession, dmas: Option[DataFrame] = None): DataFrame = {
    import s.implicits._

    // S1:823-837: weekly long→wide via conditional aggregation
    val pivoted = T(s, "hcp_all_weekly")
      .where($"zip_cd".isNotNull && $"yrwk" <= 202352)
      .withColumn("brand", lit(Brand))
      .withColumn("audience", lit("HCP"))
      .withColumn("year", substring($"yrwk".cast("string"), 1, 4).cast("string"))
      .withColumn("week", substring($"yrwk".cast("string"), 5, 2).cast("string"))
      .withColumn("zip_code", $"zip_cd")
      .withColumn("dma", nullOf("string"))
      .withColumn("state", nullOf("string"))
      .withColumn("country", lit("US"))
      .groupBy($"brand", $"channel", $"audience", $"year", $"week",
        $"zip_code", $"dma", $"state", $"country")
      .agg(
        pivotMetric($"metric", $"value", "REACH").as("reach"),
        pivotMetric($"metric", $"value", "ENGAGEMENT").as("engage"))

    // S1:839-861: canonical channel + week→month (month number only — the
    // reference formats '%m'; Spark-dialect resolution of the F-13 landmine)
    val weeklyToMonthly = pivoted.select(
      $"brand",
      canonChannelOld($"channel").as("channel"),
      $"audience", $"year",
      month(weekToMonth(concat($"year", lpad($"week", 2, "0")).cast("long")))
        .cast("int").as("month"),
      $"zip_code", $"dma", $"state", $"country", $"reach", $"engage")

    val hcpChannelsOld = weeklyToMonthly
      .groupBy($"brand", $"channel", $"audience", $"year", $"month",
        $"zip_code".cast("string").as("zip_code"), $"dma", $"state", $"country")
      .agg(sum($"reach").as("reach"), sum($"engage").as("engage"))

    // S1:885-901: 2024+ monthly sources (display/video/custom ∪ poc ∪ social)
    val combined = Seq(
      T(s, "hcp_all_new").where($"year_mth" >= 202401)
        .groupBy($"ipmm_channel", $"dma_code", $"year_mth")
        .agg(sum($"impressions").as("impressions"), sum($"clicks").as("clicks")),
      T(s, "hcp_poc_new").where($"year_mth" >= 202401)
        .groupBy(lit("POC").as("ipmm_channel"), $"dma_code", $"year_mth")
        .agg(sum($"impressions").as("impressions"), lit(null).cast("double").as("clicks")),
      T(s, "hcp_social_new").where($"year_mth" >= 202401)
        .groupBy(lit("Endemic Social").as("ipmm_channel"), $"dma_code", $"year_mth")
        .agg(sum($"impressions").as("impressions"), sum($"clicks").as("clicks"))
    ).reduce(_ union _)

    val hcpRaw = combined
      .groupBy(lit(Brand).as("brand"), $"ipmm_channel".as("channel"),
        lit("HCP").as("audience"), $"dma_code",
        substring($"year_mth".cast("string"), 1, 4).as("year"),
        substring($"year_mth".cast("string"), 5, 2).as("month"),
        nullOf("string").as("zip_code"), nullOf("string").as("state"),
        lit("US").as("country"))
      .agg(sum($"impressions").as("reach"), sum($"clicks").as("engage"))

    val dmaDim = dmasOr(s, dmas)
    // S1:905-929: cast-key dim join (J-5) + new-channel canonicalization
    val hcpChannelsNew = hcpRaw.as("nvs")
      .join(broadcast(dmaDim).as("cd"), $"nvs.dma_code".cast("string") === $"cd.dma_code")
      .select($"brand", canonChannelNew($"nvs.channel").as("channel"), $"audience",
        $"year", $"month".cast("string").as("month"), $"zip_code",
        $"cd.dma_name".as("dma"), $"state", $"country", $"reach", $"engage")

    // positional union: old month int ∪ new month string → string (A.16 quirk)
    // persist: three downstream consumers (monthly_reach, the missing-cost
    // probe, and the final allocation join) each re-derive this union — the
    // reference's single-plan Catalyst run recomputes it per consumer too;
    // caching changes execution cost only, never values. CacheScope-
    // registered: the session owner releases it after the query's action.
    val allHcp = graft.core.CacheScope.persist(
      hcpChannelsOld.union(hcpChannelsNew))

    // S1:948-969: pre-2024 spend spread over fixed shares
    val spend = T(s, "costs_wide")
      .where($"date_month_" <= "2023-12")
      .select(
        substring($"date_month_".cast("string"), 1, 4).as("year"),
        substring($"date_month_".cast("string"), 6, 2).as("month"),
        parseMoney($"npp".cast("string")).as("total_cost"))
    val allocOld = spreadByShares(
        spend.withColumn("brand", lit(Brand)), "total_cost",
        Seq("Display" -> 0.39, "Paid Social" -> 0.22, "Third-Party Email" -> 0.06,
          "Point of Care" -> 0.08, "Custom" -> 0.08, "EHR/EMR" -> 0.01))
      .select($"brand", $"year", $"month", $"channel", $"cost")

    // S1:971-985: 2024+ unpivot costs, canonical channel
    val allocNew = T(s, "costs_unpivot")
      .where($"audience" === "HCP")
      .groupBy(lit(Brand).as("brand"),
        substring($"year_month".cast("string"), 1, 4).as("year"),
        substring($"year_month".cast("string"), 5, 2).as("month"),
        caseNoElse(
          $"channel".isin("POC") -> lit("Point of Care"),
          $"channel".isin("Digital Display") -> lit("Display"),
          $"channel".isin("3rd Party Email") -> lit("Third-Party Email"),
          $"channel".isin("Endemic Social") -> lit("Paid Social"),
          $"channel".isin("Online Video", "Video", "Custom") -> lit("Custom")).as("channel"))
      .agg(sum($"cost").as("cost"))
      .select($"brand", $"year", $"month", $"channel", $"cost")

    // persisted: allocations feeds BOTH the missing-cost probe's FULL
    // JOIN and the final allocation join, monthlyReach both reach joins —
    // without the persists each consumer re-derives the share-spread ∪
    // unpivot union (allocations) and the group-sum over allHcp
    // (monthlyReach) from scratch (guide §5: reuse beats recompute; values
    // unchanged — the cache stores exactly the rows the plan produced)
    val allocations = graft.core.CacheScope.persist(
      allocOld.union(allocNew))

    // S1:993-1001
    val monthlyReach = graft.core.CacheScope.persist(
      allHcp.groupBy($"brand", $"year", $"month", $"channel")
        .agg(sum($"reach").as("total_monthly_reach")))

    // S1:1004-1027: missing-cost probe — inner join reach, coalesce-key FULL
    // JOIN to allocations, keep 2024 rows where reach is null
    val probe = allHcp.as("d")
      .join(monthlyReach.as("mr"),
        $"d.year" === $"mr.year" && $"d.month" === $"mr.month" && $"d.channel" === $"mr.channel")
      .join(allocations.as("ca"),
        coalesce($"d.year", $"ca.year") === $"ca.year" &&
          coalesce($"d.month", $"ca.month") === $"ca.month" &&
          coalesce($"d.channel", $"ca.channel") === $"ca.channel",
        "full")
      .where(coalesce($"d.year", $"ca.year", $"mr.year") === "2024" && $"d.reach".isNull)
      .select(
        coalesce($"d.brand", $"ca.brand", $"mr.brand").as("brand"),
        coalesce($"d.channel", $"ca.channel", $"mr.channel").as("channel"),
        coalesce($"d.audience", lit("HCP")).as("audience"),
        coalesce($"d.year", $"ca.year", $"mr.year").as("year"),
        coalesce($"d.month", $"ca.month", $"mr.month").as("month"),
        $"d.reach", $"d.engage",
        when($"d.reach".isNotNull && $"mr.total_monthly_reach".isNotNull,
          ($"d.reach" / $"mr.total_monthly_reach") * $"ca.cost")
          .otherwise($"ca.cost").as("cost"))

    // S1:1029-1037: missing cost rolled up per (brand, channel, audience, year)
    val missingCost = probe
      .where($"channel".isin("Paid Social", "Custom"))
      .groupBy($"brand", $"channel", $"audience", $"year")
      .agg(sum($"reach").as("reach"), sum($"engage").as("engage"),
        sum($"cost").as("missing_cost"))

    // S1:1039-1065: final allocation with /11 /9 back-spread for 2024
    val ratio = $"d.reach" / $"mr.total_monthly_reach"
    allHcp.as("d")
      .join(monthlyReach.as("mr"),
        $"d.year" === $"mr.year" && $"d.month" === $"mr.month" && $"d.channel" === $"mr.channel")
      .join(allocations.as("ca"),
        $"d.year" === $"ca.year" && $"d.month" === $"ca.month" && $"d.channel" === $"ca.channel")
      .join(missingCost.as("mc"),
        $"d.year" === $"mc.year" && $"d.channel" === $"mc.channel" &&
          $"d.audience" === $"mc.audience", "left")
      .select($"d.brand", $"d.channel", $"d.audience", $"d.year", $"d.month",
        $"d.zip_code", $"d.dma", $"d.state", $"d.country", $"d.reach", $"d.engage",
        when($"d.channel" === "Custom" && $"d.year" === "2024" && $"d.audience" === "HCP",
          ratio * $"ca.cost" + ratio * ($"mc.missing_cost" / 11))
          .when($"d.channel" === "Paid Social" && $"d.year" === "2024" && $"d.audience" === "HCP",
            ratio * $"ca.cost" + ratio * ($"mc.missing_cost" / 9))
          .otherwise(ratio * $"ca.cost").as("cost"))
  }

  /** `combined_nvs_data` (S1:1069-1084): 6-way positional UNION ALL.
    * The DMA dim is derived and persisted ONCE here and shared by all six
    * views (see [[dmasOr]]) — the reference's single-plan Catalyst run
    * re-derived it per view; sharing changes execution cost only, never
    * values. */
  def combined(s: SparkSession): DataFrame = {
    val dmas = Some(graft.core.CacheScope.persist(
      cleanedDmas(T(s, "demographics"))))
    Seq(dtcDisplay(s, dmas), dtcPaidSearch(s, dmas), dtcPoc(s, dmas),
      dtcPaidSocial(s, dmas), hcpPaidSearch(s, dmas),
      hcpAllChannels(s, dmas)).reduce(_ union _)
  }
}
