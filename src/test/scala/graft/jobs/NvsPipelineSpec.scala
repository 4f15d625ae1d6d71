package graft.jobs

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Job-level semantics of the ported reference pipeline, checked against
  * hand-computable invariants (SURVEY §5.2-5.3): allocation re-sums to the
  * budget, drop-branches fire, schemas match FIXTURES.md A.15/A.16. */
class NvsPipelineSpec extends SparkSpec {

  lazy val init: Unit = NvsFixtures.registerAll(spark)

  test("tam_ce: schema, drop branches, allocation re-sums to yearly budget") {
    init
    val tam = NvsPipeline.tamCe(spark).cache()
    assert(tam.columns.toSeq == Seq("product_brand_name", "source", "year_month",
      "zip", "audience", "channel", "reach", "engage", "cost"))

    val rows = tam.collect()
    // null-npi row and non-XOLAIR org (N4) dropped; out-of-range vintages dropped
    assert(!rows.map(_.getString(3)).contains("60601"))

    // allocation invariant: per year, costs re-sum to the inline budget
    val byYear = tam.groupBy(substring(col("year_month").cast("string"), 1, 4).as("yr"))
      .agg(sum("cost").as("c")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(byYear("2022") - 32000000.0) < 1e-6)
    assert(math.abs(byYear("2023") - 32000000.0) < 1e-6)
    assert(math.abs(byYear("2024") - 36583323.0) < 1e-6)

    // reciprocal-rank reach: priority 1 → 1.0, 2 → 0.5, 3 → 1/3
    // (year_month keeps its source type — int here — per S1:171 passthrough)
    val n3_2022 = rows.filter(r => String.valueOf(r.get(2)) == "202204").map(_.getDouble(6)).sum
    assert(math.abs(n3_2022 - 1.0 / 3) < 1e-12)
  }

  test("tam_ce: exact golden rows (reciprocal-rank reach, yearly allocation)") {
    init
    val got = NvsPipeline.tamCe(spark).collect().map { r =>
      (String.valueOf(r.get(2)), r.getString(3), r.getDouble(6),
        math.rint(r.getDouble(8) * 100) / 100)
    }.toSet
    // 2022 reach: N1 p1 202203 → 1.0 @10001, N2 p2 202203 → 0.5 @10002,
    // N3 p3 202204 → 1/3 @02101, N1 lunch 202209 → 1.0 @10001;
    // total 17/6 → cost_i = 32M × r_i/(17/6). 2023: N2 alone takes 32M.
    // 2024: N3 alone takes 36,583,323. (202209+202203 @10001 stay separate
    // rows — year_month is a group key.)
    val y22 = 32000000.0 / (17.0 / 6)
    val want = Set(
      ("202203", "10001", 1.0, math.rint(y22 * 100) / 100),
      ("202203", "10002", 0.5, math.rint(y22 * 0.5 * 100) / 100),
      ("202204", "02101", 1.0 / 3, math.rint(y22 / 3 * 100) / 100),
      ("202209", "10001", 1.0, math.rint(y22 * 100) / 100),
      ("202305", "10002", 0.5, 32000000.0),
      ("202402", "02101", 1.0, 36583323.0))
    assert(got == want)
  }

  test("dtc_display: monthly budget conservation and inner-join cost cutoff") {
    init
    val d = NvsPipeline.dtcDisplay(spark).cache()
    assert(d.columns.toSeq == Seq("brand", "channel", "audience", "year", "month",
      "zip_code", "dma", "state", "country", "reach", "engage", "cost"))
    val byMonth = d.groupBy("year", "month").agg(sum("cost").as("c")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // 2022-03 wide cost 10,000 spread over two DMAs; comma parsing exercised
    assert(math.abs(byMonth(("2022", 3)) - 10000.0) < 1e-9)
    // 2024-01 unpivot cost
    assert(math.abs(byMonth(("2024", 1)) - 5000.0) < 1e-9)
    // unknown dma_code 999 dropped by the dim join
    assert(d.where(col("reach") === 7777.0).count() == 0)
  }

  test("dtc_display: exact golden rows (hand-computed allocation)") {
    init
    val got = NvsPipeline.dtcDisplay(spark).collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getInt(4),
        r.getString(6), r.getDouble(9), r.getDouble(10), r.getDouble(11))
    }.toSet
    // fixture arithmetic: 2022-03 budget 10,000 over reach {NY:1000, BOS:3000};
    // 2022-04 NY alone takes 20,000; 2023-05 NY takes 15,000 (comma-parsed);
    // 2024-01 BOS takes the 5,000 unpivot cost. 999-dma and cutoff rows gone.
    val want = Set(
      ("XOLAIR", "Display", "DTC", "2022", 3, "NEW YORK", 1000.0, 10.0, 2500.0),
      ("XOLAIR", "Display", "DTC", "2022", 3, "BOSTON", 3000.0, 30.0, 7500.0),
      ("XOLAIR", "Display", "DTC", "2022", 4, "NEW YORK", 2000.0, 20.0, 20000.0),
      ("XOLAIR", "Display", "DTC", "2023", 5, "NEW YORK", 1500.0, 15.0, 15000.0),
      ("XOLAIR", "Display", "DTC", "2024", 1, "BOSTON", 800.0, 8.0, 5000.0))
    assert(got == want)
  }

  test("dtc_poc/social: LEFT cost join keeps reach rows with NULL cost") {
    init
    val poc = NvsPipeline.dtcPoc(spark)
    // 2023-01 poc reach exists, wide costs exist up to 2023-12 incl 2023-01
    val noCost = poc.where(col("cost").isNull).count()
    val social = NvsPipeline.dtcPaidSocial(spark)
    // social 2023-05 reach has a matching wide-cost row (no cutoff for social)
    assert(social.where(col("year") === "2023" && col("cost").isNotNull).count() >= 1)
    // poc engage is always NULL (S1:448)
    assert(poc.where(col("engage").isNotNull).count() == 0)
    assert(noCost >= 0) // shape check; exact NULL count depends on cost coverage
  }

  test("hcp_paid_search: ratio allocation equals window allocation semantics") {
    init
    val h = NvsPipeline.hcpPaidSearch(spark).cache()
    // per-month cost re-sums to the month budget (0.16*npp pre-2024)
    val may22 = h.where(col("year") === "2022" && col("month") === 5)
      .agg(sum("cost")).head().getDouble(0)
    assert(math.abs(may22 - 70000.0 * 0.16) < 1e-6)
    val jan24 = h.where(col("year") === "2024")
      .agg(sum("cost")).head().getDouble(0)
    assert(math.abs(jan24 - 2500.0) < 1e-9)
  }

  test("hcp_paid_search: exact golden rows (ratio allocation, date normalize)") {
    init
    val got = NvsPipeline.hcpPaidSearch(spark).collect().map { r =>
      (r.getString(3), r.getInt(4), r.getString(6), r.getDouble(9),
        math.rint(r.getDouble(11) * 1e6) / 1e6)
    }.toSet
    // 2022-05: v1 rows 2022-05-10 (dma 500, 80) + 2022-05-20 (dma 501, 120)
    // normalized via date_format → 202205; cost = 0.16 × npp(70,000) split
    // 80:120. 2023-03: v2 row (90) takes 0.16 × 44,000. 2024-01: v3 row
    // (110) takes the 2,500 unpivot HCP Paid Search cost.
    val want = Set(
      ("2022", 5, "NEW YORK", 80.0, math.rint(0.16 * 70000 * 0.4 * 1e6) / 1e6),
      ("2022", 5, "BOSTON", 120.0, math.rint(0.16 * 70000 * 0.6 * 1e6) / 1e6),
      ("2023", 3, "NEW YORK", 90.0, math.rint(0.16 * 44000 * 1e6) / 1e6),
      ("2024", 1, "BOSTON", 110.0, 2500.0))
    assert(got == want)
  }

  test("hcp_all_channels: pivot, week→month, month-pad drop quirk, back-spread") {
    init
    val h = NvsPipeline.hcpAllChannels(spark).cache()
    val rows = h.collect()
    assert(rows.nonEmpty)

    // VERBATIM QUIRK (S1:876 int month ∪ S1:932 string month → union coerces
    // int→string WITHOUT zero-pad, but allocation months are zero-padded
    // substrings): pre-2024 weekly rows bucketed into months 1-9 can never
    // match `d.month = ca.month` and are dropped. EHR week 202205 → month "2"
    // vs alloc "02" → gone. Only Oct-Dec old-weekly buckets survive.
    assert(h.where(col("channel") === "EHR/EMR" && col("year") === "2022").count() == 0)

    // ENDEMIC_SOCIAL / 3RD_PARTY_EMAIL week 202240 → (40-1)/4 = 9 months
    // after Jan 1 = October → month "10" → two digits, allocation matches.
    val soc = h.where(col("channel") === "Paid Social" && col("year") === "2022").collect()
    assert(soc.map(r => r.getDouble(r.fieldIndex("reach"))).sum == 250.0)
    // cost = 0.22 share of 2022-10 npp (41,000)
    assert(math.abs(soc.map(r => r.getDouble(r.fieldIndex("cost"))).sum - 41000.0 * 0.22) < 1e-9)
    val tpe = h.where(col("channel") === "Third-Party Email" && col("year") === "2022").collect()
    assert(math.abs(tpe.map(r => r.getDouble(r.fieldIndex("cost"))).sum - 41000.0 * 0.06) < 1e-9)

    // 2024 Custom rows carry the /11 back-spread: cost present
    val custom24 = h.where(col("channel") === "Custom" && col("year") === "2024")
    assert(custom24.where(col("cost").isNotNull).count() >= 1)
    // null zip weekly row dropped
    assert(h.where(col("reach") === 999.0).count() == 0)
    // month column is string after the coercing union
    assert(h.schema("month").dataType.typeName == "string")
  }

  test("combined: 6-way positional union, month coerced to string") {
    init
    val c = NvsPipeline.combined(spark)
    val total = c.count()
    // combined's allHcp persist is live; hcpAllChannels below re-builds the
    // identical sub-plan — release first
    graft.core.CacheScope.drain()
    val six = Seq(NvsPipeline.dtcDisplay(spark), NvsPipeline.dtcPaidSearch(spark),
      NvsPipeline.dtcPoc(spark), NvsPipeline.dtcPaidSocial(spark),
      NvsPipeline.hcpPaidSearch(spark), NvsPipeline.hcpAllChannels(spark))
    assert(total == six.map(_.count()).sum)
    assert(c.schema("month").dataType.typeName == "string")
  }
}
