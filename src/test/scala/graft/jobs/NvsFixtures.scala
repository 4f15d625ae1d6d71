package graft.jobs

import org.apache.spark.sql.SparkSession

/** Deterministic staging-table fixtures matching FIXTURES.md §A schemas,
  * registered as the temp views [[NvsPipeline]] reads. Content rules
  * (FIXTURES.md): NULL npi_num rows, non-XOLAIR org rows, NULL zip_cd weekly
  * rows, comma-formatted money, a 2024 channel-month with cost but no reach —
  * every drop/keep branch of the pipeline fires. */
object NvsFixtures {

  def registerAll(s: SparkSession): Unit = {
    import s.implicits._

    // A.4 demographics dim
    Seq(("500", "NEW YORK", "10001"), ("501", "BOSTON", "02101"),
        ("502", "CHICAGO", "60601"))
      .toDF("dma_code", "dma_name", "zip")
      .createOrReplaceTempView("demographics")

    // A.1 sales calls — call_p1/lunch → priority 1, p2 → 2, p3 → 3, none → NULL
    def calls(rows: Seq[(String, String, Int, String, String, String, String, String)]) =
      rows.toDF("npi_num", "zip_cd", "yrmo", "call_p1", "call_p2", "call_p3",
        "calls", "lunch_n_learn_calls")
        .selectExpr("npi_num", "zip_cd", "'NYC' as city", "'NY' as state",
          "'XOLAIR' as brand", "yrmo", "call_p1", "call_p2", "call_p3",
          "calls", "lunch_n_learn_calls")
    calls(Seq(
      ("N1", "10001", 202203, "1", "0", "0", "2", "0"),
      ("N2", "10001", 202203, "0", "1", "0", "1", "0"),
      ("N3", "02101", 202204, "0", "0", "1", "1", "0"),
      (null, "02101", 202204, "1", "0", "0", "1", "0"), // dropped: null npi
      ("N1", "10001", 202301, "1", "0", "0", "1", "0")  // dropped: out of v1 range
    )).createOrReplaceTempView("nvs_calls_v1")
    calls(Seq(
      ("N1", "10001", 202209, "0", "0", "0", "1", "1"), // lunch → priority 1
      ("N4", "60601", 202210, "0", "0", "0", "1", "0")  // no priority → NULL
    )).createOrReplaceTempView("nvs_calls_v2")
    calls(Seq(("N2", "10001", 202305, "0", "1", "0", "1", "0")))
      .createOrReplaceTempView("nvs_calls_v3")
    calls(Seq(("N3", "02101", 202402, "1", "0", "0", "1", "0")))
      .createOrReplaceTempView("nvs_calls_v4")

    // A.2 MDM profile / A.3 HCP-org map
    Seq(("N1", "M1"), ("N2", "M2"), ("N3", "M3"), ("N4", "M4"))
      .toDF("npi_number", "mdm_id")
      .createOrReplaceTempView("mdm_profile")
    // mdm_zip lives on the org map: the reference selects hcp.mdm_zip (S1:118)
    Seq(("M1", Seq("XOLAIR", "OTHER"), "10001"), ("M2", Seq("XOLAIR"), "10002"),
        ("M3", Seq("XOLAIR"), "02101"), ("M4", Seq("OTHER"), "60601")) // M4 dropped: no XOLAIR
      .toDF("mdm_id", "product_brand_name", "mdm_zip")
      .createOrReplaceTempView("hcp_org_map")

    // A.5-A.8 DTC staging vintages (impressions/clicks arrive as strings)
    def media(view: String, rows: Seq[(Int, String, String, String, String)],
        dmaCol: String): Unit =
      rows.toDF("year_mth", dmaCol, "dma_code", "impressions", "clicks")
        .createOrReplaceTempView(view)
    media("dtc_display_v1", Seq(
      (202203, "r1", "500", "1000", "10"), (202203, "r1", "501", "3000", "30"),
      (202204, "r1", "500", "2000", "20"),
      (202203, "r1", "999", "7777", "70")), "dma_region") // dropped: unknown dma
    media("dtc_display_v2", Seq((202305, "r1", "500", "1500", "15")), "dma_region")
    media("dtc_display_v3", Seq((202401, "r1", "501", "800", "8")), "dma_region")
    media("dtc_search_v1", Seq(
      (202203, "NEW YORK", "500", "600", "6"), (202204, "BOSTON", "501", "400", "4")), "dma_name")
    media("dtc_search_v2", Seq((202305, "NEW YORK", "500", "900", "9")), "dma_name")
    media("dtc_search_v3", Seq((202401, "CHICAGO", "502", "700", "7")), "dma_name")
    Seq((202203, "NEW YORK", "500", "250"), (202305, "BOSTON", "501", "350"))
      .toDF("year_mth", "dma", "dma_code", "impressions")
      .createOrReplaceTempView("poc_v1")
    Seq((202301, "NEW YORK", "500", "450"))
      .toDF("year_mth", "dma", "dma_code", "impressions")
      .createOrReplaceTempView("poc_v2")
    Seq((202402, "NEW YORK", "500", "550"))
      .toDF("year_mth", "dma", "dma_code", "impressions")
      .createOrReplaceTempView("poc_v3")
    Seq(("500", "NEW YORK", 202203, "120", "12"), ("501", "BOSTON", 202204, "220", "22"))
      .toDF("dma_code", "dma_name", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("social_v1")
    Seq(("500", "NEW YORK", 202305, "320", "32"))
      .toDF("dma_code", "dma_name", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("social_v2")

    // A.9 HCP search
    Seq(("500", "2022-05-10", "80", "8"), ("501", "2022-05-20", "120", "12"),
        ("500", "2023-02-01", "999", "99")) // dropped: past cutoff
      .toDF("dma_code", "activity_date", "impressions", "clicks")
      .createOrReplaceTempView("hcp_search_v1")
    Seq(("500", 202303, "90", "9"))
      .toDF("dma_code", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("hcp_search_v2")
    Seq(("501", 202401, "110", "11"))
      .toDF("dma_code", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("hcp_search_v3")

    // A.10 wide costs (comma-formatted money strings)
    Seq(
      ("2022-03", "10,000.00", "5,000.00", "2,000.00", "1,000.00", "50,000.00"),
      ("2022-04", "20,000.00", "6,000.00", "3,000.00", "1,500.00", "60,000.00"),
      ("2022-05", "1,234.00", "2,345.00", "456.00", "789.00", "70,000.00"),
      ("2022-09", "900.00", "800.00", "700.00", "600.00", "40,000.00"),
      ("2022-10", "910.00", "810.00", "710.00", "610.00", "41,000.00"),
      ("2023-01", "920.00", "820.00", "720.00", "620.00", "42,000.00"),
      ("2023-02", "930.00", "830.00", "730.00", "630.00", "43,000.00"),
      ("2023-03", "940.00", "840.00", "740.00", "640.00", "44,000.00"),
      ("2023-05", "15,000.00", "7,000.00", "4,000.00", "2,000.00", "80,000.00"),
      ("2024-01", "99,999.00", "9,999.00", "999.00", "99.00", "90,000.00"))
      .toDF("date_month_", "dtc_display_", "dtc_search", "dtc_poc", "dtc_social", "npp")
      .createOrReplaceTempView("costs_wide")

    // A.11 unpivot costs (2024+; includes an HCP channel-month with cost but
    // no matching reach → exercises the missing-cost probe)
    Seq(
      (202401, "DTC", "Digital Display", 5000.0),
      (202401, "DTC", "Paid Search", 3000.0),
      (202401, "HCP", "Paid Search", 2500.0),
      (202401, "HCP", "Digital Display", 4000.0),
      (202401, "HCP", "Endemic Social", 1800.0),  // cost, no 202401 social reach
      (202401, "HCP", "Custom", 2200.0),
      (202402, "HCP", "Custom", 900.0),           // cost, no 202402 custom reach
      (202402, "HCP", "POC", 700.0),
      (202401, "HCP", "3rd Party Email", 600.0))
      .toDF("year_month", "audience", "channel", "cost")
      .createOrReplaceTempView("costs_unpivot")

    // A.12 HCP omni weekly (long): one NULL zip (dropped), weeks bucketing
    // into different months, REACH + ENGAGEMENT rows
    Seq(
      ("EHR", 202205, "10001", "REACH", "100"),
      ("EHR", 202205, "10001", "ENGAGEMENT", "10"),
      ("DISPLAY", 202209, "10001", "REACH", "200"),
      ("VIDEO", 202212, "02101", "REACH", "300"),
      ("CUSTOM", 202212, "02101", "REACH", "150"),
      ("ENDEMIC_SOCIAL", 202240, "10001", "REACH", "250"),
      ("3RD_PARTY_EMAIL", 202240, "02101", "REACH", "180"),
      ("POC", 202252, "10001", "REACH", "120"),
      ("EHR", 202205, null, "REACH", "999"))  // dropped: null zip
      .toDF("channel", "yrwk", "zip_cd", "metric", "value")
      .createOrReplaceTempView("hcp_all_weekly")

    // A.13 HCP monthly (2024+) sources
    Seq(
      ("Digital Display", 500, 202401, 400.0, 40.0),
      ("EHR", 500, 202401, 350.0, 35.0),
      ("Video", 501, 202401, 260.0, 26.0),
      ("Custom", 501, 202401, 240.0, 24.0),
      ("3rd Party Email", 500, 202401, 150.0, 15.0))
      .toDF("ipmm_channel", "dma_code", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("hcp_all_new")
    Seq((500, 202402, 130.0))
      .toDF("dma_code", "year_mth", "impressions")
      .createOrReplaceTempView("hcp_poc_new")
    Seq((501, 202403, 170.0, 17.0))
      .toDF("dma_code", "year_mth", "impressions", "clicks")
      .createOrReplaceTempView("hcp_social_new")
  }
}
