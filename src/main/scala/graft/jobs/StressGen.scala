package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Volume-scaled synthetic staging tables (same shapes as the test fixtures,
  * ~2.8M rows total) for stress-running the reference pipeline — all
  * generated distributed from `spark.range`, no driver-side data. Row counts
  * scale with `factor` (1.0 ≈ 2.8M staging rows). */
object StressGen {

  def registerAll(s: SparkSession, factor: Double = 1.0): Unit = {
    import s.implicits._
    def n(base: Long): Long = math.max((base * factor).toLong, 1L)

    (0 until 200).map(i => (s"$i", s"DMA_$i", f"$i%05d"))
      .toDF("dma_code", "dma_name", "zip")
      .createOrReplaceTempView("demographics")

    def callsView(name: String, yrmoLo: Int, yrmoHi: Int, rows: Long): Unit =
      s.range(rows).select(
        concat(lit("N"), (col("id") % 200000).cast("string")).as("npi_num"),
        format_string("%05d", (col("id") % 90000).cast("int")).as("zip_cd"),
        lit("NYC").as("city"), lit("NY").as("state"), lit("XOLAIR").as("brand"),
        (lit(yrmoLo) + (col("id") % (yrmoHi - yrmoLo + 1)).cast("int")).as("yrmo"),
        when(col("id") % 3 === 0, "1").otherwise("0").as("call_p1"),
        when(col("id") % 3 === 1, "1").otherwise("0").as("call_p2"),
        when(col("id") % 3 === 2, "1").otherwise("0").as("call_p3"),
        lit("1").as("calls"), lit("0").as("lunch_n_learn_calls")
      ).createOrReplaceTempView(name)
    callsView("nvs_calls_v1", 202201, 202206, n(250000))
    callsView("nvs_calls_v2", 202207, 202212, n(250000))
    callsView("nvs_calls_v3", 202301, 202312, n(250000))
    callsView("nvs_calls_v4", 202401, 202406, n(250000))

    s.range(200000).select(
      concat(lit("N"), col("id").cast("string")).as("npi_number"),
      concat(lit("M"), col("id").cast("string")).as("mdm_id")
    ).createOrReplaceTempView("mdm_profile")
    s.range(200000).select(
      concat(lit("M"), col("id").cast("string")).as("mdm_id"),
      when(col("id") % 10 === 0, array(lit("OTHER")))
        .otherwise(array(lit("XOLAIR"), lit("OTHER"))).as("product_brand_name"),
      format_string("%05d", (col("id") % 90000).cast("int")).as("mdm_zip")
    ).createOrReplaceTempView("hcp_org_map")

    def mediaView(name: String, dmaCol: String, lo: Int, hi: Int, rows: Long): Unit =
      s.range(rows).select(
        (lit(lo) + (col("id") % (hi - lo + 1)).cast("int")).as("year_mth"),
        concat(lit("DMA_"), (col("id") % 200).cast("string")).as(dmaCol),
        (col("id") % 200).cast("string").as("dma_code"),
        ((col("id") % 1000) + 1).cast("string").as("impressions"),
        ((col("id") % 100) + 1).cast("string").as("clicks")
      ).createOrReplaceTempView(name)
    mediaView("dtc_display_v1", "dma_region", 202201, 202212, n(300000))
    mediaView("dtc_display_v2", "dma_region", 202301, 202312, n(300000))
    mediaView("dtc_display_v3", "dma_region", 202401, 202406, n(300000))
    mediaView("dtc_search_v1", "dma_name", 202201, 202212, n(100000))
    mediaView("dtc_search_v2", "dma_name", 202301, 202312, n(100000))
    mediaView("dtc_search_v3", "dma_name", 202401, 202406, n(100000))

    def pocView(name: String, lo: Int, hi: Int, rows: Long): Unit =
      s.range(rows).select(
        (lit(lo) + (col("id") % (hi - lo + 1)).cast("int")).as("year_mth"),
        concat(lit("DMA_"), (col("id") % 200).cast("string")).as("dma"),
        (col("id") % 200).cast("string").as("dma_code"),
        ((col("id") % 500) + 1).cast("string").as("impressions")
      ).createOrReplaceTempView(name)
    pocView("poc_v1", 202201, 202212, n(100000))
    pocView("poc_v2", 202301, 202312, n(50000))
    pocView("poc_v3", 202401, 202406, n(50000))

    def socialView(name: String, lo: Int, hi: Int, rows: Long): Unit =
      s.range(rows).select(
        (col("id") % 200).cast("string").as("dma_code"),
        concat(lit("DMA_"), (col("id") % 200).cast("string")).as("dma_name"),
        (lit(lo) + (col("id") % (hi - lo + 1)).cast("int")).as("year_mth"),
        ((col("id") % 800) + 1).cast("string").as("impressions"),
        ((col("id") % 80) + 1).cast("string").as("clicks")
      ).createOrReplaceTempView(name)
    socialView("social_v1", 202201, 202212, n(100000))
    socialView("social_v2", 202301, 202406, n(100000))

    s.range(n(100000)).select(
      (col("id") % 200).cast("string").as("dma_code"),
      date_format(date_add(lit("2022-01-01").cast("date"),
        (col("id") % 330).cast("int")), "yyyy-MM-dd").as("activity_date"),
      ((col("id") % 600) + 1).cast("string").as("impressions"),
      ((col("id") % 60) + 1).cast("string").as("clicks")
    ).createOrReplaceTempView("hcp_search_v1")
    socialView("hcp_search_v2_base", 202301, 202312, n(100000))
    s.sql("select dma_code, year_mth, impressions, clicks from hcp_search_v2_base")
      .createOrReplaceTempView("hcp_search_v2")
    socialView("hcp_search_v3_base", 202401, 202406, n(100000))
    s.sql("select dma_code, year_mth, impressions, clicks from hcp_search_v3_base")
      .createOrReplaceTempView("hcp_search_v3")

    val months = (0 until 24).map { i =>
      val y = 2022 + i / 12; val m = i % 12 + 1; f"$y-$m%02d"
    }
    months.map(m => (m, "10,000.00", "5,000.00", "2,000.00", "1,500.00", "50,000.00"))
      .toDF("date_month_", "dtc_display_", "dtc_search", "dtc_poc", "dtc_social", "npp")
      .createOrReplaceTempView("costs_wide")
    val chans = Seq("Digital Display", "Paid Search", "POC", "Endemic Social",
      "Custom", "3rd Party Email", "EHR")
    (for { ym <- 202401 to 202406; a <- Seq("DTC", "HCP"); c <- chans }
      yield (ym, a, c, 3000.0)).toDF("year_month", "audience", "channel", "cost")
      .createOrReplaceTempView("costs_unpivot")

    s.range(n(500000)).select(
      element_at(array(lit("EHR"), lit("DISPLAY"), lit("VIDEO"), lit("CUSTOM"),
        lit("ENDEMIC_SOCIAL"), lit("3RD_PARTY_EMAIL"), lit("POC")),
        ((col("id") % 7) + 1).cast("int")).as("channel"),
      (lit(202201) + (col("id") % 52).cast("int")).as("yrwk"),
      format_string("%05d", (col("id") % 90000).cast("int")).as("zip_cd"),
      when(col("id") % 4 === 0, "ENGAGEMENT").otherwise("REACH").as("metric"),
      ((col("id") % 900) + 1).cast("string").as("value")
    ).createOrReplaceTempView("hcp_all_weekly")

    s.range(n(100000)).select(
      element_at(array(lit("Digital Display"), lit("EHR"), lit("Video"), lit("Custom"),
        lit("3rd Party Email")), ((col("id") % 5) + 1).cast("int")).as("ipmm_channel"),
      (col("id") % 200).cast("int").as("dma_code"),
      (lit(202401) + (col("id") % 6).cast("int")).as("year_mth"),
      ((col("id") % 700) + 1).cast("double").as("impressions"),
      ((col("id") % 70) + 1).cast("double").as("clicks")
    ).createOrReplaceTempView("hcp_all_new")
    s.range(n(50000)).select(
      (col("id") % 200).cast("int").as("dma_code"),
      (lit(202401) + (col("id") % 6).cast("int")).as("year_mth"),
      ((col("id") % 400) + 1).cast("double").as("impressions")
    ).createOrReplaceTempView("hcp_poc_new")
    s.range(n(50000)).select(
      (col("id") % 200).cast("int").as("dma_code"),
      (lit(202401) + (col("id") % 6).cast("int")).as("year_mth"),
      ((col("id") % 400) + 1).cast("double").as("impressions"),
      ((col("id") % 40) + 1).cast("double").as("clicks")
    ).createOrReplaceTempView("hcp_social_new")
  }
}

/** `runMain graft.jobs.StressMain [factor]` — times each pipeline stage on
  * the volume fixtures and the full job run.
  * `runMain graft.jobs.StressMain curation [replicas]` — times the composed
  * CurationJob on a duplication-heavy replica corpus of the sf0.1 documents.
  * `runMain graft.jobs.StressMain graph [nodes]` — connected components on a
  * generated chain-heavy graph (the worst case for per-hop propagation).
  * `runMain graft.jobs.StressMain asof [factor]` — as-of join on replicated
  * event volume.
  * `runMain graft.jobs.StressMain pagerank [nodes] [iters]` — fixed-iteration
  * PageRank on the same chain-heavy graph shape as `graph` mode. */
object StressMain {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.local(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    if (args.headOption.contains("curation")) {
      val replicas = args.lift(1).map(_.toInt).getOrElse(100)
      val transitive = args.lift(2).contains("transitive")
      val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val big = docs.crossJoin(s.range(replicas).select(col("id").as("rep")))
        .select(
          (col("rep") * 5000 + col("doc_id")).as("doc_id"),
          when(col("rep") % 5 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" variant"),
              (col("rep") % 5).cast("string"))).as("text"),
          col("lang"))
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize ${replicas}x docs")(big.count())
      var stats: CurationJob.Stats = null
      time(s"CurationJob end-to-end (transitive=$transitive)")({
        val (_, st) = CurationJob.run(big, CurationJob.Config(
          minQuality = 0.3, samplePermille = 500, transitive = transitive))
        stats = st; st.sampled
      })
      println(s"STRESS funnel: $stats")
    } else if (args.headOption.contains("graph")) {
      // Chain-heavy graph: diameter ~chainLen inside every cluster — per-hop
      // label propagation would need ~chainLen Spark rounds; the union-find
      // rounds depend only on how many partitions a cluster spans.
      val nodes = args.lift(1).map(_.toLong).getOrElse(5000000L)
      val chainLen = 1000L
      import graft.operators.Components
      val chains = s.range(nodes)
        .where(col("id") % chainLen =!= chainLen - 1) // no edge across chains
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val cross = s.range(nodes / 10).select( // deterministic long-range edges
        ((col("id") * 7919L) % nodes).as("a"),
        ((col("id") * 104729L + 13L) % nodes).as("b"))
      val edges = chains.union(cross).repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize edges ($nodes nodes, chains of $chainLen)")(edges.count())
      var comps: org.apache.spark.sql.DataFrame = null
      time("connectedComponents")({
        comps = Components.connectedComponents(edges, "a", "b", verbose = true)
        comps.count()
      })
      time("distinct components")(comps.select("comp").distinct().count())
    } else if (args.headOption.contains("pagerank")) {
      // same graph shape as `graph` mode, both directions (undirected)
      val nodes = args.lift(1).map(_.toLong).getOrElse(5000000L)
      val iters = args.lift(2).map(_.toInt).getOrElse(5)
      val chainLen = 1000L
      import graft.operators.Components
      val chains = s.range(nodes)
        .where(col("id") % chainLen =!= chainLen - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val cross = s.range(nodes / 10).select(
        ((col("id") * 7919L) % nodes).as("a"),
        ((col("id") * 104729L + 13L) % nodes).as("b"))
      val dir = chains.union(cross).where(col("a") =!= col("b"))
      val edges = dir.union(dir.select(col("b"), col("a"))).repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize undirected edges ($nodes nodes)")(edges.count())
      time(s"pageRank $iters iters")({
        val r = Components.pageRank(edges, "a", "b", iters = iters)
        r.count()
      })
      graft.core.CacheScope.drain()
    } else if (args.headOption.contains("boiler")) {
      // corpus-boilerplate stripping at volume: a third of the replicated
      // docs carry a shared 16-word chrome prefix (2 hot segments each)
      val replicas = args.lift(1).map(_.toInt).getOrElse(100)
      import graft.operators.Dedup
      val chrome = "subscribe to our newsletter follow us on social media " +
        "copyright twenty twenty four all rights reserved"
      val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val big = docs.crossJoin(s.range(replicas).select(col("id").as("rep")))
        .select((col("rep") * 5000 + col("doc_id")).as("doc_id"),
          when(col("rep") % 3 === 0, concat(lit(chrome + " "), col("text")))
            .otherwise(col("text")).as("text"))
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize ${replicas}x docs")(big.count())
      time("boilerplateStrip")({
        val out = Dedup.boilerplateStrip(big, "doc_id", "text")
        val agg = out.agg(count(lit(1)), sum("n_dropped")).head()
        println(s"STRESS dropped segment occurrences: ${agg.getLong(1)}")
        agg.getLong(0)
      })
      graft.core.CacheScope.drain()
    } else if (args.headOption.contains("semdedup")) {
      // SemDeDup at volume: pseudo-random positive vectors (in-cell random
      // cosine ≈ 0.75, identical even/odd pairs = exact dups at 1.0, so
      // threshold 0.99 separates cleanly); nlist ~ sqrt(n) keeps cells
      // task-sized — the n^1.5 pair bound that replaces all-pairs n^2
      val n = args.lift(1).map(_.toLong).getOrElse(200000L)
      val dims = 64
      import graft.operators.Similarity
      val vec = s.range(n)
        .select(col("id").as("vec_id"), (col("id") - col("id") % 2).as("seed"))
        .withColumn("embedding",
          // per-element hash scatter (NOT linear in d — a modular-linear
          // formula collides whole vectors for seeds equal mod the modulus)
          transform(sequence(lit(0), lit(dims - 1)),
            d => (pmod(xxhash64(col("seed"), d), lit(1000))
              .cast("double") / 1000.0).cast("float")))
        .select("vec_id", "embedding")
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize $n vectors x $dims")(vec.count())
      val nlist = math.max(16, math.sqrt(n.toDouble).toInt)
      // seed centroids (first nlist ids) cover a near-uniform cloud badly —
      // cell skew makes the in-cell pair count blow past the uniform
      // n²/nlist bound; `trained` swaps in k-means(‖) centroids
      // ([[Similarity.trainCentroids]]) to rebalance the cells, the exact
      // knob the operator documents for this failure mode
      val trained = args.lift(2).contains("trained")
      val cents =
        if (!trained) None
        else {
          var c: org.apache.spark.sql.DataFrame = null
          time(s"trainCentroids nlist=$nlist")({
            c = Similarity.trainCentroids(vec, nlist, iters = 2)
            c.count()
          })
          Some(c)
        }
      time(s"semanticDedup nlist=$nlist trained=$trained")({
        val out = Similarity.semanticDedup(vec, nlist, minCosine = 0.99,
          centroids = cents)
        val nDropped = out.where(!col("keep")).count()
        println(s"STRESS dropped near-dups: $nDropped (expect ~${n / 2})")
        nDropped
      })
      graft.core.CacheScope.drain()
    } else if (args.headOption.contains("asof")) {
      val factor = args.lift(1).map(_.toInt).getOrElse(100)
      import graft.operators.AsofJoin
      val ev = s.read.parquet("/root/testdata/sf0.1/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // replicate WIDE (new users per replica), the realistic scale axis
      val big = ev.crossJoin(s.range(factor).select(col("id").as("rep")))
        .select(col("event_id"), (col("user_id") + col("rep") * 1000000L).as("user_id"),
          col("ts"), col("event_type"), col("value"))
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"materialize ${factor}x events")(big.count())
      val clicks = big.where(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      val purchases = big.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      time("asof backward join")(
        AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts",
          Seq("click_value")).count())
    } else {
      val factor = args.headOption.map(_.toDouble).getOrElse(1.0)
      StressGen.registerAll(s, factor)
      time("tam_ce")(NvsPipeline.tamCe(s).count())
      time("dtc_display")(NvsPipeline.dtcDisplay(s).count())
      time("hcp_all_channels")(NvsPipeline.hcpAllChannels(s).count())
      time("combined")(NvsPipeline.combined(s).count())
      val dir = java.nio.file.Files.createTempDirectory("graft_stress").toString
      time("ChannelJobs.run")(
        ChannelJobs.run(s, ChannelJobs.JobConfig(outDir = dir)).map(_.rows).sum)
    }
    s.stop()
  }
}
