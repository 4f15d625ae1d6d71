package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** Catalog part: q51-q83: scale ops, graph, retrieval, streaming twins.
  *
  * Split from the single QueryCatalog file for size; specs stay
  * package-private and the ordered aggregation lives in
  * [[QueryCatalog.all]]. */
private[graft] trait CatalogPart2 extends CatalogPart1 {

  private[graft] val q51 = QuerySpec(
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
  private[graft] val q52 = QuerySpec(
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
  private[graft] val q53 = QuerySpec(
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
  private[graft] val q54 = QuerySpec(
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
  private[graft] val q55 = QuerySpec(
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
  private[graft] val q56 = QuerySpec(
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
  private[graft] val q57 = QuerySpec(
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
  private[graft] val q58 = QuerySpec(
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
  private[graft] val q59 = QuerySpec(
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
  private[graft] def pageRankOracle(iters: Int): String = {
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
  private[graft] val q60 = QuerySpec(
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
  private[graft] val q61 = QuerySpec(
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
  private[graft] val q62 = QuerySpec(
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
  private[graft] val q63 = QuerySpec(
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
  private[graft] val q64 = QuerySpec(
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
  private[graft] val q65 = QuerySpec(
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
  private[graft] val q66 = QuerySpec(
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
  private[graft] val q67 = QuerySpec(
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
  private[graft] val q68 = {
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
  private[graft] val q69 = QuerySpec(
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
  private[graft] val q70 = QuerySpec(
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
  private[graft] val q71 = QuerySpec(
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
  private[graft] val q72 = QuerySpec(
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
  private[graft] val q73 = QuerySpec(
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
  private[graft] val q74 = QuerySpec(
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
  private[graft] val q75 = QuerySpec(
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
  private[graft] val q76 = QuerySpec(
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
  private[graft] val q77 = QuerySpec(
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
  private[graft] val q78 = QuerySpec(
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
  private[graft] val q79 = QuerySpec(
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
  private[graft] val q80 = QuerySpec(
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
  private[graft] val q81 = QuerySpec(
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
  private[graft] val q82 = QuerySpec(
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
  private[graft] val q83 = {
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
  private[graft] def cdcCtes(w: Int, d: Int): String =
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
}
