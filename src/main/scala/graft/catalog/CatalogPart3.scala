package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{ChannelOps, Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{Hashing, Vectors}

/** Catalog part: q84-q118, q120-q121: CDC, stats, NB classifier, quality gates.
  *
  * Split from the single QueryCatalog file for size; specs stay
  * package-private and the ordered aggregation lives in
  * [[QueryCatalog.all]]. */
private[graft] trait CatalogPart3 extends CatalogPart2 {

  private[graft] val q84 = QuerySpec(
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
  private[graft] val q85 = QuerySpec(
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
  private[graft] val q86 = QuerySpec(
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
  private[graft] val q87 = {
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
  private[graft] val q88 = {
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
  private[graft] val q89 = QuerySpec(
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
  private[graft] val q90 = QuerySpec(
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
  private[graft] val q91 = QuerySpec(
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
  private[graft] val q92 = {
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
  private[graft] val q93 = {
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
  private[graft] val q94 = QuerySpec(
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
  private[graft] val q95 = {
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
  private[graft] val q96 = QuerySpec(
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
  private[graft] val q97 = {
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
  private[graft] val q98 = {
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
  private[graft] val q99 = QuerySpec(
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
  private[graft] val q100 = QuerySpec(
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
  private[graft] val q101 = {
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
  private[graft] val q102 = QuerySpec(
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
  private[graft] val q103 = QuerySpec(
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
  private[graft] val q104 = QuerySpec(
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
  private[graft] val q105 = {
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
  private[graft] val q106 = QuerySpec(
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
  private[graft] val q107 = QuerySpec(
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
  private[graft] val q108 = QuerySpec(
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
  private[graft] val NbOracleCtes = """tk AS (SELECT doc_id AS id, lang AS label,
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
  private[graft] val q109 = QuerySpec(
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
  private[graft] val q110 = QuerySpec(
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
  private[graft] val q111 = {
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
  private[graft] val q112 = QuerySpec(
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
  private[graft] val q113 = QuerySpec(
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
  private[graft] val q114 = QuerySpec(
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
  private[graft] val q115 = QuerySpec(
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
  private[graft] val q116 = QuerySpec(
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
  private[graft] val q117 = QuerySpec(
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
  private[graft] val q118 = QuerySpec(
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
  private[graft] val q120 = QuerySpec(
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
  private[graft] val q121 = QuerySpec(
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
}
