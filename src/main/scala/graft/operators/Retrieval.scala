package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the keyword-side complement of
  * [[Similarity]]'s embedding ANN. Data-curation pipelines use this shape
  * constantly: "pull the top-k documents matching this term set" for eval-set
  * construction, targeted decontamination sweeps, and quality-probe sampling.
  *
  * Greenfield extension (the reference has no retrieval surface; its nearest
  * analog is the LIKE-predicate channel filters, SURVEY §2.3 P-8).
  */
object Retrieval {

  /** BM25 top-`k` documents for a bag-of-words query.
    *
    * Standard Okapi BM25 with the Lucene non-negative idf:
    * `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)`, doc length = token count,
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Scale shape — the inverted-index discipline, not a corpus scan per term:
    *   - per-doc term frequencies come from the fused
    *     [[graft.functions.TokenCounts]] expression and are filtered to the
    *     query's terms IN THE SCAN STAGE (`isin` on ≤|Q| literals after the
    *     explode, before any shuffle) — the postings that survive number
    *     O(docs containing a query term), not O(corpus tokens);
    *   - document-frequency and corpus stats (N, avgdl) are ≤|Q|-row and
    *     1-row aggregates, broadcast back; the corpus never shuffles;
    *   - per-term contributions are fixed to micro-units (`bigint`) BEFORE
    *     the per-doc sum, so the score is an order-free integer sum —
    *     deterministic under any partitioning, and bit-comparable across
    *     engines (float Σ would depend on aggregation order);
    *   - top-k is `orderBy.limit(k)` → TakeOrderedAndProject (per-partition
    *     heaps + driver merge of k·parts rows), never a global sort.
    *
    * Returns (id, score_micro, n_terms) — `score_micro` is the BM25 score in
    * millionths, `n_terms` how many distinct query terms the doc contains.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      "bm25TopK needs a non-empty, duplicate-free term list " +
        "(a repeated term would double-count its contribution)")
    // one scan: explode per-DISTINCT-token counts, keep query-term postings
    // + the doc length every posting needs (dl rides the narrow stage; docs
    // with no query term vanish here and never shuffle)
    val postings = graft.core.CacheScope.persist(
      df.select(col(idCol).as("id"),
          size(split(col(textCol), " ")).cast("long").as("dl"),
          explode(graft.functions.TokenCounts(col(textCol))).as("tc"))
        .where(col("tc.tok").isin(queryTerms: _*))
        .select(col("id"), col("dl"), col("tc.tok").as("tok"),
          col("tc.tf").as("tf")))
    // corpus stats: 1-row agg over the UNFILTERED corpus (N and avgdl count
    // every doc, matched or not) — broadcast, never joined by shuffle
    val stats = df.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col(textCol), " ")).cast("long")).as("avgdl"))
    // document frequency per query term: ≤|Q| rows
    val dfreq = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    bm25ScoreTail(postings, dfreq, stats, k, k1, b)
  }

  /** The shared BM25 scoring tail over an already-cut postings frame
    * (id, dl, tok, tf), its per-term document frequencies, and the 1-row
    * corpus stats — identical in [[bm25TopK]] (postings cut from a live
    * corpus scan) and [[bm25TopKIndexed]] (postings cut from the standing
    * bucketed index), so the two forms cannot drift. */
  private def bm25ScoreTail(postings: DataFrame, dfreq: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    val idf = log(((col("n_docs") - col("df")) + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val termScore = idf * ((col("tf") * lit(k1 + 1.0)) / denom)
    postings
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      // fix to micro-units per TERM: the per-doc Σ becomes exact integer math
      .withColumn("micro", round(termScore * lit(1e6), 0).cast("long"))
      .groupBy("id")
      .agg(sum("micro").as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("id"))
      .limit(k)
  }

  /** EVERY distinct (doc, token) posting of the corpus — (id, dl, tok,
    * tf) — the frame a standing inverted index warehouses. Narrow (one
    * scan, no shuffle); the index write pays the tok exchange once. */
  private def fullPostings(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("dl"),
        explode(graft.functions.TokenCounts(col(textCol))).as("tc"))
      .select(col("id"), col("dl"), col("tc.tok").as("tok"),
        col("tc.tf").as("tf"))

  /** [[bm25TopK]] over a STANDING bucketed postings index — the
    * q212/q214/q216/q219 warehousing pattern applied to the retrieval
    * family (round-16 verdict item 5): every [[bm25TopK]] call
    * re-tokenizes and re-explodes the whole corpus to cut its postings —
    * fine for one query batch, but a standing corpus answers MANY batches
    * (eval-set construction, decontamination sweeps, quality probes), and
    * that per-call corpus scan is the repeated cost. Here the full
    * inverted index ([[fullPostings]]) lands ONCE per corpus, bucketed +
    * sorted on `tok` ([[graft.operators.ScaleOps.ensureBucketed]]), and
    * the 1-row corpus stats land beside it
    * ([[graft.operators.ScaleOps.ensureTable]]); a query batch then
    *  - cuts postings with `tok IN (...)` — BUCKET-PRUNED: the scan reads
    *    only the ≤|Q| buckets that can hold a query term
    *    (SelectedBucketsCount in the plan), never the corpus index;
    *  - aggregates document frequency by `tok` EXCHANGE-FREE (the scan is
    *    already hash-distributed on tok by the bucket layout);
    *  - runs the shared [[bm25ScoreTail]]: broadcast dfreq/stats joins,
    *    one pair-grain exchange on id for the per-doc sum, TakeOrdered.
    * Per-query cost is O(postings of matched terms), not O(corpus
    * tokens). Output identical to [[bm25TopK]] (same oracle). */
  def bm25TopKIndexed(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      postingsTable: String, statsTable: String, buckets: Int = 32,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      "bm25TopKIndexed needs a non-empty, duplicate-free term list")
    val postings = graft.operators.ScaleOps.ensureBucketed(
      fullPostings(df, idCol, textCol), postingsTable, buckets, Seq("tok"))
    val stats = graft.operators.ScaleOps.ensureTable(
      df.agg(count(lit(1)).as("n_docs"),
        avg(size(split(col(textCol), " ")).cast("long")).as("avgdl")),
      statsTable)
    // two bucket-pruned scans (dfreq + scoring) beat caching here: a
    // persist would pin the cut in memory per query batch for no reuse
    // beyond these two consumers, and each scan touches only the ≤|Q|
    // pruned buckets
    val cut = postings.where(col("tok").isin(queryTerms: _*))
    val dfreq = cut.groupBy("tok").agg(count(lit(1)).as("df"))
    bm25ScoreTail(cut, dfreq, stats, k, k1, b)
  }

  /** [[coordinateTopK]] over the same standing postings index as
    * [[bm25TopKIndexed]] (shared table name — one index serves the whole
    * lexical family). Identical output to [[coordinateTopK]]. */
  def coordinateTopKIndexed(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      postingsTable: String, buckets: Int = 32): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      "coordinateTopKIndexed needs a non-empty, duplicate-free term list")
    val postings = graft.operators.ScaleOps.ensureBucketed(
      fullPostings(df, idCol, textCol), postingsTable, buckets, Seq("tok"))
    val ord = Seq(col("n_match").desc, col("dl"), col("id"))
    postings.where(col("tok").isin(queryTerms: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_match"), first(col("dl")).as("dl"))
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy(ord: _*)))
  }

  /** Coordinate-match (boolean-coordination) top-`k`: rank documents by how
    * many DISTINCT query terms they contain, shorter documents first among
    * ties — the all-integer second opinion next to [[bm25TopK]] (no idf, no
    * length smoothing; exactly what [[rrfFuse]] wants as a diverse lens).
    * Same scan-stage postings cut as BM25; returns (id, n_match, dl, rank)
    * with rank dense from 1 by (n_match desc, dl asc, id). */
  def coordinateTopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct.size == queryTerms.size,
      "coordinateTopK needs a non-empty, duplicate-free term list")
    val ord = Seq(col("n_match").desc, col("dl"), col("id"))
    df.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("dl"),
        explode(graft.functions.TokenCounts(col(textCol))).as("tc"))
      .where(col("tc.tok").isin(queryTerms: _*))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_match"), first(col("dl")).as("dl"))
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy(ord: _*)))
  }

  /** Rank-agreement diagnostic between two top-k rankings of the same id
    * space — overlap, Jaccard, and truncated rank-biased overlap (RBO;
    * Webber et al., TOIS 2010) at each requested depth. This is the
    * measurement that justifies (or refutes) hybrid fusion: [[rrfFuse]]
    * only buys recall when its input rankers DISAGREE, and "how much they
    * agree, weighted toward the top" is exactly RBO. Persistence is fixed
    * at p = 1/2 so every rank weight 2^(1-d) and every normalizer
    * 2^(d-1)/(2^d - 1) is an EXACT binary double via integer shifts — no
    * pow(), so both engines produce bit-identical curves (depths are
    * capped at 62 to keep the shifts in int64).
    *
    * Scale shape: inputs are already top-k cuts, so everything here —
    * the full outer id join, the depth-grid cross join, the cumulative
    * RBO fold over the ≤62-row grid — is bounded by maxDepth, never
    * corpus-sized.
    *
    * Inputs need (id, rank); returns one row per depth:
    * (depth, a_n, b_n, inter, jaccard, rbo), ratios rounded 6dp. */
  def rankAgreement(a: DataFrame, b: DataFrame,
      depths: Seq[Int]): DataFrame = {
    require(depths.nonEmpty && depths.forall(d => d >= 1 && d <= 62),
      "depths must be in [1, 62] (exact power-of-two RBO weights)")
    val maxD = depths.max.toLong
    val ar = a.select(col("id"), col("rank").cast("long").as("ra"))
      .where(col("ra") <= maxD)
    val br = b.select(col("id"), col("rank").cast("long").as("rb"))
      .where(col("rb") <= maxD)
    val j = ar.join(br, Seq("id"), "full")
    val grid = a.sparkSession.range(1, maxD + 1).select(col("id").as("d"))
    val per = grid.join(j, lit(true), "left")
      .groupBy(col("d"))
      .agg(
        count(when(col("ra") <= col("d"), 1)).as("a_n"),
        count(when(col("rb") <= col("d"), 1)).as("b_n"),
        count(when(col("ra") <= col("d") && col("rb") <= col("d"), 1))
          .as("inter"))
    // truncated normalized RBO@d = Σ_{i<=d} 2^(1-i)·X_i/i · 2^(d-1)/(2^d−1):
    // term and normalizer are exact binary doubles; the cumulative fold
    // runs ascending over the bounded grid
    val pow2dm1 = expr("cast(shiftleft(1L, cast(d as int) - 1) as double)")
    val term = (col("inter").cast("double") / col("d")) / pow2dm1
    val cum = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
      .orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val norm = pow2dm1 /
      expr("cast(shiftleft(1L, cast(d as int)) - 1 as double)")
    val unionSz = col("a_n") + col("b_n") - col("inter")
    per.withColumn("rbosum", sum(term).over(cum))
      .where(col("d").isin(depths.map(_.toLong): _*))
      .select(col("d").as("depth"), col("a_n"), col("b_n"), col("inter"),
        round(when(unionSz === 0, lit(0.0))
          .otherwise(col("inter").cast("double") / unionSz), 6).as("jaccard"),
        round(col("rbosum") * norm, 6).as("rbo"))
  }

  /** Reciprocal-rank fusion of N rankings of the same id space: per doc,
    * `rrf_micro = Σ_lists 1e6 div (kRrf + rank)` — the standard hybrid-
    * retrieval combiner (BM25 ⊕ coordinate match ⊕ ANN …), all integer
    * division so the fused score is an order-free exact long. Each input
    * needs (id, rank); docs absent from a list simply contribute nothing.
    * Returns the top `k` by (rrf_micro desc, id) with (n_lists, rnk).
    *
    * Scale shape: inputs are already top-k' cuts (bounded), so the union,
    * the id-keyed aggregate, and the final TakeOrdered all run over
    * O(N·k') rows — never the corpus. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && kRrf >= 0, "bad rrfFuse args")
    val ord = Seq(col("rrf_micro").desc, col("id"))
    rankings.map(_.select(col("id"), col("rank")))
      .reduce(_ unionAll _)
      .withColumn("micro", expr(s"1000000L div (${kRrf}L + rank)"))
      .groupBy(col("id"))
      .agg(sum(col("micro")).as("rrf_micro"), count(lit(1)).as("n_lists"))
      .orderBy(ord: _*)
      .limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(lit(0)).orderBy(ord: _*)).cast("long"))
  }

  /** Discount weight for nDCG rank i (1-based): 1/log2(i+1) in micro,
    * rounded half-up once in Scala — the SAME constants are injected into
    * the oracle SQL, so the discounted sums are exact integer products on
    * both engines. */
  private[graft] def dcgWeightsMicro(k: Int): Seq[Long] =
    (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** Batch retrieval quality eval — MRR and nDCG@k per query against a
    * graded term-frequency relevance standard: a doc's gain for query q is
    * its total occurrence count of q's terms, zeroed below `relMin` (so
    * "relevant" means genuinely about the terms, not brushing one once —
    * without the floor every BM25 hit is trivially relevant and MRR pins
    * at 1). The measurement that says whether q88/q137's ranker is
    * actually ordering well, per query, the way q174 says it for ANN
    * recall.
    *
    * Exact integers end to end: gains are int64 tf sums; rank discounts
    * are the shared [[dcgWeightsMicro]] constants; DCG/IDCG are
    * Σ gain·w_micro; nDCG and MRR are truncating integer micro divisions.
    *
    * Scale shape: ONE postings scan for ALL queries (union of term lists,
    * then a broadcast (qid, term) tag join — |Q|·|terms| rows, never
    * corpus-sized); per-query ranking and ideal ranking are two
    * qid-partitioned window ranks cut at k (parallel across queries);
    * every aggregate after the cut runs on ≤ |Q|·k rows. */
  def rankEval(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      relMin: Long = 2L): DataFrame = {
    require(queries.nonEmpty && k >= 1 && relMin >= 1, "bad rankEval args")
    require(queries.forall { case (_, ts) =>
      ts.nonEmpty && ts.distinct.size == ts.size }, "duplicate-free terms")
    val allTerms = queries.flatMap(_._2).distinct
    val postings = graft.core.CacheScope.persist(
      df.select(col(idCol).as("id"),
          size(split(col(textCol), " ")).cast("long").as("dl"),
          explode(graft.functions.TokenCounts(col(textCol))).as("tc"))
        .where(col("tc.tok").isin(allTerms: _*))
        .select(col("id"), col("dl"), col("tc.tok").as("tok"),
          col("tc.tf").as("tf")))
    val stats = df.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col(textCol), " ")).cast("long")).as("avgdl"))
    rankEvalTail(df.sparkSession, postings, stats, queries, k, relMin)
  }

  /** [[rankEval]] over the standing bucketed postings index + stats table
    * ([[bm25TopKIndexed]]'s layouts — one index serves the whole lexical
    * family): the per-call corpus tokenize/explode and the corpus-stats
    * scan are replaced by a bucket-pruned read of the ≤|terms| buckets
    * holding the union of all query terms. Identical output to
    * [[rankEval]] (shared [[rankEvalTail]]). */
  def rankEvalIndexed(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int,
      postingsTable: String, statsTable: String, buckets: Int = 32,
      relMin: Long = 2L): DataFrame = {
    require(queries.nonEmpty && k >= 1 && relMin >= 1, "bad rankEval args")
    require(queries.forall { case (_, ts) =>
      ts.nonEmpty && ts.distinct.size == ts.size }, "duplicate-free terms")
    val allTerms = queries.flatMap(_._2).distinct
    val index = graft.operators.ScaleOps.ensureBucketed(
      fullPostings(df, idCol, textCol), postingsTable, buckets, Seq("tok"))
    val stats = graft.operators.ScaleOps.ensureTable(
      df.agg(count(lit(1)).as("n_docs"),
        avg(size(split(col(textCol), " ")).cast("long")).as("avgdl")),
      statsTable)
    rankEvalTail(df.sparkSession,
      index.where(col("tok").isin(allTerms: _*)), stats, queries, k, relMin)
  }

  /** The shared scoring/eval tail of [[rankEval]] / [[rankEvalIndexed]]
    * over an already-cut postings frame and 1-row stats. */
  private def rankEvalTail(spark: org.apache.spark.sql.SparkSession,
      postings: DataFrame, stats: DataFrame,
      queries: Seq[(String, Seq[String])], k: Int,
      relMin: Long): DataFrame = {
    import spark.implicits._
    val dfreq = postings.groupBy("tok").agg(count(lit(1)).as("df"))
    val qterms = queries.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("qid", "tok")
    val (k1, b) = (1.2, 0.75)
    val idf = log(((col("n_docs") - col("df")) + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val scored = graft.core.CacheScope.persist(postings
      .join(broadcast(qterms), Seq("tok"))
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("micro",
        round(idf * ((col("tf") * lit(k1 + 1.0)) / denom) * lit(1e6), 0)
          .cast("long"))
      .groupBy("qid", "id")
      .agg(sum("micro").as("score_micro"), sum("tf").as("rel_raw"))
      .withColumn("gain",
        when(col("rel_raw") >= relMin, col("rel_raw")).otherwise(0L)))
    val weights = dcgWeightsMicro(k)
    val wArr = array(weights.map(lit): _*)
    val byScore = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("id"))
    val byGain = Window.partitionBy(col("qid"))
      .orderBy(col("gain").desc, col("id"))
    val ranked = scored.withColumn("rn", row_number().over(byScore))
      .where(col("rn") <= k)
    val dcg = ranked.groupBy("qid").agg(
      count(lit(1)).as("n_ranked"),
      sum(col("gain") * element_at(wArr, col("rn"))).as("dcg_micro"),
      min(when(col("gain") > 0, col("rn"))).as("first_rel_rank"))
    val ideal = scored.where(col("gain") > 0)
      .withColumn("rn", row_number().over(byGain))
      .where(col("rn") <= k)
      .groupBy("qid").agg(
        sum(col("gain") * element_at(wArr, col("rn"))).as("idcg_micro"))
    val nRel = scored.where(col("gain") > 0)
      .groupBy("qid").agg(count(lit(1)).as("n_rel"))
    dcg.join(ideal, Seq("qid"), "left").join(nRel, Seq("qid"), "left")
      .select(col("qid"), col("n_ranked"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("first_rel_rank"),
        coalesce(expr("1000000L div first_rel_rank"), lit(0L))
          .as("mrr_micro"),
        col("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) === 0L, 0L)
          .otherwise(expr("(dcg_micro * 1000000L) div idcg_micro"))
          .as("ndcg_micro"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily pick k of the top-`c` BM25 candidates, each step
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked —
    * the re-rank that stops "10 near-identical top hits" in few-shot
    * example selection and dedup-blind retrieval.
    *
    * Exact-integer semantics (cross-engine replayable):
    *   - relevance = BM25 `score_micro` normalized to micro-units of the
    *     candidate max: `rel_n = (score_micro·1e6) div max_score`;
    *   - pairwise similarity = Jaccard over DISTINCT whitespace tokens in
    *     micro: `(inter·1e6) div union`;
    *   - mmr = λ‰·rel_n − (1000−λ‰)·max_sim over picked (permille·micro
    *     int64s); seed pick = best rel_n; every tie breaks by id asc.
    *
    * Scale shape: the corpus-sized stages are [[bm25TopK]] (postings cut +
    * TakeOrdered) and one candidate-filtered token explode; the candidate
    * set is BOUNDED (c rows, c² pair frame — a designed bounded self-join,
    * same contract as the q179 grid), so the greedy fold runs on the
    * driver over ≤ c² collected rows (documented bounded collect) instead
    * of k chained bounded-frame joins.
    *
    * Sparse corpora: `c >= k` bounds the REQUEST, not the supply — when
    * fewer than k docs match any query term the greedy loop stops early
    * and returns however many candidates exist (possibly zero rows),
    * matching the oracle's LIMIT-step degradation. `idCol` must be an
    * integral column (the greedy fold keys and tie-breaks on int64 ids);
    * non-integral ids are rejected up front rather than silently nulled
    * by a cast. Returns one row per pick:
    * (sel_rank, id, score_micro, rel_n_micro, mmr_q). */
  def mmrTopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], c: Int, k: Int,
      lambdaPermille: Long = 700L): DataFrame = {
    require(c >= k && k >= 1, "need c >= k >= 1")
    require(lambdaPermille >= 0L && lambdaPermille <= 1000L, "lambda in [0,1000]")
    import org.apache.spark.sql.types._
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"mmrTopK requires an integral id column; '$idCol' is $other")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val cands = bm25TopK(df, idCol, textCol, queryTerms, c)
    val candToks = df.select(col(idCol).cast("long").as("id"),
        col(textCol).as("txt"))
      .join(cands.select(col("id").cast("long").as("id")), Seq("id"),
        "left_semi")
      .select(col("id"),
        explode(graft.functions.TokenCounts(col("txt"))).as("tc"))
      .select(col("id"), col("tc.tok").as("tok")) // distinct: one row/token
    val sizes = candToks.groupBy("id").agg(count(lit(1)).as("nt"))
    val a = candToks.select(col("id").as("ida"), col("tok"))
    val b = candToks.select(col("id").as("idb"), col("tok"))
    val pairs = a.join(b, Seq("tok")).where(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("ida"), col("nt").as("na")), Seq("ida"))
      .join(sizes.select(col("id").as("idb"), col("nt").as("nb")), Seq("idb"))
      .select(col("ida"), col("idb"),
        expr("(inter * 1000000L) div (na + nb - inter)").as("sim_micro"))
    // bounded collects: c candidate rows + <= c(c-1)/2 pair rows
    val cRows = cands.select(col("id").cast("long"), col("score_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (cRows.isEmpty) {
      // no doc matched any query term: same fewer-rows degradation as the
      // oracle's LIMIT CTEs (zero rows, full schema)
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("sel_rank", "id", "score_micro", "rel_n_micro", "mmr_q")
    }
    val sim = scala.collection.mutable.Map.empty[(Long, Long), Long]
    pairs.collect().foreach { r =>
      sim((r.getLong(0), r.getLong(1))) = r.getLong(2)
    }
    def simOf(x: Long, y: Long): Long =
      if (x == y) 1000000L
      else sim.getOrElse(if (x < y) (x, y) else (y, x), 0L)
    val maxScore = cRows.map(_._2).max
    val relN = cRows.map { case (id, s) =>
      id -> (if (maxScore <= 0L) 0L else s * 1000000L / maxScore)
    }.toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val remaining = scala.collection.mutable.SortedSet(cRows.map(_._1): _*)
    while (picked.size < k && remaining.nonEmpty) {
      val best = remaining.map { id =>
        val maxSim = if (picked.isEmpty) 0L
          else picked.map(p => simOf(id, p._1)).max
        val mmr = lambdaPermille * relN(id) - (1000L - lambdaPermille) * maxSim
        (id, mmr)
      }.minBy { case (id, mmr) => (-mmr, id) } // max mmr, ties id asc
      picked += best
      remaining -= best._1
    }
    val scoreOf = cRows.toMap
    picked.zipWithIndex.map { case ((id, mmr), i) =>
      ((i + 1).toLong, id, scoreOf(id), relN(id), mmr)
    }.toSeq.toDF("sel_rank", "id", "score_micro", "rel_n_micro", "mmr_q")
  }
}
