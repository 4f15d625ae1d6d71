package graft.operators

import org.apache.spark.sql.DataFrame
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
}
