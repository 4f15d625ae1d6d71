package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 must agree with a direct in-memory scorer on the real corpus, and
  * its plan must be the inverted-index shape (postings filtered before any
  * shuffle; stats broadcast; top-k a heap, not a global sort). */
class RetrievalSpec extends SparkSpec {

  private val terms = Seq("hash", "stream", "vector", "big")

  /** Plain-Scala BM25 over (id, text), micro-unit contract included. */
  private def brute(docs: Seq[(Long, String)], q: Seq[String], k: Int)
      : Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val dfm = q.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, tk) =>
      val dl = tk.size.toLong
      val micros = q.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0 || dfm(t) == 0) None
        else {
          val idf = math.log(((n - dfm(t)) + 0.5) / (dfm(t) + 0.5) + 1.0)
          val s = idf * ((tf * (1.2 + 1.0)) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.toDouble / avgdl))))
          Some(math.round(s * 1e6))
        }
      }
      if (micros.isEmpty) None
      else Some((id, micros.sum, micros.size.toLong))
    }
    scored.sortBy { case (id, s, _) => (-s, id) }.take(k)
  }

  test("matches the brute-force scorer on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val raw = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == brute(raw, terms, 25))
  }

  test("a term absent from the corpus contributes nothing; all-miss query is empty") {
    import spark.implicits._
    val df = Seq((1L, "hash join"), (2L, "sort merge")).toDF("id", "text")
    val withGhost = Retrieval.bm25TopK(df, "id", "text",
      Seq("hash", "zzz_never"), k = 10).collect()
    assert(withGhost.map(_.getLong(0)).toSeq == Seq(1L))
    assert(withGhost.head.getLong(2) == 1L) // ghost term not counted
    assert(Retrieval.bm25TopK(df, "id", "text", Seq("zzz"), k = 5).isEmpty)
  }

  test("duplicate query terms are rejected") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "id", "text", Seq("a", "a"), k = 1)
    }
  }

  test("plan: top-k is a TakeOrdered heap and the stats/df joins broadcast") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20)
    val out = new ByteArrayOutputStream()
    Console.withOut(out) { df.explain() }
    val p = out.toString
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
    assert(!p.contains("SortMergeJoin"), s"stats join shuffled the postings:\n$p")
    // the isin postings cut must sit under the explode, before any exchange
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"postings shuffled more than score-agg needs:\n$p")
  }

  test("coordinateTopK: distinct-term count ranks, shorter docs break ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash stream vector big extra words here"), // 4 terms, dl 7
      (2L, "hash stream vector big"),                  // 4 terms, dl 4
      (3L, "hash hash hash hash hash"),                // 1 term (distinct!)
      (4L, "nothing relevant at all"),                 // 0 → absent
      (5L, "big stream")                               // 2 terms, dl 2
    ).toDF("doc_id", "text")
    val got = Retrieval.coordinateTopK(docs, "doc_id", "text", terms, k = 10)
      .select("id", "n_match", "rank")
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(got == Seq((2L, 4L, 1), (1L, 4L, 2), (5L, 2L, 3), (3L, 1L, 4)))
  }

  test("rrfFuse: hand-computed fusion, absent-from-one-list docs included") {
    import spark.implicits._
    // list A: doc 1 rank 1, doc 2 rank 2; list B: doc 2 rank 1, doc 3 rank 2
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .select("id", "rrf_micro", "n_lists", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._4)
    val r1 = 1000000L / 61  // 16393
    val r2 = 1000000L / 62  // 16129
    // doc 2 fuses both lists (r2 + r1); docs 1 and 3 one list each, and the
    // doc-id tiebreak orders doc 1 before doc 3 at equal micro
    assert(got == Seq((2L, r1 + r2, 2L, 1L), (1L, r1, 1L, 2L),
      (3L, r2, 1L, 3L)))
  }

  test("rrfFuse promotes consensus: a doc mid-ranked in BOTH lists beats " +
      "a doc topping one list on the real corpus") {
    val docs = graft.core.EventTs.toNanos(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val bm = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 100)
      .withColumn("rank", row_number().over(
        wTop.orderBy(col("score_micro").desc, col("id"))))
      .select("id", "rank")
    val coord = Retrieval.coordinateTopK(docs, "doc_id", "text", terms, 100)
      .select("id", "rank")
    val fused = Retrieval.rrfFuse(Seq(bm, coord), k = 20).collect()
    assert(fused.length == 20)
    // every fused score is exactly the sum of its lists' reciprocal terms
    val bmR = bm.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val coR = coord.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      val want = bmR.get(id).map(x => 1000000L / (60 + x)).getOrElse(0L) +
        coR.get(id).map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(1) == want, s"doc $id")
      assert(r.getLong(2) == Seq(bmR.contains(id), coR.contains(id))
        .count(identity).toLong)
    }
  }

  test("rankAgreement: self-agreement is exactly 1, disjoint lists are 0") {
    def ranking(ids: Seq[Long]) = {
      import spark.implicits._
      ids.zipWithIndex.map { case (id, i) => (id, i + 1) }
        .toDF("id", "rank")
    }
    val a = ranking(1L to 20L)
    val self = Retrieval.rankAgreement(a, a, depths = Seq(5, 10, 20))
      .orderBy("depth").collect()
    // identical lists: every prefix coincides → jaccard = rbo = 1 exactly
    // (the p=1/2 weights and normalizers are exact binary doubles)
    assert(self.map(_.getDouble(4)).toSeq == Seq(1.0, 1.0, 1.0))
    assert(self.map(_.getDouble(5)).toSeq == Seq(1.0, 1.0, 1.0))
    assert(self.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((5L, 5L, 5L), (10L, 10L, 10L), (20L, 20L, 20L)))
    val disjoint = Retrieval
      .rankAgreement(a, ranking(100L to 119L), depths = Seq(10, 20))
      .orderBy("depth").collect()
    assert(disjoint.map(_.getDouble(4)).toSeq == Seq(0.0, 0.0))
    assert(disjoint.map(_.getDouble(5)).toSeq == Seq(0.0, 0.0))
    // partial agreement: first 10 shared then divergent — monotone sanity,
    // and RBO(top-weighted) must exceed plain Jaccard at full depth
    val half = Retrieval.rankAgreement(a,
      ranking((1L to 10L) ++ (200L to 209L)), depths = Seq(10, 20))
      .orderBy("depth").collect()
    assert(half.head.getDouble(4) == 1.0 && half.head.getDouble(5) == 1.0)
    val (j20, r20) = (half(1).getDouble(4), half(1).getDouble(5))
    assert(j20 < 1.0 && r20 < 1.0 && r20 > j20,
      s"top-weighted RBO $r20 should exceed Jaccard $j20 when the overlap is at the top")
  }

  // ------------------------------- standing postings index (round 17)

  private def idxTables = (
    graft.operators.ScaleOps.bucketTableName("graft_test_postings", sfDir),
    graft.operators.ScaleOps.bucketTableName("graft_test_docstats", sfDir))

  test("bm25TopKIndexed == bm25TopK on the real corpus (the standing " +
      "index changes the read path, never the ranking)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val live = canon(Retrieval.bm25TopK(docs, "doc_id", "text", terms, 25))
    val (pt, st) = idxTables
    val indexed = canon(Retrieval.bm25TopKIndexed(docs, "doc_id", "text",
      terms, 25, postingsTable = pt, statsTable = st))
    assert(indexed == live)
    assert(live.nonEmpty, "vacuous corpus: no term matched at all")
  }

  test("coordinateTopKIndexed == coordinateTopK over the same index") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    val live = canon(Retrieval.coordinateTopK(docs, "doc_id", "text",
      terms, 10))
    val (pt, _) = idxTables
    val indexed = canon(Retrieval.coordinateTopKIndexed(docs, "doc_id",
      "text", terms, 10, postingsTable = pt))
    assert(indexed == live)
    assert(live.nonEmpty)
  }

  test("rankEvalIndexed == rankEval over the same index") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val queries = Seq("qa" -> Seq("hash", "stream"),
      "qb" -> Seq("vector", "big"), "qc" -> Seq("data"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.orderBy("qid")
      .collect().map(_.toSeq).toSeq
    val live = canon(Retrieval.rankEval(docs, "doc_id", "text", queries,
      k = 10))
    graft.core.CacheScope.drain()
    val (pt, st) = idxTables
    val indexed = canon(Retrieval.rankEvalIndexed(docs, "doc_id", "text",
      queries, k = 10, postingsTable = pt, statsTable = st))
    assert(indexed == live)
    assert(live.nonEmpty)
  }
}
