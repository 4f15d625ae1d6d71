package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-11 tail operators, second wave: Heaps'-law vocab growth, the
  * distributed Pareto frontier, the Markov stationary distribution, MMR
  * diversified retrieval, the embedding-dimension audit, and tokenizer
  * fertility. */
class Round11TailOpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- vocabGrowth

  test("vocabGrowth: hand-computed prefix curve") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d d")).toDF("id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "id", "text", Seq(1L, 2L, 3L))
      .orderBy("cut_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (1L, 1L, 2L, 2L),   // {a b}
      (2L, 2L, 4L, 3L),   // + {b c} → types {a b c}
      (3L, 3L, 7L, 4L)))  // + {a d d} → types {a b c d}
  }

  test("vocabGrowth: all three series are monotone non-decreasing") {
    val docs = (0 until 60)
      .map(i => (i.toLong, s"tok${i % 11} tok${i % 7} tok${i % 23}"))
      .toDF("id", "text")
    val out = TextAnalysis.vocabGrowth(docs, "id", "text",
        Seq(5L, 10L, 20L, 40L, 59L, 1000L))
      .orderBy("cut_id").collect()
    Seq(1, 2, 3).foreach { c =>
      val series = out.map(_.getLong(c)).toSeq
      assert(series === series.sorted, s"column $c not monotone: $series")
    }
    // a cut past max id saturates at the full corpus
    assert(out.last.getLong(1) === 60L)
    assert(out.last.getLong(3) === out.map(_.getLong(3)).max)
  }

  // ------------------------------------------------------ paretoFrontier

  private def bruteSkyline(pts: Seq[(Long, Long, Long)]) =
    pts.filterNot { case (_, q, t) =>
      pts.exists { case (_, q2, t2) =>
        q2 >= q && t2 <= t && (q2 > q || t2 < t)
      }
    }.map { case (id, q, t) => (id, q, t) }.sortBy(p => (p._3, p._2, p._1))

  test("paretoFrontier equals the brute-force dominance filter") {
    val pts = (0 until 200).map { i =>
      (i.toLong, ((i * 37) % 91).toLong, ((i * 53) % 77).toLong)
    }
    val got = ScaleOps.paretoFrontier(
        pts.toDF("id", "q", "t"), "id", col("q"), col("t"), numBuckets = 8)
      .orderBy("min_v", "max_v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === bruteSkyline(pts))
  }

  test("paretoFrontier: coincident points are mutually kept; bucket count" +
      " does not change the answer") {
    val pts = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 9L, 5L), (4L, 11L, 9L))
    val expect = bruteSkyline(pts)
    Seq(1, 3, 64).foreach { b =>
      val got = ScaleOps.paretoFrontier(
          pts.toDF("id", "q", "t"), "id", col("q"), col("t"), b)
        .orderBy("min_v", "max_v", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expect, s"numBuckets=$b")
    }
    // both duplicates of the (10,5) point survive; (9,5) is dominated
    assert(expect.map(_._1).toSet === Set(1L, 2L, 4L))
  }

  // ---------------------------------------------- stationaryDistribution

  test("stationaryDistribution: a two-state cycle settles at 50/50") {
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "A"))
      .toDF("user_id", "ts", "event_type")
    val out = EventOps.stationaryDistribution(ev, "user_id", Seq("ts"),
        "event_type", rounds = 8)
      .orderBy("event_type").collect()
    // P is the exact swap matrix, so uniform is stationary: 500000 each
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("A", 500000L), ("B", 500000L)))
  }

  test("stationaryDistribution: empty event stream yields an empty pi") {
    val ev = Seq.empty[(Long, Long, String)]
      .toDF("user_id", "ts", "event_type")
    val out = EventOps.stationaryDistribution(ev, "user_id", Seq("ts"),
      "event_type", rounds = 4)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("event_type", "pi_micro"))
  }

  test("stationaryDistribution: mass drains into an absorbing sink") {
    // A always moves to B; B only ever ends sequences → B self-loops
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("user_id", "ts", "event_type")
    val out = EventOps.stationaryDistribution(ev, "user_id", Seq("ts"),
        "event_type", rounds = 8)
      .orderBy("event_type").collect()
    val pi = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pi("A") === 0L)
    // B holds everything it ever receives (floor dust only)
    assert(pi("B") >= 999998L && pi("B") <= 1000000L)
  }

  // ------------------------------------------------------------ mmrTopK

  test("mmrTopK: lambda=1000 is pure relevance order") {
    val docs = (0 until 30)
      .map(i => (i.toLong, if (i < 5) "hash stream vector big" else "filler text"))
      .toDF("doc_id", "text")
    val terms = Seq("hash", "stream", "vector", "big")
    val pure = Retrieval.bm25TopK(docs, "doc_id", "text", terms, 5)
      .orderBy(col("score_micro").desc, col("id")).collect()
      .map(_.getLong(0)).toSeq
    val mmr = Retrieval.mmrTopK(docs, "doc_id", "text", terms,
        c = 10, k = 5, lambdaPermille = 1000L)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
    assert(mmr === pure)
  }

  test("mmrTopK: sparse corpus returns fewer than k rows, empty match " +
      "returns zero rows (no crash)") {
    val docs = Seq(
      (1L, "hash stream alpha"),
      (2L, "filler text"),
      (3L, "more filler")).toDF("doc_id", "text")
    // only doc 1 matches → 1 row despite k = 3
    val sparse = Retrieval.mmrTopK(docs, "doc_id", "text",
      Seq("hash", "stream"), c = 5, k = 3).collect()
    assert(sparse.map(_.getLong(1)).toSeq === Seq(1L))
    // nothing matches → 0 rows, schema intact
    val none = Retrieval.mmrTopK(docs, "doc_id", "text",
      Seq("zzz"), c = 5, k = 3)
    assert(none.count() === 0L)
    assert(none.columns.toSeq ===
      Seq("sel_rank", "id", "score_micro", "rel_n_micro", "mmr_q"))
  }

  test("mmrTopK: rejects a non-integral id column up front") {
    val docs = Seq(("a", "hash stream")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.mmrTopK(docs, "doc_id", "text", Seq("hash"), c = 2, k = 1)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("mmrTopK: diversity beats a near-duplicate runner-up") {
    // docs 1/2 are identical high-rel twins; doc 3 matches fewer terms but
    // shares no tokens with them — a diversifying λ must pick it second
    val docs = Seq(
      (1L, "hash stream vector big alpha"),
      (2L, "hash stream vector big alpha"),
      (3L, "vector beta gamma delta"),
      (4L, "unrelated filler words here")).toDF("doc_id", "text")
    val terms = Seq("hash", "stream", "vector", "big")
    val picks = Retrieval.mmrTopK(docs, "doc_id", "text", terms,
        c = 3, k = 3, lambdaPermille = 500L)
      .orderBy("sel_rank").collect().map(_.getLong(1)).toSeq
    assert(picks.head === 1L)       // ties (1,2) break by id
    assert(picks(1) === 3L)         // the twin is suppressed
    assert(picks(2) === 2L)
    // ranks are 1..k over distinct ids
    assert(picks.distinct.length === 3)
  }

  // ----------------------------------------------------- embeddingAudit

  test("embeddingAudit: hand-computed per-dim stats") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, -0.5f)),
      (2L, Array(1.0f, 0.0f, 0.5f))).toDF("id", "v")
    val out = Similarity.embeddingAudit(vecs, "v").orderBy("dim").collect()
    val byDim = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byDim(0L) === ((2L, 1000000L, 0L, 0L)))      // constant 1.0
    assert(byDim(1L) === ((2L, 0L, 0L, 1000000L)))      // dead + all-zero
    // dim 2: mean 0, var = 0.25 exactly in micro
    assert(byDim(2L) === ((2L, 0L, 250000L, 0L)))
  }

  // ------------------------------------------------- tokenizerFertility

  test("tokenizerFertility: plain words cost 1.0; punctuation costs more") {
    val docs = Seq(
      ("en", "plain simple words only"),
      ("xx", "e-mail co-op (a) b.c!")).toDF("lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs, "text", col("lang"))
      .orderBy("lang").collect()
    val en = out.find(_.getString(0) == "en").get
    assert(en.getAs[Long]("fertility_micro") === 1000000L)
    val xx = out.find(_.getString(0) == "xx").get
    assert(xx.getAs[Long]("fertility_micro") > 1000000L)
    assert(xx.getAs[Long]("ws_tokens") === 4L)
  }
}
