package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-11 trust/eval wave: split-conformal prediction sets, per-class
  * classifier report, retrieval rank eval (MRR/nDCG), l-diversity audit,
  * Fano-factor burstiness. */
class TrustEvalOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- conformalSets

  /** Perfectly symmetric two-class corpus: every doc's margin is the same
    * integer, so the calibration quantile equals every eval nonconformity
    * and the guarantee saturates. */
  private def symmetricDocs = (0 until 40).map { i =>
    if (i % 4 < 2) (i.toLong, "aa aa", "A") else (i.toLong, "bb bb", "B")
  }.toDF("doc_id", "text", "lab")
  // doc_id % 2 == 0 → calibration; the %4 layout puts both classes in
  // both halves

  test("conformalSets: symmetric corpus covers fully with singleton sets") {
    val out = TextAnalysis.conformalSets(symmetricDocs, "doc_id", "text",
        "lab", Seq(100L, 500L), _ % 2 === 0)
      .orderBy("alpha_permille").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("coverage_micro") === 1000000L)
      assert(r.getAs[Long]("avg_set_size_micro") === 1000000L)
      assert(r.getAs[Long]("n_cal") === 20L)
      assert(r.getAs[Long]("n_eval") === 20L)
    }
  }

  test("conformalSets: alpha=0 forces k > n_cal, the full-alphabet set") {
    val out = TextAnalysis.conformalSets(symmetricDocs, "doc_id", "text",
        "lab", Seq(0L), _ % 2 === 0)
      .collect()
    val r = out.head
    assert(r.getAs[Long]("k_rank") === 21L)     // (20+1)·1000/1000
    assert(r.isNullAt(r.fieldIndex("threshold_mq")))
    assert(r.getAs[Long]("coverage_micro") === 1000000L)
    assert(r.getAs[Long]("avg_set_size_micro") === 2000000L) // both labels
  }

  test("conformalSets: empty calibration split keeps one row per alpha " +
      "with a null (infinite) threshold and full-alphabet sets") {
    // calSplit never selects: n_cal = 0, k_rank = 1 > 0 → τ = ∞
    val out = TextAnalysis.conformalSets(symmetricDocs, "doc_id", "text",
        "lab", Seq(100L, 500L), _ < lit(0L))
      .orderBy("alpha_permille").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cal") === 0L)
      assert(r.isNullAt(r.fieldIndex("threshold_mq")))
      assert(r.getAs[Long]("coverage_micro") === 1000000L)
      assert(r.getAs[Long]("avg_set_size_micro") === 2000000L) // both labels
    }
  }

  test("conformalSets: threshold and coverage are monotone in alpha") {
    val docs = (0 until 80).map { i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}",
        s"L${i % 3}")
    }.toDF("doc_id", "text", "lab")
    val out = TextAnalysis.conformalSets(docs, "doc_id", "text", "lab",
        Seq(50L, 200L, 500L, 900L), _ % 2 === 0)
      .orderBy("alpha_permille").collect()
    val thr = out.toSeq.map(r => Option(r.getAs[Any]("threshold_mq"))
      .map(_.asInstanceOf[Long]))
    // larger alpha → smaller k → smaller (or equal) threshold
    thr.sliding(2).foreach {
      case Seq(Some(a), Some(b)) => assert(b <= a)
      case _ => () // null (∞) thresholds only appear at the small-alpha end
    }
    val cov = out.map(_.getAs[Long]("coverage_micro")).toSeq
    assert(cov === cov.sorted.reverse, s"coverage not monotone: $cov")
    val sz = out.map(_.getAs[Long]("avg_set_size_micro")).toSeq
    assert(sz === sz.sorted.reverse, s"set size not monotone: $sz")
  }

  // -------------------------------------------------- conformalSetsHashed

  test("conformalSetsHashed: collision-free dim reproduces the exact twin " +
      "on the symmetric fixture") {
    // two distinct tokens into 2^12 buckets: no collisions, so the hashed
    // posteriors order identically and the conformal OUTPUT matches the
    // exact variant's saturation behavior exactly
    val out = TextAnalysis.conformalSetsHashed(symmetricDocs, "doc_id",
        "text", "lab", Seq(100L, 500L), _ % 2 === 0, dim = 1 << 12)
      .orderBy("alpha_permille").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("coverage_micro") === 1000000L)
      assert(r.getAs[Long]("avg_set_size_micro") === 1000000L)
      assert(r.getAs[Long]("n_cal") === 20L)
      assert(r.getAs[Long]("n_eval") === 20L)
    }
  }

  test("conformalSetsHashed: empty calibration keeps one row per alpha " +
      "with the full-alphabet set (shared-core parity with the exact twin)") {
    val out = TextAnalysis.conformalSetsHashed(symmetricDocs, "doc_id",
        "text", "lab", Seq(100L, 500L), _ < lit(0L), dim = 64)
      .orderBy("alpha_permille").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cal") === 0L)
      assert(r.isNullAt(r.fieldIndex("threshold_mq")))
      assert(r.getAs[Long]("coverage_micro") === 1000000L)
      assert(r.getAs[Long]("avg_set_size_micro") === 2000000L)
    }
  }

  test("conformalSetsHashed: total collision (dim=2, one bucket per side) " +
      "still yields valid full-coverage sets, paying only set size") {
    // every token of both classes may collide; validity must hold anyway —
    // the guarantee is score-function-free
    val out = TextAnalysis.conformalSetsHashed(symmetricDocs, "doc_id",
        "text", "lab", Seq(100L), _ % 2 === 0, dim = 2).collect()
    val r = out.head
    assert(r.getAs[Long]("coverage_micro") >= 900000L) // >= 1 - alpha
    assert(r.getAs[Long]("avg_set_size_micro") <= 2000000L)
  }

  // ----------------------------------------------------- classifierReport

  test("classifierReport: hand-computed 2x2 plus a pred-only class") {
    // truth A: 3 predicted A, 1 predicted B; truth B: 2 B; 1 truth B
    // predicted C (C never true)
    val rows = Seq(
      ("A", "A"), ("A", "A"), ("A", "A"), ("A", "B"),
      ("B", "B"), ("B", "B"), ("B", "C")).toDF("t", "p")
    val out = DataChecks.classifierReport(rows, col("t"), col("p"))
      .orderBy("label").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getAs[Long]("tp"), a.getAs[Long]("fp"), a.getAs[Long]("fn"))
      === ((3L, 0L, 1L)))
    assert(a.getAs[Long]("precision_micro") === 1000000L)
    assert(a.getAs[Long]("recall_micro") === 750000L)
    assert(a.getAs[Long]("f1_micro") === (2L * 3 * 1000000L) / 7L)
    val c = out("C")
    assert((c.getAs[Long]("n_truth"), c.getAs[Long]("n_pred"),
      c.getAs[Long]("tp")) === ((0L, 1L, 0L)))
    assert(c.getAs[Long]("precision_micro") === 0L)
    assert(c.getAs[Long]("recall_micro") === 0L)
  }

  // ------------------------------------------------------------- rankEval

  test("rankEval: hand-checked gains, MRR and nDCG on a planted ranking") {
    // q terms (x, y): doc 1 has x·3 (gain 3); doc 2 has x·1 (below
    // relMin → gain 0) but longer idf-boost… keep it simple: doc 2
    // matches once, doc 3 matches y twice (gain 2), doc 4 no match
    val docs = Seq(
      (1L, "x x x filler filler"),
      (2L, "x filler filler filler filler"),
      (3L, "y y filler filler filler"),
      (4L, "filler only doc here none")).toDF("doc_id", "text")
    val out = Retrieval.rankEval(docs, "doc_id", "text",
        Seq("q0" -> Seq("x", "y")), k = 3, relMin = 2L)
      .collect().head
    assert(out.getAs[Long]("n_ranked") === 3L)
    assert(out.getAs[Long]("n_rel") === 2L)
    // ranking by BM25: doc 1 (tf 3) first → first_rel_rank 1, mrr 1.0
    assert(out.getAs[Int]("first_rel_rank") === 1)
    assert(out.getAs[Long]("mrr_micro") === 1000000L)
    // dcg uses actual ranks of gains {3 @ r1, 2 @ r?}; idcg packs {3, 2}
    // at ranks 1,2 — dcg <= idcg always, and both are exact int sums
    assert(out.getAs[Long]("dcg_micro") <= out.getAs[Long]("idcg_micro"))
    assert(out.getAs[Long]("ndcg_micro") <= 1000000L)
    assert(out.getAs[Long]("ndcg_micro") > 0L)
  }

  test("rankEval: perfect ordering gives nDCG exactly 1.0; miss gives 0") {
    val docs = Seq(
      (1L, "z z z z"), (2L, "z z pad pad"), (3L, "pad pad pad z"))
      .toDF("doc_id", "text")
    val out = Retrieval.rankEval(docs, "doc_id", "text",
        Seq("hit" -> Seq("z"), "miss" -> Seq("absent")), k = 2, relMin = 2L)
      .orderBy("qid").collect()
    val hit = out.find(_.getString(0) == "hit").get
    // BM25 ranks doc1 (tf 4, shortest-dl tie-free) over doc2; gains 4 > 2
    // in the same order → dcg == idcg
    assert(hit.getAs[Long]("ndcg_micro") === 1000000L)
    // a query matching nothing produces no ranked rows at all
    assert(!out.exists(_.getString(0) == "miss"))
  }

  // -------------------------------------------------- lDiversityViolations

  test("lDiversityViolations: only the single-valued classes surface") {
    val rows = Seq(
      (1, "A", "s1"), (1, "A", "s2"),   // diverse — clean
      (1, "B", "s1"), (1, "B", "s1"),   // uniform — violation
      (2, "A", "s3")).toDF("k1", "k2", "sv")
    val out = DataChecks.lDiversityViolations(rows, Seq("k1", "k2"),
        col("sv"), l = 2)
      .orderBy("k1", "k2").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq((1, "B", 2L, 1L), (2, "A", 1L, 1L)))
  }

  // ------------------------------------------- contaminationBySource

  test("contaminationBySource: the leaked source carries the whole rate") {
    val ref = Seq((1000L, "secret benchmark passage tokens here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "secret benchmark passage tokens here", "leaky"),
      (2L, "secret benchmark passage tokens here", "leaky"),
      (3L, "perfectly ordinary clean text body", "leaky"),
      (4L, "another clean doc entirely fresh words", "clean"),
      (5L, "more clean material nothing shared", "clean"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.contaminationBySource(corpus, "doc_id", "text",
        "source", ref, "text", n = 3, minShared = 2, maxDocFreq = 1000)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("leaky") === ((3L, 2L, 666666L)))
    assert(out("clean") === ((2L, 0L, 0L)))
  }

  // --------------------------------------------------- shardSkewAudit

  test("shardSkewAudit: weight conserves and deviations sum to ~0") {
    val docs = (0 until 200).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("id", "w")
    val out = ScaleOps.shardSkewAudit(docs, "id", 8, col("w")).collect()
    assert(out.map(_.getAs[Long]("weight")).sum ===
      (0 until 200).map(_ % 7 + 1).sum.toLong)
    // truncating division: each deviation is within one micro-unit of
    // exact, so the sum sits near 0 (within 8 units of slack per shard)
    val devSum = out.map(_.getAs[Long]("dev_from_uniform_micro")).sum
    assert(math.abs(devSum) <= 8L * 8L, s"deviations don't balance: $devSum")
    assert(out.map(_.getAs[Long]("share_micro")).sum <= 1000000L)
  }

  // ----------------------------------------------------- labelRouting

  test("labelRouting picks the lowest-margin docs per predicted class") {
    // class A docs are confident; one "ab" doc straddles both vocabularies
    // → minimal margin, must head the queue of whichever class wins it
    val docs = (
      (0 until 8).map(i => (i.toLong, "aa aa aa", "A")) ++
      (8 until 16).map(i => (i.toLong, "bb bb bb", "B")) ++
      Seq((16L, "aa bb", "A"))).toDF("doc_id", "text", "lab")
    val out = TextAnalysis.labelRouting(docs, "doc_id", "text", "lab",
        perClassK = 2)
      .orderBy("predicted", "rnk").collect()
    // ranks are 1..k per class, ids unique
    val ids = out.map(_.getAs[Long]("id"))
    assert(ids.distinct.length === ids.length)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ===
        (1L to rows.length).toSeq)
    }
    // the straddler has the global minimum margin → rnk 1 in its class
    val straddler = out.find(_.getAs[Long]("id") == 16L).get
    assert(straddler.getAs[Long]("rnk") === 1L)
    assert(straddler.getAs[Long]("margin_q") ===
      out.map(_.getAs[Long]("margin_q")).min)
  }

  // -------------------------------------------------- keySkewProfile

  test("keySkewProfile: hot key leads; uniform entropy ≈ ln(n)") {
    val rows = ((0 until 100).map(_ => "hot") ++
      (0 until 50).map(i => s"k$i")).toDF("k")
    val out = ScaleOps.keySkewProfile(rows, "k", topK = 3)
      .orderBy("rnk").collect()
    assert(out.head.getAs[String]("key") === "hot")
    assert(out.head.getAs[Long]("share_micro") === 666666L) // 100/150
    assert(out.head.getAs[Long]("n_keys") === 51L)
    // uniform distribution: entropy must hit ln(n)·1e6 within per-key
    // rounding slack
    val uni = (0 until 64).map(i => s"u$i").toDF("k")
    val e = ScaleOps.keySkewProfile(uni, "k", topK = 1)
      .collect().head.getAs[Long]("entropy_micro")
    val want = math.log(64.0) * 1e6
    assert(math.abs(e - want) <= 64L, s"entropy $e vs ln(64)=$want")
  }

  // ----------------------------------------------------------- fanoFactor

  test("fanoFactor: metronome is 0, a single burst is ~n(W-1)/W") {
    val h = 3600L * 1000000000L
    val metro = (0 until 8).map(i => ("tick", i * h + 1L))
    val burst = (0 until 8).map(_ => ("boom", 3L * h + 5L)) ++
      Seq(("boom", 0L), ("boom", 7L * h + 1L)) // pin the same 8-window span
    val ev = (metro ++ burst).toDF("event_type", "ts")
    val out = EventOps.fanoFactor(ev, "event_type", 3600L)
      .orderBy("event_type").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("tick").getAs[Long]("n_windows") === 8L)
    assert(out("tick").getAs[Long]("fano_micro") === 0L)
    val boom = out("boom")
    assert(boom.getAs[Long]("n_active_windows") === 3L)
    // counts (1, 8, 1) over 8 windows: n=10, s2=66 →
    // (8·66 − 100)·1e6 / (8·10) = 5350000
    assert(boom.getAs[Long]("fano_micro") === 5350000L)
  }

  // --------------------------------------------- vocabThresholdCurve

  test("vocabThresholdCurve: hand-computed knee on a 3-type corpus") {
    // type counts across the corpus: a=3, b=2, c=1 → 6 tokens, 3 types
    val docs = Seq("a a b", "a b c").toDF("text")
    val out = TextAnalysis.vocabThresholdCurve(docs, "text", Seq(1L, 2L, 3L))
      .orderBy("min_count").collect()
      .map(r => r.getAs[Long]("min_count") ->
        (r.getAs[Long]("vocab_size"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("coverage_micro"), r.getAs[Long]("oov_micro")))
      .toMap
    assert(out(1L) === ((3L, 6L, 1000000L, 0L)))
    assert(out(2L) === ((2L, 5L, 833333L, 166666L)))
    assert(out(3L) === ((1L, 3L, 500000L, 500000L)))
  }

  // ------------------------------------------------------ jointCensus

  test("jointCensus: independent features sit at lift exactly 1e6") {
    // balanced 2×2: every cell n=2, marginals 4, N=8 → lift (2/4)·(8/4)=1
    val rows = for { x <- Seq("p", "q"); y <- Seq("u", "v"); _ <- 1 to 2 }
      yield (x, y)
    val out = DataChecks.jointCensus(rows.toDF("a", "b"), col("a"), col("b"))
      .collect()
    assert(out.length === 4)
    out.foreach(r => assert(r.getAs[Long]("lift_micro") === 1000000L))
  }

  test("jointCensus: a skewed cell's lift is the hand-computed ratio") {
    // cells: (x1,y1)=2, (x1,y2)=1, (x2,y1)=1 → N=4
    val rows = Seq(("x1", "y1"), ("x1", "y1"), ("x1", "y2"), ("x2", "y1"))
    val out = DataChecks.jointCensus(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().map(r => (r.getAs[String]("x"), r.getAs[String]("y")) -> r)
      .toMap
    // (2/3)·(4/3) = 0.888…89 → 888889
    assert(out(("x1", "y1")).getAs[Long]("lift_micro") === 888889L)
    assert(out(("x1", "y1")).getAs[Long]("n_x") === 3L)
    assert(out(("x1", "y1")).getAs[Long]("n_y") === 3L)
    // (1/3)·(4/1) = 1.333…33 → 1333333
    assert(out(("x1", "y2")).getAs[Long]("lift_micro") === 1333333L)
    // (1/1)·(4/3) = 1.333…33 → 1333333
    assert(out(("x2", "y1")).getAs[Long]("lift_micro") === 1333333L)
  }

  // ------------------------------------------------- sessionEntryExit

  test("sessionEntryExit: bounces, lengths, and same-type exits") {
    val sec = 1000000000L
    val ev = Seq(
      // user 1, session 1: home → search (2 events)
      (1L, 0L * sec, 10L, "home"),
      (1L, 10L * sec, 11L, "search"),
      // user 1, session 2 (gap 10000 s): lone home → bounce, exit = entry
      (1L, 10000L * sec, 12L, "home"),
      // user 2: lone promo → bounce
      (2L, 0L * sec, 20L, "promo"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.sessionEntryExit(ev, "user_id", gapSec = 1800)
      .orderBy("entry_type").collect()
      .map(r => r.getAs[String]("entry_type") -> r).toMap
    val home = out("home")
    assert(home.getAs[Long]("n_sessions") === 2L)
    assert(home.getAs[Long]("n_bounces") === 1L)
    assert(home.getAs[Long]("bounce_micro") === 500000L)
    assert(home.getAs[Long]("len_micro") === 1500000L)
    assert(home.getAs[Long]("n_exit_same") === 1L)
    val promo = out("promo")
    assert(promo.getAs[Long]("n_sessions") === 1L)
    assert(promo.getAs[Long]("bounce_micro") === 1000000L)
    assert(promo.getAs[Long]("n_exit_same") === 1L)
  }
}
