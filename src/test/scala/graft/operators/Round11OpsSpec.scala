package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-11 tail operators: selective-prediction risk–coverage, Cohen's
  * kappa rater agreement, approximate-FD (g₃) audit, embedding centroid
  * drift. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------- selectiveRiskCurve

  private val riskGrid = Seq(0L, 1000000L, 10000000L)

  test("selectiveRiskCurve: threshold 0 keeps everything at NB accuracy") {
    // separable corpus: NB is perfect, so every threshold shows acc 1e6
    val rows = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "aa aa bb", "A") else (i.toLong, "cc cc dd", "B")
    }
    val out = TextAnalysis.selectiveRiskCurve(
        rows.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab", riskGrid)
      .orderBy("threshold_q").collect()
    assert(out.length === riskGrid.length)
    val t0 = out.head
    assert(t0.getAs[Long]("threshold_q") === 0L)
    assert(t0.getAs[Long]("n_kept") === 20L)
    assert(t0.getAs[Long]("coverage_micro") === 1000000L)
    assert(out.filter(_.getAs[Long]("n_kept") > 0)
      .forall(_.getAs[Long]("acc_micro") === 1000000L))
  }

  test("selectiveRiskCurve: coverage is non-increasing in the threshold") {
    val rows = (0 until 40).map { i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3}", s"L${i % 3}")
    }
    val out = TextAnalysis.selectiveRiskCurve(
        rows.toDF("doc_id", "text", "lab"), "doc_id", "text", "lab",
        Seq(0L, 100000L, 500000L, 2000000L, 50000000L))
      .orderBy("threshold_q").collect()
    val kept = out.map(_.getAs[Long]("n_kept")).toSeq
    assert(kept === kept.sorted.reverse, s"coverage not monotone: $kept")
    assert(kept.head === 40L) // margin >= 0 always holds
  }

  test("selectiveRiskCurve: accuracy on the kept set tracks the margin") {
    // class A docs are clean; class B docs share A's tokens (low margin,
    // often wrong) — high thresholds should keep only the confident A side
    val clean = (0 until 10).map(i => (i.toLong, "aa aa aa aa", "A"))
    val noisy = (10 until 20).map(i => (i.toLong, "aa bb", "B"))
    // exact micro-nat margins: clean docs 4·(ll_A(aa) − ll_B(aa)) =
    // 4·(−24098 + 693147) = 2676196; noisy docs 2375474 — the threshold
    // between them keeps only the clean half
    val out = TextAnalysis.selectiveRiskCurve(
        (clean ++ noisy).toDF("doc_id", "text", "lab"),
        "doc_id", "text", "lab", Seq(0L, 2500000L))
      .orderBy("threshold_q").collect()
    val accAll = out.head.getAs[Long]("acc_micro")
    val accHi = out.last.getAs[Long]("acc_micro")
    assert(out.last.getAs[Long]("n_kept") < 20L)
    assert(accHi >= accAll)
  }

  // ------------------------------------------------------- raterAgreement

  test("raterAgreement: perfect agreement gives kappa 1e6") {
    val df = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z"))
      .toDF("a", "b")
    val out = DataChecks.raterAgreement(df, col("a"), col("b")).collect()
    assert(out.forall(_.getAs[Long]("kappa_micro") === 1000000L))
    assert(out.forall(r =>
      r.getAs[String]("a_label") === r.getAs[String]("b_label")))
  }

  test("raterAgreement: chance-level raters give kappa near 0") {
    // every (a, b) combination equally often: po = pe exactly -> kappa 0
    val rows = for { a <- Seq("x", "y"); b <- Seq("x", "y") } yield (a, b)
    val out = DataChecks.raterAgreement(rows.toDF("a", "b"),
      col("a"), col("b")).collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Long]("kappa_micro") === 0L))
  }

  test("raterAgreement: constant identical raters hit the pe=1 convention") {
    val df = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val out = DataChecks.raterAgreement(df, col("a"), col("b")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("kappa_micro") === 1000000L)
    // and constant DISAGREEING raters get the 0 branch
    val bad = Seq(("x", "y"), ("x", "y")).toDF("a", "b")
    val out2 = DataChecks.raterAgreement(bad, col("a"), col("b")).collect()
    assert(out2.head.getAs[Long]("kappa_micro") === 0L)
  }

  test("raterAgreement: hand-computed kappa on a 2x2 confusion") {
    // 45 xx, 15 xy, 25 yx, 15 yy: po=.6, pe=.54 -> kappa=6/46=0.130435
    val rows = Seq.fill(45)(("x", "x")) ++ Seq.fill(15)(("x", "y")) ++
      Seq.fill(25)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val out = DataChecks.raterAgreement(rows.toDF("a", "b"),
      col("a"), col("b")).collect()
    assert(out.head.getAs[Long]("n_total") === 100L)
    assert(out.head.getAs[Long]("po_n") === 60L)
    assert(out.head.getAs[Long]("pe_s") === 60L * 70L + 40L * 30L)
    assert(out.head.getAs[Long]("kappa_micro") === 130435L)
  }

  // --------------------------------------------------------- fdViolations

  test("fdViolations: an exact dependency reports zero violations") {
    val df = Seq((1L, "a", "p"), (2L, "a", "p"), (3L, "b", "q"))
      .toDF("id", "det", "dep")
    val out = DataChecks.fdViolations(df, Seq(("det", "dep"))).collect()
    assert(out.head.getAs[Long]("violations") === 0L)
    assert(out.head.getAs[Long]("violating_groups") === 0L)
    assert(out.head.getAs[Long]("g3_micro") === 0L)
    assert(out.head.getAs[Long]("n_groups") === 2L)
  }

  test("fdViolations: g3 counts the minimum rows to remove") {
    // det=a maps to p(3), q(1): 1 removal; det=b maps to r(2): clean
    val df = Seq((1L, "a", "p"), (2L, "a", "p"), (3L, "a", "p"),
      (4L, "a", "q"), (5L, "b", "r"), (6L, "b", "r")).toDF("id", "det", "dep")
    val out = DataChecks.fdViolations(df, Seq(("det", "dep"))).collect()
    assert(out.head.getAs[Long]("n_rows") === 6L)
    assert(out.head.getAs[Long]("violations") === 1L)
    assert(out.head.getAs[Long]("violating_groups") === 1L)
    // round(1e6 / 6) = 166667
    assert(out.head.getAs[Long]("g3_micro") === 166667L)
  }

  test("fdViolations: one row per declared pair, both directions differ") {
    // dep -> det is looser than det -> dep here
    val df = Seq((1L, "a", "p"), (2L, "a", "q"), (3L, "b", "q"))
      .toDF("id", "det", "dep")
    val out = DataChecks.fdViolations(df,
        Seq(("det", "dep"), ("dep", "det")))
      .orderBy("det_col").collect()
    assert(out.length === 2)
    val byPair = out.map(r =>
      (r.getAs[String]("det_col"), r.getAs[Long]("violations"))).toMap
    assert(byPair("det") === 1L) // a -> {p, q}
    assert(byPair("dep") === 1L) // q -> {a, b}
  }

  // -------------------------------------------------------- centroidDrift

  test("centroidDrift: identical halves give cosine 1") {
    val rows = (0 until 8).map { i =>
      (i.toLong, Seq(1.0f, 2.0f, -0.5f), i / 4) // same vector everywhere
    }
    val out = Similarity.centroidDrift(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", col("vec_id") % 2 === 0)
      .orderBy("label").collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Double]("cos_centroid") === 1.0))
  }

  test("centroidDrift: opposed halves give cosine -1") {
    val rows = (0 until 8).map { i =>
      val v = if (i % 2 == 0) Seq(1.0f, 0.0f) else Seq(-1.0f, 0.0f)
      (i.toLong, v, 0)
    }
    val out = Similarity.centroidDrift(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", col("vec_id") % 2 === 0).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("cos_centroid") === -1.0)
    assert(out.head.getAs[Long]("n_a") === 4L)
    assert(out.head.getAs[Long]("n_b") === 4L)
  }

  test("centroidDrift: a label present in one half only drops out") {
    val rows = Seq(
      (0L, Seq(1.0f), 0), (1L, Seq(1.0f), 0), // label 0 in both halves
      (2L, Seq(1.0f), 1)) // label 1 only in the even half
    val out = Similarity.centroidDrift(rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", col("vec_id") % 2 === 0).collect()
    assert(out.map(_.getAs[Int]("label")).toSeq === Seq(0))
  }

  test("centroidDrift: orthogonal drift is caught as cosine 0") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (2L, Seq(1.0f, 0.0f), 0), // half A on x
      (1L, Seq(0.0f, 2.0f), 0), (3L, Seq(0.0f, 2.0f), 0)) // half B on y
    val out = Similarity.centroidDrift(rows.toDF("vec_id", "embedding", "label"),
      "vec_id", "embedding", "label", col("vec_id") % 2 === 0).collect()
    assert(out.head.getAs[Double]("cos_centroid") === 0.0)
  }
}
