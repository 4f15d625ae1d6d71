package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-6 signal/analysis operators: z-score ensemble, embedding
  * cluster-quality, unigram drift. */
class SignalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- zscoreBlend

  test("zscoreBlend: z-scores match hand moments; blend is the weighted sum") {
    val df = Seq(
      (1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0), (4L, "g", 6.0))
      .toDF("id0", "grp0", "x")
    val out = ScaleOps.zscoreBlend(df, "grp0", "id0",
        Seq(("x", col("x"), 2.0)))
      .orderBy("id").collect()
    // micro values 1e6,2e6,3e6,6e6: mean 3e6, var = (1e12*(4+1+0+9))/3
    val xs = Seq(1e6, 2e6, 3e6, 6e6)
    val mean = xs.sum / 4
    val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / 3)
    val exp = xs.map(v => BigDecimal((v - mean) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.map(_.getAs[Double]("z_x")).toSeq === exp)
    out.foreach { r =>
      val z = r.getAs[Double]("z_x")
      assert(math.abs(r.getAs[Double]("blend") - BigDecimal(
        // blend rounds the UNrounded z; reconstruct from raw moments
        2.0 * ((xs(r.getAs[Long]("id").toInt - 1) - mean) / sd))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6, s"$z")
    }
  }

  test("zscoreBlend: n=1 group and constant signal score z=0, not NaN") {
    val df = Seq((1L, "solo", 5.0), (2L, "c", 7.0), (3L, "c", 7.0))
      .toDF("id0", "grp0", "x")
    val out = ScaleOps.zscoreBlend(df, "grp0", "id0", Seq(("x", col("x"), 1.0)))
      .collect()
    assert(out.forall(r => r.getAs[Double]("z_x") == 0.0 &&
      r.getAs[Double]("blend") == 0.0))
  }

  test("zscoreBlend: standardization is per-group, not global") {
    // same value lands on opposite z signs in groups with different means
    val df = Seq(
      (1L, "lo", 1.0), (2L, "lo", 5.0),
      (3L, "hi", 5.0), (4L, "hi", 9.0)).toDF("id0", "grp0", "x")
    val out = ScaleOps.zscoreBlend(df, "grp0", "id0", Seq(("x", col("x"), 1.0)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("z_x")).toMap
    assert(out(2L) > 0 && out(3L) < 0, s"5.0 must be high for lo, low for hi: $out")
  }

  // ------------------------------------------------------- clusterQuality

  test("clusterQuality: tight separated clusters get positive margin, mixed ones negative") {
    def vec(main: Int, eps: Float): Seq[Float] = {
      val v = Array(0f, 0f, 0f); v(main) = 1f
      v(2) += eps; v.toSeq
    }
    val rows =
      // labels 0 and 1: tight, orthogonal
      (0 until 10).map(i => (i.toLong, vec(0, i * 0.01f), 0)) ++
      (10 until 20).map(i => (i.toLong, vec(1, (i - 10) * 0.01f), 1)) ++
      // label 2: a 70/30 mix of the other two directions — its prototype
      // tilts toward x, so members' mean cosine to it (cohesion) falls
      // BELOW the prototype's cosine to label 0's pure-x prototype
      (20 until 27).map(i => (i.toLong, vec(0, 0f), 2)) ++
      (27 until 30).map(i => (i.toLong, vec(1, 0f), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.clusterQuality(df).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n"), r.getAs[Double]("cohesion"),
         r.getAs[Double]("margin"))).toMap
    assert(out(0)._1 === 10L)
    assert(out(0)._3 > 0, s"tight cluster must out-cohere its neighbors: $out")
    assert(out(1)._3 > 0)
    assert(out(2)._3 < 0, s"mixed cluster must have negative margin: $out")
    assert(out(2)._2 < out(0)._2, "mixed cohesion below tight cohesion")
  }

  test("clusterQuality: nearest label is the actually-closest prototype") {
    // label 0 at x, label 1 at (x+y)/sqrt2 (cos ~0.707 to 0), label 2 at y
    // (cos 0 to label 0) → label 0's nearest must be 1
    val df = (
      (0 until 4).map(i => (i.toLong, Seq(1f, 0f), 0)) ++
      (4 until 8).map(i => (i.toLong, Seq(1f, 1f), 1)) ++
      (8 until 12).map(i => (i.toLong, Seq(0f, 1f), 2))).toDF("vec_id", "embedding", "label")
    val nn = Similarity.clusterQuality(df).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Int]("nn_label")).toMap
    assert(nn(0) === 1 && nn(2) === 1)
  }

  // --------------------------------------------------- unigramDriftMovers

  test("unigramDriftMovers: exact micro-prob deltas, ranked by |delta|") {
    val a = Seq((1L, "x x x y"), (2L, "x z")).toDF("doc_id", "text") // x:4 y:1 z:1, tot 6
    val b = Seq((3L, "y y z")).toDF("doc_id", "text")                // y:2 z:1, tot 3
    val out = TextAnalysis.unigramDriftMovers(a, b, "text", k = 10)
      .orderBy("rnk").collect()
    val byTok = out.map(r => r.getAs[String]("tok") ->
      (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
       r.getAs[Long]("pa_micro"), r.getAs[Long]("pb_micro"),
       r.getAs[Long]("delta_micro"))).toMap
    assert(byTok("x") === ((4L, 0L, 666667L, 0L, 666667L)))
    assert(byTok("y") === ((1L, 2L, 166667L, 666667L, -500000L)))
    assert(byTok("z") === ((1L, 1L, 166667L, 333333L, -166666L)))
    // rank order: x (666667) > y (500000) > z (166666)
    assert(out.map(_.getAs[String]("tok")).toSeq === Seq("x", "y", "z"))
    assert(out.map(_.getAs[Long]("rnk")).toSeq === Seq(1L, 2L, 3L))
  }

  test("unigramDriftMovers: k truncates after ranking; ties break by token") {
    val a = Seq((1L, "p q")).toDF("doc_id", "text")
    val b = Seq((2L, "r s")).toDF("doc_id", "text")
    // all four tokens have |delta| = 500000 → order is alphabetical
    val out = TextAnalysis.unigramDriftMovers(a, b, "text", k = 2)
      .orderBy("rnk").collect()
    assert(out.map(_.getAs[String]("tok")).toSeq === Seq("p", "q"))
  }
}
