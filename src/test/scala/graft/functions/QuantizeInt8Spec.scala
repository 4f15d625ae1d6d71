package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native fused quantize must agree BIT-FOR-BIT with the declarative
  * three-HOF composition it replaced in int8TopK — same widen, same
  * `(x·127)/max|x|` operation order, same HALF_UP rounding. */
class QuantizeInt8Spec extends SparkSpec {

  private def declarativeWidened(v: org.apache.spark.sql.Column) =
    transform(graft.operators.Similarity.quantizeInt8(v), _.cast("double"))

  test("bit-for-bit equality with the declarative twin on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val diff = emb.select(
        QuantizeInt8(col("embedding")).as("native"),
        declarativeWidened(col("embedding")).as("twin"))
      .where(col("native") =!= col("twin")).count()
    assert(diff == 0)
  }

  test("scale hits ±127, zeros stay zero, negatives mirror") {
    import spark.implicits._
    val got = Seq(Seq(0.5f, -1.0f, 0.0f, 0.25f))
      .toDF("v").select(QuantizeInt8(col("v"))).head().getSeq[Double](0)
    assert(got == Seq(64.0, -127.0, 0.0, 32.0)) // round(63.5) HALF_UP = 64
  }

  test("null elements quantize to null and are skipped by the scale") {
    import spark.implicits._
    val df = Seq(Seq(Some(2.0), None, Some(-4.0))).toDF("v")
    val native = df.select(QuantizeInt8(col("v"))).head()
      .getSeq[java.lang.Double](0)
    val twin = df.select(declarativeWidened(col("v"))).head()
      .getSeq[java.lang.Double](0)
    assert(native == twin && native == Seq(63.5.round.toDouble, null, -127.0))
    // interpreted path agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(QuantizeInt8(col("v"))).head()
      .getSeq[java.lang.Double](0) == native)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("registered as a SQL function via SparkSessionExtensions") {
    import spark.implicits._
    Seq(Seq(0.5f, -1.0f)).toDF("v").createOrReplaceTempView("qz_sql_t")
    assert(spark.sql("SELECT quantize_int8(v) FROM qz_sql_t").head()
      .getSeq[Double](0) == Seq(64.0, -127.0))
  }

  test("empty and all-zero vectors match the twin (round NULLs the NaN scale)") {
    import spark.implicits._
    val df = Seq(Seq.empty[Double], Seq(0.0, 0.0)).toDF("v")
    val rows = df.select(
      QuantizeInt8(col("v")).as("native"),
      declarativeWidened(col("v")).as("twin")).collect()
    assert(rows(0).getSeq[Double](0).isEmpty && rows(0).getSeq[Double](1).isEmpty)
    // 0/0 → NaN scale; Spark's round NULLs non-finite doubles — both paths
    assert(rows(1).getSeq[java.lang.Double](0) == Seq(null, null))
    assert(rows(1).getSeq[java.lang.Double](1) == Seq(null, null))
  }
}
