package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native ArrayDot must agree BIT-FOR-BIT with the declarative fold —
  * the whole oracle determinism contract rides on identical fp fold order. */
class ArrayDotSpec extends SparkSpec {

  test("bit-for-bit equality with the declarative twin on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .where(col("a_id") < 20 && col("b_id") < 20)
    val diff = pairs.select(
        (Vectors.dot(col("a"), col("b")) -
          Vectors.dotDeclarative(col("a"), col("b"))).as("d"))
      .where(col("d") =!= 0.0).count() // exact zero: same fold, same doubles
    assert(diff == 0)
  }

  test("float and double arrays, mismatched lengths, null propagation") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0f, 2.0f, 3.0f), Seq(2.0))).toDF("f", "d")
    val got = df.select(ArrayDot(col("f"), col("d"))).collect().map(_.getDouble(0))
    assert(got(0) == 32.0)
    assert(got(1) == 2.0) // common-prefix fold
    val n = Seq((Option.empty[Seq[Float]], Seq(1.0)))
      .toDF("f", "d").select(ArrayDot(col("f"), col("d"))).head()
    assert(n.isNullAt(0))
  }

  test("NULL element nulls the result, matching the declarative twin") {
    import spark.implicits._
    val df = Seq(
      (Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(3.0), Some(4.0))))
      .toDF("a", "b")
    val got = df.select(
      ArrayDot(col("a"), col("b")).as("native"),
      Vectors.dotDeclarative(col("a"), col("b")).as("twin")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1)) // both NULL
    assert(got(1).getDouble(0) == 11.0 && got(1).getDouble(1) == 11.0)
    // interpreted path agrees with codegen on the null-element case
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.select(ArrayDot(col("a"), col("b"))).head().isNullAt(0))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("registered as a SQL function via SparkSessionExtensions") {
    import spark.implicits._
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("ad_sql_t")
    assert(spark.sql("SELECT array_dot(a, b) FROM ad_sql_t").head().getDouble(0) == 11.0)
  }

  test("interpreted eval path matches codegen (eval via filter on literal)") {
    import spark.implicits._
    // force interpreted: use the expression in a context with codegen off
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
        .select(ArrayDot(col("a"), col("b"))).head().getDouble(0)
      assert(got == 11.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
