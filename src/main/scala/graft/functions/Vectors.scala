package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure Catalyst
  * higher-order functions — no UDF, no driver round-trip, stays inside codegen'd
  * stages and distributes with the rows.
  *
  * Precision contract: cast to double FIRST, then left-fold in index order —
  * exactly reproducible in the DuckDB oracle (`list_reduce` is also a left fold),
  * so dot products and cosines match bit-for-bit, which keeps top-k orderings
  * deterministic across engines.
  */
object Vectors {
  /** Elementwise-widened copy (float → double, exact). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def l2Norm(v: Column): Column = {
    val d = asDouble(v)
    sqrt(aggregate(zip_with(d, d, _ * _), lit(0.0), _ + _))
  }

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bit LSH signature for cosine similarity: one bit per pseudo-random
    * hyperplane, packed into a long. Plane weights are derived per (plane, dim)
    * from [[Hashing.stableHash]], so the oracle can reconstruct them in SQL and
    * no giant literal arrays travel with the plan.
    * weight(p,d) = stableHash31("p_d")/P - 0.5  ∈ [-0.5, 0.5). */
  def lshSignBits(v: Column, numPlanes: Int): Column = {
    val d = asDouble(v)
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        transform(d, (x, i) =>
          x * (Hashing.stableHash31(concat(lit(s"${p}_"), i.cast("string")))
            .cast("double") / lit(Hashing.P.toDouble) - lit(0.5))),
        lit(0.0), _ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
