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

  /** Dot product — the native codegen'd [[ArrayDot]] (same widen-first
    * index-order left fold as the declarative twin [[dotDeclarative]]). */
  def dot(a: Column, b: Column): Column = ArrayDot(a, b)

  /** Built-in-only dot product twin (interpreted; the semantic oracle the
    * native expression is property-tested against). */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def l2Norm(v: Column): Column = sqrt(ArrayDot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** md5-derived pseudo-random hyperplane weight, computed DRIVER-side:
    * weight(p,d) = stableHash31("p_d")/P - 0.5 ∈ [-0.5, 0.5) — bit-identical
    * to what `('0x' || substr(md5(p||'_'||d),1,15))::BIGINT % P` yields in the
    * DuckDB oracle, so signatures still reconstruct exactly in SQL. */
  def planeWeight(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % Hashing.P).toDouble /
      Hashing.P.toDouble - 0.5
  }

  /** Sign-bit LSH signature for cosine similarity: one bit per pseudo-random
    * hyperplane, packed into a long. Weights are precomputed on the driver and
    * shipped as literal arrays (numPlanes × dims doubles — a few KB in the
    * plan), NOT per-row hash expressions: at corpus scale that saves
    * rows × dims × planes md5 evaluations. `planeOffset` selects a disjoint
    * plane range from the same md5 family — table t of an OR-amplified
    * multi-table index uses offset t·numPlanes, so every table's hyperplanes
    * are independent yet exactly reconstructable in the oracle. */
  def lshSignBits(v: Column, numPlanes: Int, dims: Int,
      planeOffset: Int = 0): Column = {
    val bits = (0 until numPlanes).map { p =>
      val w = typedLit((0 until dims).map(i => planeWeight(planeOffset + p, i)))
      val proj = ArrayDot(v, w)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
