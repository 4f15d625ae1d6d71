package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything downstream of dedup/fingerprinting must produce the SAME value in
  * Spark and in the DuckDB oracle, so we avoid engine-native hashes (Spark murmur3
  * `hash()` vs DuckDB's `hash()` differ) and derive a 60-bit integer from md5,
  * which both engines implement identically:
  *   Spark : conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB: ('0x' || substr(md5(s), 1, 15)) :: BIGINT
  * 15 hex digits = 60 bits → always positive in an int64, and products with
  * 31-bit coefficients stay within int64 (no overflow, no sign games).
  */
object Hashing {
  /** 2^31-1, Mersenne prime — modulus for the universal-hash family. */
  val P: Long = 2147483647L

  /** 60-bit stable hash of a string column (identical in DuckDB, see above). */
  def stableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** stableHash folded into [0, P). */
  def stableHash31(c: Column): Column = stableHash(c) % P

  /** Fixed universal-hash coefficients (a_i odd in [1,P), b_i in [0,P)),
    * generated once from a pinned seed so Spark queries and generated oracle SQL
    * agree. h_i(x) = (a_i * x + b_i) mod P, x in [0,P). */
  def minhashCoeffs(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong | 1L,
                         rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Polynomial rolling hash over an array of string tokens (order-sensitive
    * document fingerprint): fold acc = (acc*31 + h(token) mod 100003) mod 1e9+7.
    * Intermediate magnitudes stay < 2^35 — safe in int64 in both engines. */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, t) => (acc * 31L + stableHash(t) % 100003L) % 1000000007L)
}
