package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate catalog row: a named Spark query plus (optionally)
  * equivalent DuckDB oracle SQL over the same parquet tables. */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared catalog plumbing for the [[CatalogPart1]]..[[CatalogPart6]]
  * traits: the parquet table reader every part uses (events timestamps
  * normalized to epoch-nanos via [[graft.core.EventTs]]). */
private[graft] trait CatalogBase {
  private[graft] def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.EventTs.toNanos(s.read.parquet(s"$dir/$name.parquet"))

  // ---- deterministic gate seeds (round-15 verdict item 3) ----
  // Four driver-gate rows were VACUOUS at sf0.01: the synthetic corpus has
  // no cross-lang duplicate documents (q159/q213/q214) and no >=0.6-cosine
  // embedding pairs under vec_id < 32 (q23), so those gates passed on a
  // 0 = 0 hash match that certifies only that both engines find nothing.
  // These literal seed rows are unioned into the query input on BOTH sides
  // (Spark builder and DuckDB oracle — same values), so the gates exercise
  // real pair output at every sf. Negative ids cannot collide with
  // generated data (testdata ids start at 0) and the gamma group shares
  // one tag on purpose — it must produce NO pair (the same-tag cull).

  /** (doc_id, lang, text): two cross-lang dup groups (alpha en/de, beta
    * fr/es → exactly two expected pairs) plus one same-lang group (gamma,
    * en/en → zero pairs, exercising the cross-tag cull). */
  private[graft] val seedDocRows: Seq[(Long, String, String)] = Seq(
    (-6L, "en", "seeded same language duplicate gamma"),
    (-5L, "en", "seeded same language duplicate gamma"),
    (-4L, "es", "seeded cross language duplicate beta"),
    (-3L, "fr", "seeded cross language duplicate beta"),
    (-2L, "de", "seeded cross language duplicate alpha"),
    (-1L, "en", "seeded cross language duplicate alpha"))

  private[graft] def seededDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select("doc_id", "lang", "text")
      .unionByName(seedDocRows.toDF("doc_id", "lang", "text"))
  }

  /** The DuckDB twin of [[seededDocs]] — a derived-table SQL fragment. */
  private[graft] val seededDocsSql: String =
    "SELECT doc_id, lang, text FROM documents UNION ALL SELECT * FROM (VALUES " +
      seedDocRows.map { case (id, lang, txt) =>
        s"(CAST($id AS BIGINT), '$lang', '$txt')"
      }.mkString(", ") + ") sd(doc_id, lang, text)"

  /** (vec_id, embedding): two 64-dim basis-combination vectors (testdata
    * embedding dim is 64 at every sf) with cosine 1/sqrt(2) ~ 0.7071 — a
    * guaranteed >=0.6 near-dup pair among the vec_id < 32 query set. All
    * components are 0.0/1.0: exactly representable in FLOAT, so the
    * float-vs-double cast path cannot diverge between engines. */
  private[graft] val seedEmbRows: Seq[(Long, Array[Float])] = {
    val dim = 64
    def unit(hot: Set[Int]) =
      Array.tabulate(dim)(i => if (hot(i)) 1f else 0f)
    Seq((-2L, unit(Set(0))), (-1L, unit(Set(0, 1))))
  }

  private[graft] def seededEmb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "embeddings").select("vec_id", "embedding")
      .unionByName(seedEmbRows.toDF("vec_id", "embedding"))
  }

  /** The DuckDB twin of [[seededEmb]]. */
  private[graft] val seededEmbSql: String =
    "SELECT vec_id, embedding FROM embeddings UNION ALL SELECT * FROM (VALUES " +
      seedEmbRows.map { case (id, v) =>
        s"(CAST($id AS BIGINT), " +
          v.map(_.toDouble.toString).mkString("[", ", ", "]") + "::FLOAT[])"
      }.mkString(", ") + ") se(vec_id, embedding)"
}
