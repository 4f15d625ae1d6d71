package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectations layer a production
  * warehouse runs before anything downstream trusts a table (the idea behind
  * AWS Deequ / dbt tests / Great Expectations, re-expressed as plain Spark
  * aggregates so the whole suite is ONE pass over the fact table).
  *
  * The reference pipeline trusts its inputs blindly (it reads the crawler's
  * catalog and goes — `PySpark_Scripts/stage_1_hcp_channel_all_hardcode.py`
  * S1:93-225 has no row-level validation anywhere); at 100 TB a silently
  * half-loaded partition or a broken upstream export poisons every derived
  * table, so the audit gate is part of the engine's first-class surface.
  *
  * Scale design:
  *   - Every row-local check (null rate, accepted values, range, custom
  *     predicate) compiles to a conditional `sum` in ONE aggregate over the
  *     table — adding checks adds columns to the agg buffer, never passes
  *     over the data.
  *   - Uniqueness rides the same pass as `count - count_distinct(struct)`
  *     (Catalyst plans the distinct via Expand in the same scan).
  *   - Referential integrity is the one check that genuinely needs a second
  *     relation: a left-anti join counted — the dim side is usually
  *     broadcast-small, and AQE picks that up; the violating-row count is
  *     all that shuffles.
  *   - Output is one tiny (check, metric, passed) table per suite — the
  *     thing a scheduler gates a DAG edge on.
  */
object DataChecks {

  /** One check = a name plus either a row predicate that must hold (counted
    * where violated) or a whole-table metric with a pass condition. */
  sealed trait Check { def name: String }

  /** Rows where `col` is NULL are violations. */
  final case class NotNull(name: String, column: String) extends Check

  /** `columns` must be a unique key: metric = duplicate row count. */
  final case class Unique(name: String, columns: Seq[String]) extends Check

  /** Rows whose `column` is non-null and outside `values` are violations. */
  final case class AcceptedValues(name: String, column: String,
      values: Seq[String]) extends Check

  /** Rows whose `column` is non-null and outside [lo, hi] are violations. */
  final case class InRange(name: String, column: String, lo: Double,
      hi: Double) extends Check

  /** Rows failing an arbitrary boolean expression are violations. */
  final case class Predicate(name: String, holds: Column) extends Check

  /** Rows whose `column` value has no match in `dim(dimColumn)` are
    * violations (NULL FKs are not violations — pair with [[NotNull]] if
    * they should be). */
  final case class ForeignKey(name: String, column: String, dim: DataFrame,
      dimColumn: String) extends Check

  /** Run the suite; returns (check, violations, passed) ordered by check
    * name — `passed` means zero violations. All non-FK checks share one
    * aggregate pass; each FK check adds one anti-join count. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val spark = df.sparkSession

    def violations(c: Check): Option[Column] = c match {
      case NotNull(_, col0) =>
        Some(sum(when(col(col0).isNull, 1L).otherwise(0L)))
      case Unique(_, cols) =>
        Some(count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
      case AcceptedValues(_, col0, vs) =>
        Some(sum(when(col(col0).isNotNull &&
          !col(col0).isin(vs: _*), 1L).otherwise(0L)))
      case InRange(_, col0, lo, hi) =>
        Some(sum(when(col(col0).isNotNull &&
          !col(col0).between(lo, hi), 1L).otherwise(0L)))
      case Predicate(_, holds) =>
        Some(sum(when(!coalesce(holds, lit(false)), 1L).otherwise(0L)))
      case _: ForeignKey => None
    }

    val rowChecks = checks.flatMap(c => violations(c).map(v =>
      coalesce(v, lit(0L)).as(c.name))) // empty table → 0 violations, not NULL
    val onePass: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        // one wide aggregate row → unpivoted to (check, violations)
        val wide = df.agg(rowChecks.head, rowChecks.tail: _*)
        val names = checks.filter(c => violations(c).isDefined).map(_.name)
        Some(wide.select(explode(map(
          names.flatMap(n => Seq(lit(n), col(n))): _*))
          .as(Seq("check", "violations"))))
      }

    val fkResults = checks.collect { case ForeignKey(name, col0, dim, dimCol) =>
      val orphans = df.select(col(col0)).where(col(col0).isNotNull)
        .join(dim.select(col(dimCol).as(col0)), Seq(col0), "left_anti")
      orphans.agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }

    (onePass.toSeq ++ fkResults)
      .reduce(_.unionByName(_))
      .select(col("check"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy("check")
  }

  /** k-anonymity audit — the re-identification risk report privacy reviews
    * run before a table ships: every equivalence class of the
    * quasi-identifier columns with FEWER than `k` members (small classes
    * are the linkable rows), plus each class's size. An empty result IS
    * the pass condition. The redaction ops ([[TextAnalysis.redact]]) strip
    * direct identifiers; this audits what the remaining columns still
    * leak in combination.
    *
    * Scale shape: one groupBy over the quasi columns (map-side partials),
    * a size filter — never a self-join, never a sort. */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
  }

  /** Equal-width histogram profile of numeric columns — the distribution
    * companion to [[audit]]'s expectation totals: per column, row counts in
    * `bins` equal-width buckets between the column's own min and max
    * (nulls to bin −1, a constant column collapses to bin 0). The standard
    * profiling pass before choosing gates, bin edges, or skew salts.
    *
    * Scale shape: one unpivot (no shuffle — an Expand over the scan), one
    * |cols|-row min/max aggregate broadcast back, then a
    * (column, bin)-keyed aggregate whose partials collapse map-side to
    * |cols|·(bins+1) rows per partition. Bin arithmetic is mirrored
    * token-for-token by the oracle so boundary doubles land identically. */
  def numericProfile(df: DataFrame, cols: Seq[String],
      bins: Int = 10): DataFrame = {
    require(cols.nonEmpty && bins >= 1, "need columns and bins >= 1")
    val stacked = df
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .unpivot(Array.empty, cols.map(col).toArray, "col_name", "x")
    val stats = stacked.groupBy("col_name")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    stacked.join(broadcast(stats), "col_name")
      .withColumn("bin",
        when(col("x").isNull, lit(-1L))
          .when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor(((col("x") - col("mn")) * bins) / (col("mx") - col("mn"))),
            lit(bins - 1L)).cast("long")))
      .groupBy(col("col_name"), col("bin"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
