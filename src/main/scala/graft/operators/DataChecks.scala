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
  /** Cohen's kappa agreement between two categorical columns — the
    * inter-annotator (or model-vs-model) audit: how much do two labelers
    * agree beyond what label-frequency chance predicts? Emits the full
    * confusion matrix (one row per observed label pair, with its count)
    * plus the corpus-level summary carried on every row: total rows,
    * observed-agreement count, the chance-agreement cross-product sum,
    * and kappa in integer micro units. kappa = (pₒ − pₑ)/(1 − pₑ)
    * computed entirely from int64 counts via the equivalent
    * (pₒ·N − Σᵣ·c)/(N² − Σᵣ·c) form — exact while N ≤ ~3·10⁹ (products
    * stay inside int64; beyond that, pre-aggregate to per-shard counts).
    * Degenerate chance-certain corpora (pₑ = 1, both raters constant on
    * one label) get kappa 1 when agreement is perfect and 0 otherwise,
    * the usual convention for the 0/0 case.
    *
    * Scale shape: one (a,b)-keyed count aggregate (map-side combined to
    * ≤ |labels|² rows per partition), marginals re-aggregated from the
    * CELLS (never the corpus), and two 1-row broadcast scalars joined
    * back — corpus rows are touched exactly once. */
  def raterAgreement(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = graft.core.CacheScope.persist(
      df.select(aCol.as("a_label"), bCol.as("b_label"))
        .groupBy("a_label", "b_label")
        .agg(count(lit(1)).as("n_docs")))
    val ra = cells.groupBy(col("a_label").as("lbl"))
      .agg(sum("n_docs").as("ra"))
    val cb = cells.groupBy(col("b_label").as("lbl"))
      .agg(sum("n_docs").as("cb"))
    val peS = ra.join(cb, Seq("lbl"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("pe_s"))
    val tots = cells.agg(
      sum("n_docs").as("n_total"),
      coalesce(sum(when(col("a_label") === col("b_label"), col("n_docs"))),
        lit(0L)).as("po_n"))
    val den = (col("n_total") * col("n_total") - col("pe_s")).cast("double")
    cells.crossJoin(broadcast(tots)).crossJoin(broadcast(peS))
      .select(col("a_label"), col("b_label"), col("n_docs"),
        col("n_total"), col("po_n"), col("pe_s"),
        when(col("n_total") * col("n_total") === col("pe_s"),
          when(col("po_n") === col("n_total"), lit(1000000L)).otherwise(0L))
          .otherwise(round((col("po_n") * col("n_total") - col("pe_s"))
            .cast("double") * 1e6 / den, 0).cast("long"))
          .as("kappa_micro"))
  }

  /** Approximate functional-dependency audit over declared column pairs —
    * the g₃ measure of FD discovery (Kivinen & Mannila 1995; TANE's
    * error): for each candidate A → B, the minimum number of rows that
    * would have to be removed for the dependency to hold exactly, i.e.
    * n_rows − Σ_a max_b count(a,b). A near-zero g₃ on (source → lang)
    * says sources are monolingual enough to backfill missing language
    * tags; a large one kills the shortcut. One row per declared pair with
    * the group/violation counts and the violation rate in micro units.
    *
    * Scale shape per pair: one (A,B)-keyed count aggregate, re-aggregated
    * to A grain, then a 3-column global fold — map-side combine at every
    * level, no joins, no windows; pairs union afterwards. Cost is
    * |pairs| corpus passes over two projected columns each (columnar scan
    * prunes the rest). */
  def fdViolations(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one (determinant, dependent) pair")
    pairs.map { case (det, dep) =>
      df.groupBy(col(det).as("det_val"), col(dep).as("dep_val"))
        .agg(count(lit(1)).as("c"))
        .groupBy("det_val")
        .agg(sum("c").as("grp_rows"), max("c").as("keep"),
          count(lit(1)).as("n_dep"))
        .agg(
          coalesce(sum("grp_rows"), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_groups"),
          coalesce(sum(when(col("n_dep") > 1, 1L).otherwise(0L)), lit(0L))
            .as("violating_groups"),
          coalesce(sum("keep"), lit(0L)).as("kept"))
        .select(lit(det).as("det_col"), lit(dep).as("dep_col"),
          col("n_rows"), col("n_groups"), col("violating_groups"),
          (col("n_rows") - col("kept")).as("violations"),
          when(col("n_rows") === 0, 0L)
            .otherwise(round((col("n_rows") - col("kept")).cast("double") *
              1e6 / col("n_rows"), 0).cast("long")).as("g3_micro"))
    }.reduce(_.unionAll(_))
  }

  /** Per-class precision/recall/F1 of a predicted label against a truth
    * label — the class-resolved companion to [[raterAgreement]]'s single
    * kappa (kappa says "trust them where they agree"; this names WHICH
    * classes a cheap labeler is safe on). Exact int64: tp/fp/fn come from
    * the confusion cells; the three rates are truncating integer micro
    * divisions (0 when the denominator is 0 — a class never predicted has
    * precision 0 by convention, not NULL).
    *
    * Scale shape: one (truth, pred)-keyed count aggregate (map-side
    * combined, ≤ |labels|² rows), then everything runs on that bounded
    * cell frame: diagonal + both marginals re-aggregated from cells,
    * outer-joined on the label alphabet. */
  def classifierReport(df: DataFrame, truthCol: Column,
      predCol: Column): DataFrame = {
    val cells = graft.core.CacheScope.persist(
      df.select(truthCol.as("t"), predCol.as("p"))
        .groupBy("t", "p").agg(count(lit(1)).as("n")))
    val rowT = cells.groupBy(col("t").as("label"))
      .agg(sum("n").as("n_truth"))
    val colT = cells.groupBy(col("p").as("label"))
      .agg(sum("n").as("n_pred"))
    val diag = cells.where(col("t") === col("p"))
      .select(col("t").as("label"), col("n").as("tp"))
    rowT.join(colT, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("label"), col("n_truth"), col("n_pred"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_truth") - col("tp")).as("fn"))
      .select(col("label"), col("n_truth"), col("n_pred"), col("tp"),
        col("fp"), col("fn"),
        when(col("n_pred") === 0, 0L)
          .otherwise(expr("(tp * 1000000L) div n_pred"))
          .as("precision_micro"),
        when(col("n_truth") === 0, 0L)
          .otherwise(expr("(tp * 1000000L) div n_truth"))
          .as("recall_micro"),
        when(col("n_pred") + col("n_truth") === 0, 0L)
          .otherwise(expr("(2L * tp * 1000000L) div (n_pred + n_truth)"))
          .as("f1_micro"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007): quasi-identifier
    * classes whose sensitive attribute takes FEWER than `l` distinct
    * values — the classes where linking someone to their class reveals
    * the sensitive value outright, which k-anonymity (q145) alone never
    * catches (a class of 50 rows that all share one diagnosis is
    * k-anonymous and fully leaky). Returns only violating classes with
    * their size and distinct-count.
    *
    * Scale shape: one (quasi..., sensitive)-keyed count, re-aggregated to
    * quasi grain — the exact [[fdViolations]] two-level shape, map-side
    * combined at both levels; the violation filter runs on the class
    * frame. */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, "need quasi columns and l >= 2")
    val qs = quasiCols.map(col)
    df.groupBy(qs :+ sensitiveCol.as("sv"): _*)
      .agg(count(lit(1)).as("c"))
      .groupBy(qs: _*)
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_distinct_sensitive"))
      .where(col("n_distinct_sensitive") < l)
  }

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

  /** Joint census of two categorical (or pre-bucketed) features with a
    * pointwise independence lift — the 2-D histogram behind "does source
    * X over-produce language Y?" dashboards. Per occupied (x, y) cell:
    * its count, both marginals, and lift = P(x,y) / (P(x)·P(y)) in micro
    * units (1e6 = independent; ≫ means the features co-occur, ≪ means
    * they repel — the PMI census q128 runs over token pairs, applied to
    * feature values).
    *
    * Lift is the one fixed-parenthesization double expression
    * `floor((n/rx)·(N/cy)·1e6 + 0.5)` — each factor is exact-int-to-
    * double, the two divisions and one multiply are IEEE-determined, so
    * any engine replays it bit-for-bit (the q197 entropy convention;
    * int64-only would overflow at n·N·1e6 ≈ 1e22).
    *
    * Scale shape: ONE (x, y)-keyed count over the data (map-side
    * combined; the cell frame is bounded by the bucket grids), then two
    * marginal rollups OF THE CELL FRAME (never the data) and a 1-row
    * total, all broadcast back onto the cells. */
  def jointCensus(df: DataFrame, xBucket: Column, yBucket: Column)
      : DataFrame = {
    val cells = graft.core.CacheScope.persist(
      df.select(xBucket.as("x"), yBucket.as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("n")))
    val rowM = cells.groupBy("x").agg(sum("n").as("n_x"))
    val colM = cells.groupBy("y").agg(sum("n").as("n_y"))
    val tot = cells.agg(sum("n").as("n_total"))
    val d = (c: Column) => c.cast("double")
    cells.join(broadcast(rowM), "x").join(broadcast(colM), "y")
      .crossJoin(broadcast(tot))
      .select(col("x"), col("y"), col("n"), col("n_x"), col("n_y"),
        col("n_total"),
        floor((d(col("n")) / d(col("n_x"))) *
            (d(col("n_total")) / d(col("n_y"))) * lit(1e6) + lit(0.5))
          .cast("long").as("lift_micro"))
  }
}
