package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's reusable semantic operators, as composable Column /
  * DataFrame functions (all cites into
  * `/root/reference/PySpark_Scripts/stage_1_hcp_channel_all_hardcode.py` = S1).
  *
  * Everything here is built-in-expression only (whole-stage-codegen friendly — no
  * UDFs, matching the reference, which imports `udf` but never uses one, S1:14).
  */
object ChannelOps {

  /** Money-string cleanup: strip thousands separators, lenient-cast to double
    * (S1:287,383,473,554,637,953 — `cast(replace(x, ',', '') as double)`).
    * Under ansi=false a non-numeric remainder yields NULL, as in the reference. */
  def parseMoney(c: Column): Column = regexp_replace(c, ",", "").cast("double")

  /** Proportional cost allocation over an unbounded window partition:
    * `cost * reach / sum(reach) OVER (PARTITION BY keys)` (S1:164,311,407,490,570).
    * No ORDER BY → whole-partition frame — one shuffle on the partition keys; the
    * per-partition total is computed map-side-free but never drags rows to the
    * driver. Invariant: per partition, allocated costs re-sum to the budget. */
  def allocateByShare(cost: Column, reach: Column, partitionBy: Column*): Column =
    cost * reach / sum(reach).over(Window.partitionBy(partitionBy: _*))

  /** Same allocation via aggregate-of-aggregate + join-back (S1:650-675,993-1061).
    * The reference implements the ratio BOTH ways; their NULL/duplication behavior
    * differs, so both live here. Returns the input with `total_<reachCol>` added.
    * Prefer [[allocateByShare]] (one shuffle); this variant exists for semantic
    * parity and for when the total must also be joined to other inputs. */
  def withGroupTotal(df: DataFrame, reachCol: String, keys: Seq[String]): DataFrame = {
    val totals = df.groupBy(keys.map(col): _*)
      .agg(sum(col(reachCol)).as(s"total_$reachCol"))
    df.join(totals, keys)
  }

  /** Week-of-year (yyyyww int) → month bucket, the reference's canonical
    * Spark-dialect form (S1:717): `add_months(to_date(year||'-01-01'),
    * (week-1) div 4)`. The live query S1:853 used Presto functions (invalid in
    * Spark — SURVEY §2.7 F-13); this is the documented resolution. */
  def weekToMonth(yrwk: Column): Column = {
    val year = substring(yrwk.cast("string"), 1, 4)
    val week = substring(yrwk.cast("string"), 5, 2).cast("int")
    add_months(to_date(concat(year, lit("-01-01"))), ((week - 1) / lit(4)).cast("int"))
  }

  /** Long → wide pivot via conditional aggregation (S1:698-699,834-835):
    * `sum(case when metric = 'M' then cast(value as double) end)`. No ELSE —
    * non-matching rows contribute NULL (ignored by sum), matching F-11. */
  def pivotMetric(metric: Column, value: Column, metricName: String): Column =
    sum(when(metric === metricName, value.cast("double")))

  /** Searched CASE with no ELSE: non-matching rows yield NULL (S1:121-124,843-850).
    * Pass (condition, result) pairs in order. */
  def caseNoElse(branches: (Column, Column)*): Column =
    branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (acc, (c, v)) => acc.when(c, v)
    }

  /** Spread a total over fixed channel shares — the reference's manual unpivot
    * (S1:957-969): one UNION ALL branch per (channel, share) with
    * `total * share AS cost`. Shares need not sum to 1 (the reference's don't). */
  def spreadByShares(totals: DataFrame, totalCol: String,
      shares: Seq[(String, Double)], channelCol: String = "channel"): DataFrame =
    shares.map { case (channel, share) =>
      totals.withColumn(channelCol, lit(channel))
        .withColumn("cost", col(totalCol) * lit(share))
        .drop(totalCol)
    }.reduce(_ union _)

  /** Typed NULL literal (S1:163,258-259,448: `cast(null as double) as x`). */
  def nullOf(t: String): Column = lit(null).cast(t)
}
