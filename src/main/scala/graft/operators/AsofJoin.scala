package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of join (the time-series "most recent fact at or before
  * this event" join — Spark has no built-in; the reference has none either,
  * but every event/feature pipeline needs it).
  *
  * Algorithm — union-and-carry, not a range join: tag each side, union into
  * one frame, then ONE shuffle+sort on (keys, ts, side) and a
  * `last(payload, ignoreNulls)` running window carries the most recent right
  * payload forward into each left row. Cost is a single sort per key
  * partition, independent of how many left rows share a right match.
  * The naive alternative — equi-join on key + `l.ts >= r.ts` range filter +
  * max-per-left dedup — multiplies each left row by ALL its earlier right
  * rows before collapsing (quadratic per key in history length); at 100 TB
  * event volume that join output is the job. The union plan never
  * materializes a pair.
  *
  * The matched right row travels as ONE struct (ts + payloads), so the
  * window carries it atomically: a right row whose payload field is
  * legitimately NULL matches as (its ts, NULL) — exactly DuckDB's ASOF —
  * instead of per-column ignoreNulls windows silently stitching fields from
  * DIFFERENT right rows.
  *
  * Skew: partitioning is by `keys`, so a single pathological key (one user
  * with 10^8 events) serializes into one task under [[backward]]/[[forward]].
  * [[backwardSplit]]/[[forwardSplit]] pre-split by a time-range bucket and
  * stitch: within-bucket carry partitioned on (keys, bucket), then a
  * bucket-boundary fix-up from a per-(key, bucket) tail summary — the
  * summary is one row per key-bucket, so the stitch join never re-serializes
  * the hot key. Results are identical to the unsplit plan (property-tested).
  */
object AsofJoin {

  /** Backward (inclusive) as-of join: for each left row, the right row with
    * the greatest `tsCol` <= left's `tsCol` in the same `keys` group.
    * Output = all left columns + `<prefix><tsCol>` (the matched right
    * timestamp) + `<prefix><c>` for each payload column; all NULL when no
    * right row precedes the left row (left-outer semantics, like DuckDB's
    * `ASOF LEFT JOIN`).
    *
    * Right side must be unique per (keys, tsCol) — pre-aggregate duplicates
    * first ("which of two same-instant facts wins" is ambiguous in any
    * engine; DuckDB ASOF has the same contract).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    carry(left, right, keys, tsCol, payloadCols, prefix, fromFuture = false)

  /** Forward (inclusive) as-of join: the right row with the SMALLEST
    * `tsCol` >= left's — "the next fact at or after this event" (e.g. the
    * next price tick, the following maintenance window). Same plan as
    * [[backward]] with the window running from the future: descending sort,
    * right rows still ahead of left rows at equal ts. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    carry(left, right, keys, tsCol, payloadCols, prefix, fromFuture = true)

  /** Skew-resistant [[backward]]: both sides gain `bucketExpr` (any
    * expression over the side's columns that is MONOTONE in `tsCol` —
    * e.g. `floor(col("ts") / 86400)` for daily buckets over epoch seconds),
    * the carry window partitions on (keys, bucket) so a hot key spreads
    * over as many tasks as it has buckets, and left rows with no preceding
    * right row in their OWN bucket take the latest right row from any
    * earlier bucket via the tail summary. Choose the bucket width so
    * hot-key-rows / bucket fits a task; at 100 TB that's the difference
    * between one straggler pinning the stage and an even spread. */
  def backwardSplit(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      bucketExpr: org.apache.spark.sql.Column,
      prefix: String = "asof_"): DataFrame =
    carrySplit(left, right, keys, tsCol, payloadCols, bucketExpr, prefix,
      fromFuture = false)

  /** Skew-resistant [[forward]] — mirror of [[backwardSplit]]: the fix-up
    * takes the EARLIEST right row from any later bucket. */
  def forwardSplit(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      bucketExpr: org.apache.spark.sql.Column,
      prefix: String = "asof_"): DataFrame =
    carrySplit(left, right, keys, tsCol, payloadCols, bucketExpr, prefix,
      fromFuture = true)

  private def carrySplit(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      bucketExpr: org.apache.spark.sql.Column, prefix: String,
      fromFuture: Boolean): DataFrame = {
    val Bkt = "_asof_bkt"
    val lb = left.withColumn(Bkt, bucketExpr)
    val rb = right.withColumn(Bkt, bucketExpr)
    val matchFields = tsCol +: payloadCols

    // pass 1: the ordinary carry, partitioned on (keys, bucket) — the skew
    // split. The fix-up below replaces the WHOLE matched row or none, never
    // stitching fields from different right rows (same atomicity contract
    // as the base plan).
    val within = carry(lb, rb, keys :+ Bkt, tsCol, payloadCols, prefix,
      fromFuture)

    // per-(key, bucket) tail: the right row a later (earlier, if forward)
    // bucket would inherit. max/min of the match struct orders by its first
    // field — the timestamp — so this is "latest/earliest right row in the
    // bucket" without a second window. One row per key-bucket: tiny.
    val tailAgg =
      if (fromFuture) min(struct(matchFields.map(col): _*))
      else max(struct(matchFields.map(col): _*))
    val tails = rb.groupBy((keys :+ Bkt).map(col): _*).agg(tailAgg.as("_tail"))

    // every bucket either side touches, with the carry-in each inherits:
    // the last tail among STRICTLY earlier buckets (later, if forward)
    val allBuckets = lb.select((keys :+ Bkt).map(col): _*)
      .union(rb.select((keys :+ Bkt).map(col): _*)).distinct()
    val bktOrder = if (fromFuture) col(Bkt).desc else col(Bkt).asc
    val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(bktOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIns = allBuckets
      .join(tails, keys :+ Bkt, "left")
      .select((keys :+ Bkt).map(col) :+
        last(col("_tail"), ignoreNulls = true).over(wPrev).as("_in"): _*)

    // fix-up: a left row unmatched within its bucket takes the whole
    // inherited struct. The join key includes the bucket, so even this
    // stitch never re-serializes a hot key; carryIns is one row per
    // key-bucket, so AQE broadcasts it whenever it is small.
    val withinMatch = struct(
      matchFields.map(c => col(s"$prefix$c").as(c)): _*)
    val hasWithin = col(s"$prefix$tsCol").isNotNull
    val resolved = within
      .join(carryIns, keys :+ Bkt, "left")
      .withColumn("_m", when(hasWithin, withinMatch).otherwise(col("_in")))
    val leftExtra = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    resolved.select(
      (keys :+ tsCol).map(col) ++ leftExtra.map(col) ++
        matchFields.map(c => col("_m").getField(c).as(s"$prefix$c")): _*)
  }

  private def carry(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String], prefix: String,
      fromFuture: Boolean): DataFrame = {
    val leftExtra = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val matchFields = tsCol +: payloadCols
    val matchType = StructType(matchFields.map(right.schema(_)))

    // Identical select lists on both sides so the union lines up by position.
    // The struct slot is NULL on left rows (skipped by ignoreNulls) and the
    // whole matched right row on right rows.
    val lTagged = left.select(
      (keys :+ tsCol).map(col) ++
        Seq(lit(1).as("_side")) ++
        leftExtra.map(col) :+
        lit(null).cast(matchType).as("_asof_match"): _*)
    val rTagged = right.select(
      (keys :+ tsCol).map(col) ++
        Seq(lit(0).as("_side")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(matchFields.map(col): _*).as("_asof_match"): _*)

    // side=0 (right) sorts before side=1 (left) at equal ts → inclusive match.
    val ts = if (fromFuture) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ts, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.union(rTagged)
      .select((keys :+ tsCol).map(col) ++ Seq(col("_side")) ++ leftExtra.map(col) :+
        last(col("_asof_match"), ignoreNulls = true).over(w).as("_asof_match"): _*)
      .where(col("_side") === 1)
      .select((keys :+ tsCol).map(col) ++ leftExtra.map(col) ++
        matchFields.map(c => col("_asof_match").getField(c).as(s"$prefix$c")): _*)
  }
}
