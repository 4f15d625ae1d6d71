package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AsofJoin.backward against hand-computed matches: inclusive same-instant
  * ties, no-prior-row NULLs, key isolation, and equivalence with the naive
  * (pair-materializing) formulation it replaces at scale. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val quotes = Seq( // (sym, ts, px) — the "right" fact stream
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "ts", "px")

  private lazy val trades = Seq( // (trade_id, sym, ts, qty)
    (1L, "A", 9L, 5.0),   // before any quote → NULL
    (2L, "A", 20L, 6.0),  // exactly at a quote → inclusive match (px=2)
    (3L, "A", 25L, 7.0),  // between quotes → px=2
    (4L, "A", 99L, 8.0),  // after last → px=3
    (5L, "B", 16L, 1.0),  // B's only quote; A's quotes must not leak
    (6L, "C", 50L, 2.0)   // key with no right rows at all → NULL
  ).toDF("trade_id", "sym", "ts", "qty")

  test("backward as-of: tie-inclusive, NULL before first, key-isolated") {
    val got = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_ts", "asof_px")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      (1L, None, None),
      (2L, Some(20L), Some(2.0)),
      (3L, Some(20L), Some(2.0)),
      (4L, Some(30L), Some(3.0)),
      (5L, Some(15L), Some(9.0)),
      (6L, None, None)))
  }

  test("left columns and row count survive unchanged (no multiplication)") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq ==
      Seq("sym", "ts", "trade_id", "qty", "asof_ts", "asof_px"))
    assert(out.agg(round(sum("qty"), 2)).head().getDouble(0) == 29.0)
  }

  test("forward as-of: next quote at-or-after, NULL past the last") {
    val got = AsofJoin.forward(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_ts", "asof_px")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(1.0)), // before any quote → the first one
      (2L, Some(20L), Some(2.0)), // exact tie inclusive
      (3L, Some(30L), Some(3.0)),
      (4L, None, None),           // after last quote → nothing ahead
      (5L, None, None),           // B's quote at 15 < 16 → nothing ahead
      (6L, None, None)))
  }

  test("NULL payload on the matched right row stays NULL — no field stitching") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // R(ts=10, px=1.0), R(ts=20, px=NULL); left at ts=25 must match (20, NULL)
    // — per-column ignoreNulls windows would wrongly return (20, 1.0)
    val schema = StructType(Seq(StructField("sym", StringType),
      StructField("ts", LongType), StructField("px", DoubleType)))
    val q = spark.createDataFrame(
      java.util.Arrays.asList(Row("A", 10L, 1.0), Row("A", 20L, null)), schema)
    val l = Seq((1L, "A", 25L)).toDF("trade_id", "sym", "ts")
    val r = AsofJoin.backward(l, q, Seq("sym"), "ts", Seq("px"))
      .select("asof_ts", "asof_px").head()
    assert(r.getLong(0) == 20L && r.isNullAt(1))
  }

  test("matches the naive range-join + max-dedup formulation") {
    val naive = trades.as("l")
      .join(quotes.as("r"),
        col("l.sym") === col("r.sym") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("trade_id"))
      .agg(max(struct(col("r.ts"), col("r.px"))).as("m"))
      .select(col("trade_id"), col("m.ts").as("asof_ts"), col("m.px").as("asof_px"))
    val fast = AsofJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .select("trade_id", "asof_ts", "asof_px")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  // ---- skew pre-split variants ----

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.select("trade_id", "asof_ts", "asof_px").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1).toSeq

  test("backwardSplit/forwardSplit equal the unsplit plans (incl. boundaries)") {
    // bucket width 16 puts quotes and trades in different buckets — the
    // carry-in stitch is exercised, not just the within-bucket path
    val bkt = floor(col("ts") / 16)
    assert(normalize(AsofJoin.backwardSplit(
        trades, quotes, Seq("sym"), "ts", Seq("px"), bkt)) ==
      normalize(AsofJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("px"))))
    assert(normalize(AsofJoin.forwardSplit(
        trades, quotes, Seq("sym"), "ts", Seq("px"), bkt)) ==
      normalize(AsofJoin.forward(trades, quotes, Seq("sym"), "ts", Seq("px"))))
  }

  test("split: one pathological key spreads over buckets and stays correct") {
    // ONE key holds every row — the unsplit plan serializes this into a
    // single window task; the split plan's exchange must partition on
    // (key, bucket) so the hot key fans out
    val n = 20000
    val hotL = spark.range(n).select(col("id").as("trade_id"),
      lit("HOT").as("sym"), (col("id") * 3 + 1).as("ts"), lit(1.0).as("qty"))
    val hotR = spark.range(n / 10).select(lit("HOT").as("sym"),
      (col("id") * 30).as("ts"), col("id").cast("double").as("px"))
    val bkt = floor(col("ts") / 1000)
    val split = AsofJoin.backwardSplit(hotL, hotR, Seq("sym"), "ts",
      Seq("px"), bkt)
    val base = AsofJoin.backward(hotL, hotR, Seq("sym"), "ts", Seq("px"))
    // correctness under skew: identical to the unsplit plan
    assert(split.exceptAll(base).isEmpty && base.exceptAll(split).isEmpty)
    // the within-carry exchange partitions on the bucket column — the hot
    // key is no longer a single hash partition
    val plan = split.queryExecution.executedPlan.toString
    assert(plan.contains("_asof_bkt"))
    assert(plan.contains("hashpartitioning(sym"))
  }
}
