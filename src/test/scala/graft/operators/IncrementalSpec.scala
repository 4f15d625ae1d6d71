package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental-maintenance + audit invariants: merging rollup partials IS
  * recomputing, SCD2 intervals tile each key's timeline, the snapshot diff
  * finds exactly the injected changes, the check suite counts exactly the
  * injected violations, and PMI ranks the designed collocation first. */
class IncrementalSpec extends SparkSpec {

  test("mergeRollup: partials merged == one-shot recompute, any split") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), pmod(col("event_id"), lit(7)).as("day"),
        col("value"))
    val full = Incremental.rollupPartials(ev, Seq("event_type", "day"), "value")
      .orderBy("event_type", "day").collect().toSeq
    for (cut <- Seq(0, 3, 7)) { // empty-standing, mid, empty-batch splits
      val a = Incremental.rollupPartials(
        ev.where(col("day") < cut), Seq("event_type", "day"), "value")
      val b = Incremental.rollupPartials(
        ev.where(col("day") >= cut), Seq("event_type", "day"), "value")
      val merged = Incremental.mergeRollup(a, b, Seq("event_type", "day"))
        .orderBy("event_type", "day").collect().toSeq
      assert(merged == full, s"cut=$cut diverged")
    }
  }

  test("mergeRollup: merge is associative across three batches") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), pmod(col("event_id"), lit(5)).as("day"),
        col("value"))
    def part(lo: Int, hi: Int) = Incremental.rollupPartials(
      ev.where(col("day") >= lo && col("day") < hi),
      Seq("event_type", "day"), "value")
    val leftFold = Incremental.mergeRollup(
      Incremental.mergeRollup(part(0, 2), part(2, 4), Seq("event_type", "day")),
      part(4, 5), Seq("event_type", "day"))
    val rightFold = Incremental.mergeRollup(part(0, 2),
      Incremental.mergeRollup(part(2, 4), part(4, 5), Seq("event_type", "day")),
      Seq("event_type", "day"))
    assert(leftFold.orderBy("event_type", "day").collect().toSeq ==
      rightFold.orderBy("event_type", "day").collect().toSeq)
  }

  test("scd2: runs collapse, intervals tile, first-NULL attr survives") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "A"), // same value: one run
      (1L, 3L, 3L, "B"), (1L, 4L, 4L, "A"), // back to A = NEW version
      (2L, 5L, 5L, null.asInstanceOf[String]) // first value NULL (rn guard)
    ).toDF("k", "ts", "event_id", "attr")
    val got = Incremental.scd2(log, "k", Seq("ts", "event_id"), "attr")
      .orderBy("k", "version")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getBoolean(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (1L, Some("A"), 1L, 3L, false, 1),
      (1L, Some("B"), 3L, 4L, false, 2),
      (1L, Some("A"), 4L, -1L, true, 3),
      (2L, None, 5L, -1L, true, 1)))
  }

  test("scd2: every event's attr equals its covering version's attr") {
    import spark.implicits._
    val ev = graft.core.EventTs.toNanos(
        spark.read.parquet(s"$sfDir/events.parquet"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val v = Incremental.scd2(ev, "user_id", Seq("ts", "event_id"),
      "event_type")
    // join each event to the version interval containing its ts; the
    // covering version must carry the event's type (intervals that tile
    // and order correctly are exactly what makes this hold)
    val covered = ev.alias("e").join(v.alias("v"),
      col("e.user_id") === col("v.user_id") &&
        col("e.ts") >= col("v.valid_from") &&
        (col("v.valid_to").isNull || col("e.ts") < col("v.valid_to")))
    // ties in ts (same-nanos events of one user) can straddle a version
    // boundary, so compare at the grain the operator defines: strictly
    // ordered rows. The synthetic events have distinct nanos per user.
    val bad = covered.where(col("e.event_type") =!= col("v.event_type"))
    assert(bad.count() == 0)
    // interval count conservation: versions = type-change points per user
    val expected = ev.selectExpr("user_id", "ts", "event_id", "event_type")
      .withColumn("prev", lag("event_type", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("ts", "event_id")))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
      .count()
    assert(v.count() == expected)
  }

  test("tableDiff: finds exactly the injected I/U/D set") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val v2 = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val got = Incremental.tableDiff(v1, v2, Seq("k"), Seq("name", "bal"))
      .orderBy("k").collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("U", "name", 2L), ("D", "name,bal", 3L), ("I", "name,bal", 4L)))
  }

  test("tableDiff: identical snapshots diff to nothing; NULLs compare null-safely") {
    import spark.implicits._
    val v = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("k", "name")
    assert(Incremental.tableDiff(v, v, Seq("k"), Seq("name")).count() == 0)
    val v2 = Seq((1L, "now-set"), (2L, null.asInstanceOf[String]))
      .toDF("k", "name")
    val ops = Incremental.tableDiff(v, v2, Seq("k"), Seq("name"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(ops.toSeq == Seq(("U", 1L), ("U", 2L))) // NULL↔set both real changes
  }

  test("DataChecks.audit: counts exactly the injected violations") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("F"), 10.0, Some(100L)),
      (Some(2L), Some("O"), 20.0, Some(999L)), // FK orphan
      (Some(2L), Some("Z"), -5.0, Some(100L)), // dup key, bad status, low range
      (None, Some("F"), 1e9, None)             // null key, high range, null FK ok
    ).toDF("k", "status", "amount", "fk")
    val dim = Seq(100L, 101L).toDF("id")
    val got = DataChecks.audit(df, Seq(
        DataChecks.NotNull("k_not_null", "k"),
        DataChecks.Unique("k_unique", Seq("k")),
        DataChecks.AcceptedValues("status_ok", "status", Seq("F", "O")),
        DataChecks.InRange("amount_range", "amount", 0.0, 1000.0),
        DataChecks.Predicate("amount_positive", col("amount") > 0),
        DataChecks.ForeignKey("fk_ok", "fk", dim, "id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      ("amount_positive", 1L, false),
      ("amount_range", 2L, false),
      ("fk_ok", 1L, false),
      ("k_not_null", 1L, false),
      ("k_unique", 1L, false),
      ("status_ok", 1L, false)))
  }

  test("DataChecks.audit: clean table passes every check; empty table too") {
    import spark.implicits._
    val df = Seq((1L, "F"), (2L, "O")).toDF("k", "status")
    val checks = Seq(
      DataChecks.NotNull("k_not_null", "k"),
      DataChecks.Unique("k_unique", Seq("k")),
      DataChecks.AcceptedValues("status_ok", "status", Seq("F", "O")))
    assert(DataChecks.audit(df, checks).where(!col("passed")).count() == 0)
    val empty = df.where(col("k") < 0)
    val onEmpty = DataChecks.audit(empty, checks).collect()
    assert(onEmpty.length == 3 && onEmpty.forall(_.getBoolean(2)))
  }

  test("dailyCountAnomalies: hand-computed median/MAD flags") {
    import spark.implicits._
    // type A: 10,10,10,10,100 → med 10, MAD 0 → only the 100-day flags
    // type B: 1,2,3,4,5 → med 3, MAD 1 → no |dev| > 2·1 (max dev is 2)
    val rows =
      (Seq.fill(10)((1, "A")) ++ Seq.fill(10)((2, "A")) ++
       Seq.fill(10)((3, "A")) ++ Seq.fill(10)((4, "A")) ++
       Seq.fill(100)((5, "A")) ++
       (1 to 1).map(_ => (1, "B")) ++ (1 to 2).map(_ => (2, "B")) ++
       (1 to 3).map(_ => (3, "B")) ++ (1 to 4).map(_ => (4, "B")) ++
       (1 to 5).map(_ => (5, "B")))
    val ev = rows.toDF("day", "event_type")
    val got = EventOps.dailyCountAnomalies(ev, "event_type", col("day"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", 5L, 100L, 10L, 0L)))
  }

  test("timeToConvert: first-touch channel and whole-second delta, " +
      "non-converters and pre-touch converters excluded") {
    import spark.implicits._
    val G = 1000000000L // nanos per second
    val ev = Seq(
      (1L, 10 * G, 1L, "click", 0.0), (2L, 12 * G, 1L, "view", 0.0),
      (3L, 50 * G, 1L, "purchase", 9.0),       // u1: click first, Δ40s
      (4L, 20 * G, 2L, "view", 0.0),           // u2: never converts
      (5L, 15 * G, 3L, "purchase", 1.0),       // u3: converts BEFORE the
      (6L, 20 * G, 3L, "view", 0.0),           //     first touch → excluded
      (7L, 30 * G, 4L, "purchase", 2.0)        // u4: no touch at all
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.timeToConvert(ev, "user_id", Seq("click", "view"),
        "purchase")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "click", 40L)))
  }

  test("triangleCount: K4 + path, with duplicate/reversed/self-loop noise") {
    import spark.implicits._
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val noise = Seq((2L, 1L), (3L, 1L), (5L, 5L)) // reversed dups + self-loop
    val path = Seq((5L, 6L), (6L, 7L))
    val edges = (k4 ++ noise ++ path).toDF("a", "b")
    val r = Components.triangleCount(edges, "a", "b").collect().head
    // K4: 6 edges, 4 triangles, Σ C(3,2)=12 wedges; path adds 2 edges,
    // 1 wedge, 0 triangles → closure = floor(3·4·1e6/13 + 0.5)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (8L, 13L, 4L, 923077L))
  }

  test("triangleCount: triangle-free bipartite graph counts zero; " +
      "edgeless input yields NULL closure") {
    import spark.implicits._
    val bip = (for (a <- 1 to 3; b <- 4 to 6) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val r = Components.triangleCount(bip, "a", "b").collect().head
    assert(r.getLong(2) == 0L && !r.isNullAt(3)) // wedges exist, closure 0
    assert(r.getLong(3) == 0L)
    val empty = Seq((1L, 1L)).toDF("a", "b") // only a self-loop → no edges
    val e = Components.triangleCount(empty, "a", "b").collect().head
    assert(e.getLong(0) == 0L && e.isNullAt(3))
  }

  test("pmiCollocations: the designed collocation ranks first") {
    import spark.implicits._
    // "aa bb" co-occurs 6 times and aa/bb never appear apart; filler
    // tokens pair arbitrarily — the dependent pair must out-PMI them
    val docs = (Seq.fill(6)("aa bb") ++
      Seq("cc dd ee ff gg", "dd cc ff ee gg", "ee gg cc ff dd",
        "ff ee gg dd cc", "gg ff dd cc ee", "cc ee dd gg ff"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text", minCount = 5, k = 3)
      .orderBy("rnk").collect()
    assert(got.head.getString(0) == "aa bb")
    assert(got.head.getLong(1) == 6L) // c12
    assert(got.head.getLong(4) > 0L)  // pmi_micro strictly positive
  }

  test("scd2 + as-of enrichment: boundary fact takes the NEW version, " +
      "pre-history fact takes none") {
    import spark.implicits._
    val dimSrc = Seq( // regime A at ts 10, regime B at ts 30
      (1L, 10L, 1L, "A"), (1L, 30L, 2L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val dim = graft.operators.Incremental.scd2(dimSrc, "user_id",
      Seq("ts", "event_id"), "event_type")
    val facts = Seq( // before history, mid-A, exactly at B's start, after
      (1L, 5L, 10L), (1L, 20L, 11L), (1L, 30L, 12L), (1L, 99L, 13L)
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.AsofJoin.backward(facts,
        dim.select(col("user_id"), col("valid_from").as("ts"),
          col("event_type").as("regime"), col("version")),
        Seq("user_id"), "ts", Seq("regime", "version"))
      .select(col("event_id"), col("asof_regime"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(10L -> None, 11L -> Some("A"),
      12L -> Some("B"), 13L -> Some("B")))
  }

  test("kAnonymityViolations: flags exactly the under-k classes") {
    import spark.implicits._
    val df = (Seq.fill(8)(("US", "A")) ++ Seq.fill(3)(("US", "B")) ++
      Seq.fill(1)(("DE", "A"))).toDF("country", "seg")
    val got = graft.operators.DataChecks.kAnonymityViolations(
        df, Seq("country", "seg"), k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("US", "B") -> 3L, ("DE", "A") -> 1L))
    // k = 2 passes every class of size >= 2
    assert(graft.operators.DataChecks.kAnonymityViolations(
      df, Seq("country", "seg"), k = 2).count() == 1L) // only the singleton
  }

  test("numericProfile: exact bins, null bucket, constant column, conservation") {
    import spark.implicits._
    val df = Seq(
      (0.0, 5.0, Some(1.0)), (10.0, 5.0, Some(2.0)), (5.0, 5.0, None),
      (9.99, 5.0, Some(3.0)), (1.0, 5.0, Some(4.0))
    ).toDF("a", "c", "n")
    val got = graft.operators.DataChecks.numericProfile(
        df, Seq("a", "c", "n"), bins = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a ∈ [0,10]: 0.0→bin 0, 1.0→bin 1, 5.0→bin 5, 9.99→bin 9, 10.0→bin 9
    assert(got(("a", 0L)) == 1L && got(("a", 1L)) == 1L &&
      got(("a", 5L)) == 1L && got(("a", 9L)) == 2L)
    // constant column: everything in bin 0
    assert(got(("c", 0L)) == 5L)
    // null lands in bin −1 (unpivot must RETAIN nulls for this to hold)
    assert(got(("n", -1L)) == 1L)
    // per-column conservation: every row lands in exactly one bucket
    Seq("a", "c", "n").foreach { c =>
      assert(got.collect { case ((`c`, _), v) => v }.sum == 5L, c)
    }
  }
}
