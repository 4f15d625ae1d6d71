package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (TESTDATA.md).
  *
  * Greenfield — the reference has no streaming surface at all (SURVEY §2.8);
  * this is the engine's scale-path for continuous ingestion. Every transform
  * is defined on DataFrame so the SAME code runs batch (backfill) and
  * streaming (live) — the Structured Streaming contract.
  *
  * Scale notes: watermarks bound state (no unbounded window buffers); the
  * windowed aggregate shuffles once on (window, key) with partial aggregation
  * map-side; sessionization state lives in the state store partitioned by
  * user_id — at 1000 executors that's hash-distributed, nothing driver-side.
  */
object EventStreams {

  /** events.parquet schema. `ts` arrives as TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong` (set in Sessions) it reads as
    * LongType nanos — normalize with exact integer µs division. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Per-user live-session state (top-level visibility: the state-store
    * encoder's generated code needs a public constructor). */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Nanos-long `ts` → TimestampType (exact integer division, see q28). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Continuous parquet-directory source (files appended by an ingest job). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    withEventTime(spark.readStream.schema(rawSchema).parquet(dir))

  /** Tumbling/sliding windowed aggregate with a watermark: the streaming twin
    * of q28. Late rows beyond `watermark` are dropped; state for closed
    * windows is evicted — bounded memory at any scale. */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "5 minutes", slide: Option[String] = None): DataFrame = {
    val w = slide.map(s => window(col("ts"), windowLen, s))
      .getOrElse(window(col("ts"), windowLen))
    events.withWatermark("ts", watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Session windows via the built-in gap-based session_window — merges
    * events per user whose gaps are < `gap`. Codegen-friendly; preferred
    * over custom state when "session" means simple gap semantics. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("total_value"))

  /** Custom stateful sessionization with flatMapGroupsWithState — for
    * semantics session_window can't express (emit-on-timeout, custom merge).
    * State: one fixed-size record per live user key; event-time timeout
    * tied to the watermark evicts idle sessions. */
  def statefulSessions(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      def finish(st: SessionState) = SessionSummary(userId,
        new Timestamp(st.start), new Timestamp(st.end), st.n, st.total)

      if (state.hasTimedOut) {
        val out = state.getOption.map(finish)
        state.remove()
        out.iterator
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionSummary]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(st) if t - st.end <= gapMs =>
              cur = Some(st.copy(end = math.max(st.end, t), n = st.n + 1,
                total = st.total + e.value))
            case Some(st) =>
              closed ::= finish(st)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { st =>
          state.update(st)
          state.setTimeoutTimestamp(st.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Parquet sink with checkpointing (exactly-once file sink). */
  def writeParquet(df: DataFrame, outDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()) =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode(OutputMode.Append)
      .start()
}
