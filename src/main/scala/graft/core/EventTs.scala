package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Engine-internal time convention: `events.ts` is epoch NANOSECONDS as
  * BIGINT.
  *
  * The driver's testdata has shipped `ts` two ways across rounds: as parquet
  * TIMESTAMP(NANOS) (which `spark.sql.legacy.parquet.nanosAsLong` reads as
  * LongType nanos — see [[Sessions]]) and as TIMESTAMP(MICROS) (which Spark
  * reads as TIMESTAMP_NTZ / TIMESTAMP). All engine code and every spec does
  * exact integer arithmetic on nanos (`ts div 1000` → µs, `div 86400e9` →
  * day), so this boundary adapter folds both physical encodings into the one
  * internal type at load time.
  *
  * The conversion is exact: `unix_micros` is integer µs, ×1000 is integer ns
  * (no double round-trip), and the session timezone is pinned UTC in
  * [[Sessions]] so the NTZ→instant cast is the identity on the wall clock the
  * generator wrote. Downstream this is a plain projection — filters on other
  * columns still reach the parquet scan.
  */
object EventTs {
  /** Fold a Timestamp/TimestampNTZ `ts` column to epoch-nanos BIGINT; no-op
    * when `ts` is absent or already integral. */
  def toNanos(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }
}
