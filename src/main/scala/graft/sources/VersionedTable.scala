package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only versioned snapshots, partitioned by an auto-incremented `version`.
  *
  * Re-expresses the reference's hand-rolled historical-table mechanism
  * (`stage_1_hcp_channel_all_hardcode.py:208-222,1110-1125`): read current
  * `max(version)` from the existing table, stamp `version = max+1` on the new
  * snapshot, append with `partitionBy("version")`. Not concurrent-write safe —
  * faithful to the reference by design (SURVEY §7.3.5); a production deployment
  * would swap the path for a transactional table format without changing callers.
  *
  * Scale notes: `version` is a partition column, so `latestVersion` prunes to
  * directory listing + a metadata-only scan, and readers of one snapshot never
  * touch earlier ones. `coalesce(8)` mirrors the reference's output-file sizing
  * (S1:222) — at 100 TB you'd raise `outputFiles` to keep files ~128MB-1GB.
  */
final class VersionedTable(spark: SparkSession, path: String, outputFiles: Int = 8) {

  def exists: Boolean =
    try { spark.read.parquet(path); true } catch { case _: Exception => false }

  /** Current max version, or None if the table doesn't exist yet (S1:209-211). */
  def latestVersion: Option[Long] =
    if (!exists) None
    else
      spark.read.parquet(path)
        .agg(max(col("version").cast("long")).as("v"))
        .head() match {
          case r if r.isNullAt(0) => None
          case r                  => Some(r.getLong(0))
        }

  /** Stamp version = max+1 and append (S1:212-222). Returns the written version. */
  def snapshot(df: DataFrame): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(1L)
    df.withColumn("version", lit(v))
      .coalesce(outputFiles)
      .write.partitionBy("version").mode(SaveMode.Append).parquet(path)
    v
  }

  /** Read one snapshot (partition-pruned scan). */
  def at(version: Long): DataFrame =
    spark.read.parquet(path).where(col("version") === version)

  def latest: DataFrame =
    latestVersion.map(at).getOrElse(spark.emptyDataFrame)
}
