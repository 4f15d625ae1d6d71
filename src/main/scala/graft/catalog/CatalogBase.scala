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
}
