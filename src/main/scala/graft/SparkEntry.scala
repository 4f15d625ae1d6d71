package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[QueryCatalog]]; this object just adapts it. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the reference's signature semantic: window-based proportional cost
    * allocation (SURVEY §2.5 W-1). */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.all.find(_.name == "q10_window_alloc").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryCatalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
