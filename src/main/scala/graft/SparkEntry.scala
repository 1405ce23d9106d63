package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area query maps; every SQL-expressible entry
  * has a DuckDB oracle with identical column names and deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): denormalized purchase orders —
    * orders ⋈ lineitem → one doc per order with a sorted array of lines
    * (the reference's target query, poc.md:14-27). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.queries("q_denorm_orders_lines")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ TxQueries.queries ++ ScaleQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracle ++ TxQueries.oracle ++ ScaleQueries.oracle
}
