package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated parquet at /root/testdata/sf*.
  * See TESTDATA.md. Every `SparkEntry.queries` entry receives the sf dir and
  * reads through here so the scan always goes through the parquet V2 source
  * (predicate pushdown + column pruning apply).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects outright
    * (PARQUET_TYPE_ILLEGAL). It is read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong=true` — set ONCE at session build
    * (see [[graft.Sessions]]), never mutated here — and surfaced as a regular
    * microsecond TimestampType, the same truncation DuckDB applies (its
    * TIMESTAMP is micros), so oracle values align.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true (see graft.Sessions)")
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
