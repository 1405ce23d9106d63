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

  /** `events.ts` arrives as parquet TIMESTAMP(MICROS) in current test data
    * (reads natively as TimestampType) but was TIMESTAMP(NANOS) in earlier
    * driver generations — a physical type Spark rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as raw nanos via
    * `spark.sql.legacy.parquet.nanosAsLong=true` — set ONCE at session build
    * (see [[graft.Sessions]]), never mutated here. Both shapes surface as a
    * regular microsecond TimestampType, the same truncation DuckDB applies
    * (its TIMESTAMP is micros), so oracle values align either way. The
    * branch is on the file's READ schema, not a config: the data decides.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true (see graft.Sessions)")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy nanos-as-long file
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // native micros, no timezone: surface as TimestampType like the
        // legacy path did (session tz is pinned UTC, so the cast reads the
        // wall-clock as the same epoch instant DuckDB's naive TIMESTAMP
        // arithmetic produces — and epoch functions like unix_millis apply)
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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
