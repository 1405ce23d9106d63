package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing for co-located joins at cluster scale.
  *
  * A join between two tables bucketed (and sorted) on the join key into the
  * same bucket count needs NO shuffle exchange: every executor reads
  * matching bucket files side by side and sort-merge joins them directly.
  * At 100 TB that turns the recurring fact⋈fact join cost from
  * "shuffle both sides every query" into "pay one bucketed write, then every
  * subsequent join is exchange-free" — the standard layout for a fact table
  * joined on the same key by many queries (the CDC parent/child streams
  * keyed by order id are exactly that shape).
  *
  * Spark-native: `DataFrameWriter.bucketBy` + catalog tables; the planner's
  * `EnsureRequirements` recognizes `HashPartitioning(bucket cols)` from the
  * bucketed scan and skips the exchange (verify with
  * `.explain("formatted")` — no `Exchange` above either scan;
  * BucketingSpec asserts it).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (overwriting). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two same-bucketed catalog tables. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
