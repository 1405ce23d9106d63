package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O8 / A3 / S2 / S3: changelog → current-table materialization — the
  * "latest row per key wins" semantics Flink's planner provides implicitly for
  * `debezium-json` / `upsert-kafka` tables
  * (`KafkaChangelogToUpsertJob.java:23-60`, `KafkaUpsertJob.java:23-38`).
  *
  * Scale notes (100 TB): one shuffle on the key — unavoidable and optimal for
  * a keyed reduction. `latestByKey` uses `max_by(struct(*), ord)`, which is a
  * hash aggregate with map-side partial combine: each input partition reduces
  * to ≤ |distinct keys| rows BEFORE the shuffle, so shuffle volume is bounded
  * by key cardinality, not event count. Prefer it over the window-function
  * form (`row_number() = 1`), which shuffles every event row and sorts each
  * partition. The window form is kept for cases needing the full row rank.
  */
object Materialize {

  /** Latest row per key by `ord` (strictly monotone per key — e.g. LSN or
    * Kafka offset). Emits one row per key with the original columns.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], ord: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, ord).as("_latest"))
      .select(col("_latest.*"))
  }

  /** Window-function variant — same result, rank available; more shuffle-heavy. */
  def latestByKeyWindow(df: DataFrame, keyCols: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord.desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** S2→S3: materialize a normalized changelog (see `Envelope.normalize`) into
    * the current table state: keep the latest change per key, drop keys whose
    * latest op is a delete, and project the `after` image.
    */
  def changelogToTable(normalized: DataFrame, ord: Column): DataFrame =
    latestByKey(normalized, Seq("key"), ord)
      .filter(col("op") =!= "d")
      .select(col("key"), col("after.*"))

  /** O7: CDC event dedup — Debezium is at-least-once, so the same (key, lsn)
    * can arrive twice (`table.exec.source.cdc-events-duplicate=true`,
    * `KafkaChangelogJob.java:13`). Exact-duplicate drop on the identifying pair.
    */
  def dedupByLsn(normalized: DataFrame): DataFrame =
    normalized.dropDuplicates("key", "lsn", "op")

  /** Changelog → SCD2 HISTORY table (every version kept, not just the
    * latest): each change row becomes a version with a validity range
    * `[ord, next ord)` — `valid_to` null and `is_current` true on the
    * newest version per key; a delete closes the history (its own row
    * carries the delete op for the consumer to filter or keep as an end
    * marker). The warehouse-side complement of [[latestByKey]]: Debezium →
    * slowly-changing-dimension loads are this exact shape.
    *
    * One keyed window (single shuffle + per-key sort). `ord` must be
    * strictly monotone per key (LSN, offset).
    */
  def scd2History(df: DataFrame, keyCols: Seq[String], ord: Column,
                  validFrom: String = "valid_from", validTo: String = "valid_to",
                  isCurrent: String = "is_current"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord)
    df.withColumn(validFrom, ord)
      .withColumn(validTo, lead(ord, 1).over(w))
      .withColumn(isCurrent, col(validTo).isNull)
  }
}
