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

  /** Envelope stream → signed retraction rows — the dataflow behind Flink's
    * retract-mode aggregates (the changelog-mode machinery SURVEY §4 maps to
    * the library level). Every non-null `after` image contributes +1, every
    * non-null `before` image −1: an insert is (+after), a delete (−before),
    * an update the pair (−before, +after) — Flink's -U/+U retraction pair as
    * data. Output: the image struct's fields flattened, plus `w`.
    */
  def retractions(env: DataFrame, beforeCol: String = "before",
                  afterCol: String = "after"): DataFrame =
    env.filter(col(afterCol).isNotNull)
      .select(col(afterCol + ".*"), lit(1L).as("w"))
      .unionByName(
        env.filter(col(beforeCol).isNotNull)
          .select(col(beforeCol + ".*"), lit(-1L).as("w")))

  /** Changelog-aware aggregation over [[retractions]] output: maintains
    * count/sum per group WITHOUT rebuilding the base table — updates and
    * deletes are subtracted, not re-scanned. Decomposable aggregates only
    * (count = Σw, sum = Σ value·w); groups retracted to zero live rows drop
    * out. ONE hash aggregate with map-side partial combine: shuffle volume
    * is bounded by group cardinality — the property that makes incremental
    * view maintenance over a 100 TB changelog feasible.
    *
    * `valueCol` should be exact-typed (cast doubles to DECIMAL first):
    * retraction arithmetic relies on a − a == 0, which float accumulation
    * orders don't guarantee.
    */
  def retractAgg(contributions: DataFrame, groupCols: Seq[String],
                 valueCol: Column): DataFrame =
    retractPartials(contributions, groupCols, valueCol)
      .filter(col("n_live") > 0)

  /** Unfiltered signed partials — the MERGEABLE form of [[retractAgg]]:
    * (group, n_live = Σw, sum_value = Σ value·w). Partials from disjoint
    * change batches add, which is what makes the aggregate incrementally
    * maintainable (see [[mergeRetractState]]).
    */
  def retractPartials(contributions: DataFrame, groupCols: Seq[String],
                      valueCol: Column): DataFrame =
    contributions
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("w")).as("n_live"),
        sum(valueCol * col("w")).as("sum_value"))

  /** Incremental view maintenance step: fold one change batch's partials
    * into the running state — union + re-aggregate (both inputs are already
    * one row per group, so the merge shuffles only group-cardinality rows).
    * Fully-retracted groups are dropped; they re-enter from zero if later
    * inserts revive them. Query the maintained state with
    * `.filter(n_live > 0)` semantics already applied.
    */
  def mergeRetractState(state: DataFrame, deltaPartials: DataFrame,
                        groupCols: Seq[String]): DataFrame =
    state.unionByName(deltaPartials)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_live")).as("n_live"),
        sum(col("sum_value")).as("sum_value"))
      .filter(col("n_live") =!= 0)
}
