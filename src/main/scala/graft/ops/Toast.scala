package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cdc.Envelope

/** O1 / O2 / W1: TOAST-column backfill — replace Debezium's
  * `__debezium_unavailable_value` placeholder in update events with the last
  * known real value for the key.
  *
  * Batch form mirrors the reference's SQL OVER-aggregation job exactly
  * (`postgres-toast-backfill/.../SqlOverAggJob.java:109-135`): a
  * `LAST_VALUE(NULLIF(col, sentinel)) IGNORE NULLS` latch per key, with a
  * CASE that preserves genuine NULLs (only the sentinel is substituted).
  * The keyed-process-function variant (`DataStreamJob.java:60-101`) lives in
  * `graft.streaming.ToastStream`.
  *
  * Scale: single shuffle on the key + per-partition sort — the minimal plan
  * for any per-key ordered latch. The running `last` frame
  * (unbounded-preceding → current row) evaluates incrementally, O(1) per row.
  */
object Toast {

  /** Backfill `targetCol` (a top-level column) in-place.
    *
    * @param ord strictly increasing per key — LSN, offset, or proctime.
    */
  def backfill(df: DataFrame, keyCol: String, ord: Column, targetCol: String,
               sentinel: String = Envelope.ToastSentinel): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val latch = last(nullif(col(targetCol), lit(sentinel)), ignoreNulls = true).over(w)
    // CASE preserves genuine NULL vs sentinel (`SqlOverAggJob.java:117-127`)
    df.withColumn(targetCol,
      when(col(targetCol) === sentinel, latch).otherwise(col(targetCol)))
  }

  /** W1's literal frame: `RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND
    * CURRENT ROW` (`SqlOverAggJob.java:121-124`) — the latch only reaches
    * back `rangeDays`; older values age out. `ts` must be a timestamp.
    */
  def backfillRange(df: DataFrame, keyCol: String, tsCol: String, targetCol: String,
                    rangeDays: Int = 30,
                    sentinel: String = Envelope.ToastSentinel): DataFrame = {
    // epoch MICROS as the range key: second-truncated keys create peer
    // groups whose internal order (and thus last_value) is engine-dependent
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-rangeDays.toLong * 86400L * 1000000L, Window.currentRow)
    val latch = last(nullif(col(targetCol), lit(sentinel)), ignoreNulls = true).over(w)
    df.withColumn(targetCol,
      when(col(targetCol) === sentinel, latch).otherwise(col(targetCol)))
  }

  /** O2: the SQL PTF's EXACT state machine
    * (`SqlPtfJob.java:131-165, ToastBackfillFunction.eval`), batch form —
    * the one semantic the OVER-agg latch lacks is the DELETE RESET:
    * `op='d'` clears the per-key state, so a sentinel arriving after a
    * delete backfills NULL, not the pre-delete value. Faithful port of the
    * switch: c/r set state to the value AS-IS (even a sentinel), u sets it
    * only for non-sentinel values (a NULL update value sets NULL — `equals`
    * on the sentinel constant), d resets to null; only a sentinel-valued
    * UPDATE substitutes.
    *
    * Declarative spelling: state-setting events become a non-null struct
    * (struct-wrapping distinguishes "state is NULL" from "no state
    * change"); the per-key running `last(ignoreNulls)` IS the state at each
    * row. Same single-shuffle + per-key-sort plan as [[backfill]]. Spark
    * has no `FROM Fn(TABLE t PARTITION BY k)` PTF syntax, so this library
    * form + the windowed SQL spelling (SqlIngestParitySpec) are the
    * SQL-surface mapping of the reference's PTF invocation
    * (`SqlPtfJob.java:116-126`).
    */
  def backfillPtf(df: DataFrame, keyCol: String, ord: Column, opCol: String,
                  targetCol: String, sentinel: String = Envelope.ToastSentinel): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val w = Window.partitionBy(col(keyCol)).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(targetCol)
    val setter = when(col(opCol) === "d", struct(lit(null).cast(StringType).as("v")))
      .when(col(opCol).isin("c", "r"), struct(v.as("v")))
      .when(col(opCol) === "u" && !(v <=> sentinel), struct(v.as("v")))
    val state = last(setter, ignoreNulls = true).over(w).getField("v")
    df.withColumn(targetCol,
      when(col(opCol) === "u" && v === sentinel, state).otherwise(v))
  }

  /** Backfill a field inside the envelope's `after` struct — the reference's
    * actual call shape (`after.biography`), rebuilding the ROW with one field
    * replaced (P3, `SqlOverAggJob.java:113-129`).
    */
  def backfillEnvelope(env: DataFrame, keyField: String, field: String,
                       sentinel: String = Envelope.ToastSentinel): DataFrame = {
    val key = Envelope.keyOf(col("after"), col("before"), keyField)
    val w = Window.partitionBy(key).orderBy(col("source.lsn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cur = col("after").getField(field)
    val latch = last(nullif(cur, lit(sentinel)), ignoreNulls = true).over(w)
    env.withColumn("after",
      when(col("after").isNull, col("after"))
        .otherwise(col("after").withField(field,
          when(cur === sentinel, latch).otherwise(cur))))
  }
}
