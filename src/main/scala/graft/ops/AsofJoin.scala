package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic keyed AS-OF join — "for each probe row, the newest build row of
  * the same key at or before the probe's time" — the temporal-lookup shape
  * the reference hand-rolls inside its tx operator
  * (`getLatestLeftByCommitLsn`, `TxAwareTwoInputNonBroadcastJoinProcessOperator.java:287-331`)
  * and every event pipeline eventually needs (enrich a click with the last
  * prior purchase, a reading with the last prior calibration).
  *
  * Built the scale-right way: UNION the tagged inputs, one hash shuffle on
  * the key, one per-key sort, and a running `last(_, ignoreNulls)` window —
  * NO range-join explosion (a naive `p.time >= b.time` theta-join is
  * O(probes × versions) per key and falls over exactly when versions pile
  * up). Cost at 100 TB: the single shuffle + sort any keyed window costs.
  *
  * Time ties: build rows sort BEFORE probe rows at equal time (inclusive
  * as-of, `<=`); pass `strict = true` to order probes first (`<`). Among
  * build rows at identical time the largest `tiebreak` wins — pass a
  * distinct ordering column (lsn, offset) to make the match total.
  */
object AsofJoin {

  /** For each row of `probe`, attach `struct(buildPayload*)` of the matching
    * `build` row as `matchedCol` (null when nothing precedes it).
    * Output = all probe columns + `matchedCol`.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: Seq[String],
               probeTime: Column, buildTime: Column,
               buildPayload: Seq[String], matchedCol: String = "matched",
               probeTiebreak: Column = lit(0L), buildTiebreak: Column = lit(0L),
               strict: Boolean = false): DataFrame = {
    val payloadType = build.select(buildPayload.map(col): _*).schema
    val probeCols = probe.columns.toIndexedSeq

    val pTagged = probe.select(
      probeCols.map(col) ++ Seq(
        probeTime.cast("double").as("_t"),
        lit(if (strict) 0 else 1).as("_side"),
        probeTiebreak.cast("double").as("_tb"),
        lit(null).cast(payloadType).as("_payload"),
        lit(true).as("_is_probe")): _*)
    val bTagged = build.select(
      key.map(col) ++ Seq(
        buildTime.cast("double").as("_t"),
        lit(if (strict) 1 else 0).as("_side"),
        buildTiebreak.cast("double").as("_tb"),
        struct(buildPayload.map(col): _*).as("_payload"),
        lit(false).as("_is_probe")): _*)

    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pTagged.unionByName(bTagged, allowMissingColumns = true)
      .withColumn(matchedCol, last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_is_probe"))
      .select(probeCols.map(col) :+ col(matchedCol): _*)
  }
}
