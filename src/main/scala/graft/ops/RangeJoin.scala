package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi+range joins at scale — "events of key K inside window [start, end]"
  * (enrichment against validity intervals, point-in-window correlation,
  * time-tolerance matching).
  *
  * Spark's planner turns a bare range predicate into a broadcast
  * nested-loop or cartesian product — O(|L|·|R|) comparisons, the classic
  * 100 TB cliff. The standard fix (used by every warehouse range-join
  * implementation, e.g. the bin-based range join optimizations in
  * Databricks/Trino): BUCKET time into fixed-width bins. A point belongs to
  * exactly one bin; an interval is exploded to every bin it covers; an
  * equi-join on (key, bin) then finds every candidate exactly once (a pair
  * meets only in the point's bin), and the exact range predicate filters
  * residuals. Cost: |R| × avg-bins-per-interval extra rows — bounded when
  * `binWidth` ≈ the typical interval length — and ONE hash shuffle per side
  * instead of a quadratic loop.
  */
object RangeJoin {

  /** Join `points` (with `ptsCol`, epoch-based LONG) to `intervals` rows
    * whose [startCol, endCol] contains the point, additionally matching on
    * the equi `keys`. Inclusive bounds on both ends. Every output row is one
    * (point, interval) match; columns = keys ++ point columns ++ interval
    * columns (caller projects).
    *
    * `binWidth` must be > 0 in the same unit as the timestamps. Intervals
    * with end < start produce nothing (exploded to an empty bin range).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      ptsCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!(points.columns ++ intervals.columns).contains("_bin"),
      "inputs must not already carry a _bin column")
    // Floor division on LONGs: `ts div w` truncates toward zero (wrong for
    // negative timestamps), and `floor(ts / w)` routes through a double —
    // exact only for |ts| < 2^53, so epoch-NANOsecond values (~1.7e18)
    // would silently misbucket and drop matches. Subtracting the
    // non-negative pmod first makes the numerator an exact multiple, so the
    // integral divide is floor division over the full LONG range.
    def bin(c: String): Column = expr(s"($c - pmod($c, ${binWidth}L)) div ${binWidth}L")
    val p = points.withColumn("_bin", bin(ptsCol))
    // explode of a NULL array emits zero rows, so the degenerate end<start
    // interval simply disappears (no _bin null-filter pass needed)
    val iv = intervals
      .withColumn("_bin", explode(
        when(col(endCol) >= col(startCol),
          sequence(bin(startCol), bin(endCol)))))
    p.join(iv, keys :+ "_bin")
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("_bin")
  }
}
