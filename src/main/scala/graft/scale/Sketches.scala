package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.KmvSketch

/** Deterministic distinct-count sketching over DataFrames.
  *
  * `approx_count_distinct` (HLL++) is the built-in answer, and
  * ApproxAggSpec pins its accuracy band — but HLL register layouts are
  * implementation-private, so its results can neither be oracled against
  * another engine nor persisted as portable state. KMV fills that gap:
  * same O(k) mergeable fixed-size state, but the sketch is a pure function
  * of the input set (the k smallest [[Hashing.md5Long60]] hashes), so any
  * engine reproduces it bit-for-bit and sketches persisted by different
  * systems can be merged. The price is a slightly worse error constant
  * than HLL at equal memory (relative sd ≈ 1/sqrt(k-2)).
  */
object Sketches {

  /** Standard KMV estimate from a sorted ascending sketch: exact size when
    * the sketch is not full (it IS the distinct set), else
    * floor((k-1) · 2^60 / h_k). All doubles involved are exact
    * (63·2^60 needs 6 significand bits) and the one division is a single
    * IEEE op, so the estimate is engine-reproducible. h_k = 0 cannot occur
    * twice (hashes are distinct) but is floored to 1 to keep the
    * expression total.
    */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast(LongType))
      .otherwise(floor(lit((k - 1).toDouble) * pow(lit(2.0), lit(60.0)) /
        greatest(element_at(kmv, k), lit(1L))))

  /** Per-group distinct-count estimate of `valueCol`: ONE pass, one
    * shuffle of ≤k longs per group (map-side partial sketches merge
    * associatively — the plan shape that survives any corpus size).
    * Output: groupCols*, kmv (sorted ARRAY<LONG>, ≤k), n_est.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val hv = Hashing.md5Long60(col(valueCol).cast("string"))
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(KmvSketch.kmv(hv, k).as("kmv"))
      .withColumn("n_est", kmvEstimate(col("kmv"), k))
  }

  /** Merge persisted sketches (e.g. per-shard or per-day partials) back
    * into one sketch per group: re-aggregating sketch ELEMENTS with the
    * same KMV aggregate is exactly the k-smallest of the union, so
    * merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the property
    * KmvSketchSpec pins. Input: (groupCols*, kmv); output the same shape.
    */
  def kmvMergeSketches(sketches: DataFrame, groupCols: Seq[String],
                       k: Int): DataFrame =
    sketches.select(groupCols.map(col) :+ explode(col("kmv")).as("_hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(KmvSketch.kmv(col("_hv"), k).as("kmv"))
}
