package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys at cluster scale.
  *
  * AQE's skew-join rule already splits oversized sort-merge partitions at
  * runtime; this utility covers the cases AQE can't: broadcast-ineligible
  * dimension joins with a few pathological keys, and any stateful/windowed
  * operator where one key's rows must land on one task.
  *
  * `saltedJoin`: the skewed (large) side gets a random salt in [0, salts);
  * the small side is exploded × salts, so the join key becomes
  * (key, salt) and a hot key spreads over `salts` tasks. Row-preserving for
  * inner/left joins on a unique small side (each large row matches exactly
  * its salt's copy).
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // Row-preserving contract only holds when every large-side row matches
    // exactly one salted copy of its small-side match — i.e. inner/left
    // (any of Spark's spellings). right/full would emit unmatched
    // small-side rows once PER SALT.
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin preserves rows only for inner/left joins, got $joinType")
    // Deterministic-under-retry salt: hash of the full row mixed with the
    // row's position (monotonically_increasing_id = partition id + offset,
    // stable for a deterministic scan). The positional component matters for
    // CDC/at-least-once inputs where fully identical duplicate rows are
    // common — a pure row-hash would send every copy of the hot row to ONE
    // salt, defeating the spread.
    val salted = large
      .withColumn("_salt",
        pmod(hash(large.columns.map(col).toIndexedSeq :+
          monotonically_increasing_id(): _*), lit(salts)))
    val exploded = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase aggregation for skewed groupBy when the aggregate is
    * decomposable (sum/count/min/max): pre-aggregate on (key, salt), then
    * combine per key — bounds any single task's input by 1/salts of the hot
    * key. (Plain hash aggregates already do map-side partial combine; this
    * is for EXPANDING aggregates like collect_list where partials stay
    * large, or when upstream partitioning is adversarial.)
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column, salts: Int,
                out: String): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))
  }
}
