package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Skew handling for hot keys at cluster scale.
  *
  * AQE's skew-join rule already splits oversized sort-merge partitions at
  * runtime; this utility covers the cases AQE can't: broadcast-ineligible
  * dimension joins with a few pathological keys, and any stateful/windowed
  * operator where one key's rows must land on one task.
  *
  * `saltedJoin`: the skewed (large) side gets a salt in [0, salts); the
  * small side is exploded × salts, so the join key becomes (key, salt) and
  * a hot key spreads over `salts` tasks. Row-preserving for inner/left
  * joins on a unique small side (each large row matches exactly its salt's
  * copy).
  */
object Skew {

  /** DETERMINISM CONTRACT (what makes the salt retry-stable): the salt is
    * `hash(xxhash64(row content), occurrence)`, where `occurrence` counts
    * prior same-content rows WITHIN the task's partition. Join OUTPUT never
    * depends on the salt value (each large row meets the same small-side
    * match under any salt) — what retry stability protects is Spark's
    * recompute model: when a task is re-executed (speculation, fetch
    * failure) it must reproduce the same output rows. Content+occurrence is
    * a pure function of the partition's row MULTISET, so it survives the
    * intra-partition reorder a retried nondeterministic upstream can
    * produce (shuffle partition MEMBERSHIP is content-hash-deterministic;
    * only order is not) — the failure mode `monotonically_increasing_id`
    * (position-based) was vulnerable to. The occurrence component also
    * matters for CDC/at-least-once inputs where fully identical duplicate
    * rows are common: a pure content hash would send every copy of the hot
    * row to ONE salt, defeating the spread.
    *
    * Cost: one narrow per-partition pass with a hash→count map — O(distinct
    * row hashes per partition) × 24 B of task memory; duplicates (the
    * skew case this exists for) collapse to single entries.
    */
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
    val salted = withSalt(large, salts)
    val exploded = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** The large side with its `_salt` column (see the determinism contract
    * on [[saltedJoin]]). The content hash is the codegen'd `xxhash64` over
    * every column (array/map/struct-safe — never JVM `hashCode`); only the
    * occurrence counting leaves codegen, keyed by the 8-byte hash.
    */
  def withSalt(large: DataFrame, salts: Int): DataFrame = {
    val hashed = large.withColumn("_h",
      xxhash64(large.columns.map(col).toIndexedSeq: _*))
    val schema = hashed.schema.add("_occ", LongType)
    val withOcc = hashed.mapPartitions { it =>
      val seen = scala.collection.mutable.LongMap.empty[Long]
      it.map { r =>
        val h = r.getLong(r.length - 1)
        val n = seen.getOrElse(h, 0L)
        seen(h) = n + 1
        Row.fromSeq(r.toSeq :+ n)
      }
    }(Encoders.row(schema))
    withOcc
      .withColumn("_salt", pmod(hash(col("_h"), col("_occ")), lit(salts)))
      .drop("_h", "_occ")
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
