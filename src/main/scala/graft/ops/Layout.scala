package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional scan pruning — the Z-order
  * (Morton) curve. Sorting 100 TB by one key prunes scans on that key only;
  * interleaving the bits of two keys and range-partitioning by the
  * interleaved value gives every file a narrow min/max envelope in BOTH
  * dimensions, so parquet row-group stats prune selective filters on either
  * key (the technique behind Delta/Iceberg Z-ORDER table maintenance).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative LONG
    * columns: x's bit i lands at position 2i, y's at 2i+1. Pure bit
    * arithmetic (codegen'd, no UDF); the per-bit terms occupy disjoint
    * positions so plain addition assembles the word.
    */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Rewrite `df` in Z-order on (xCol, yCol): range-partition by the
    * interleaved value (parallel sampling shuffle — no global sort
    * bottleneck), sort within each partition, and leave the z value as
    * `zOut` for inspection. Written out as parquet, each file then covers a
    * compact rectangle of (x, y) space.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int = 16,
               partitions: Int = 0, zOut: String = "z"): DataFrame = {
    val withZ = df.withColumn(zOut, zValue2(col(xCol), col(yCol), bits))
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col(zOut))
      else withZ.repartitionByRange(col(zOut))
    parted.sortWithinPartitions(zOut)
  }
}
