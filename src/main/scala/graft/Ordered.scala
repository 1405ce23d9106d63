package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Deterministic total ordering for oracle-compared outputs WITHOUT a range
  * sort: `orderBy` range-partitions, and RangePartitioner's sampling pass
  * recomputes the entire upstream plan a second time — a 2× tax on every
  * query whose plan is expensive. Oracle outputs are small (hundreds to a
  * few hundred thousand rows), so shuffling them to one partition and
  * sorting there is cheaper than sampling: upstream stages keep full
  * parallelism; only the final tiny sort is single-task.
  */
object Ordered {
  implicit class OrderedOps(private val df: DataFrame) extends AnyVal {
    def ordered(cols: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols.map(col): _*)
    def orderedBy(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
