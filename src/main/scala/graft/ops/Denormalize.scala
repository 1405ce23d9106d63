package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J3 / A2: the flagship denormalization — parent ⋈ children →
  * one document per parent with an ordered array of child rows. This is the
  * logical query the reference's whole transactional pipeline implements
  * (`transactional-cdc-processing/transactional-cdc-processing-poc.md:14-27`):
  *
  * {{{ SELECT po.*, ARRAY_AGG(ROW(ol.*)) FROM purchaseorders po
  *     LEFT JOIN orderlines ol ON ol.order_id = po.id GROUP BY po.* }}}
  *
  * Scale: child side shuffles once on the join key, and because the parent's
  * grouping key IS the join key, Catalyst reuses the exchange — join output is
  * already hash-partitioned by the key, so the groupBy adds no second shuffle
  * of the big side. `sort_array` makes the nested array deterministic
  * (collect_list order is partition-dependent otherwise).
  */
object Denormalize {

  /** parent LEFT JOIN children ON parent(parentKey) == children(childFk),
    * children nested as a sorted array of structs named `lines`.
    *
    * @param childCols child columns to nest; the first is the sort key of the
    *                  nested array (via the struct's natural ordering).
    */
  def ordersWithLines(parent: DataFrame, children: DataFrame,
                      parentKey: String, childFk: String,
                      childCols: Seq[String]): DataFrame = {
    val joined = parent.join(children, parent(parentKey) === children(childFk), "left")
    val childStruct = struct(childCols.map(children(_)).toIndexedSeq: _*)
    // collect_list skips NULL inputs → parents with no children get [], like
    // an outer-join-aware ARRAY_AGG FILTER (WHERE child IS NOT NULL)
    val guarded = when(children(childFk).isNotNull, childStruct)
    joined.groupBy(parent.columns.map(parent(_)).toIndexedSeq: _*)
      .agg(sort_array(collect_list(guarded)).as("lines"))
  }
}
