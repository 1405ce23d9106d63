package graft.ops

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Bucketed co-located join: same-bucketed tables join with NO shuffle
  * exchange — the physical-plan property that makes the layout pay at scale.
  */
class BucketingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // force AQE's final plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps materialized exchanges in QueryStageExec leaves whose inner
    // plan TreeNode.collect won't traverse — count from the rendered tree,
    // which does show them.
    "(?i)exchange".r.findAllIn(plan.toString).size
  }

  test("same-bucketed tables join without a shuffle; unbucketed join shuffles") {
    val sf = "/root/testdata/sf0.001"
    // At this toy SF the planner would BROADCAST the small side (also
    // exchange-free in bytes-shuffled terms, but it hides the property under
    // test); force the sort-merge path a fact⋈fact join takes at scale.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val orders = Tables.orders(spark, sf)
    val lines = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")

    // fresh metastore per JVM but the warehouse dir persists: clear both
    Seq("b_orders", "b_lines").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(lines, "b_lines", "o_orderkey", buckets = 8)

    val colocated = Bucketing.colocatedJoin(spark, "b_orders", "b_lines", "o_orderkey")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
    // no exchange anywhere: the bucketed scans satisfy the join's
    // distribution AND the downstream groupBy on the same key
    exchanges(colocated) shouldBe 0

    // control: the raw parquet join must shuffle both sides
    val raw = orders.join(lines, Seq("o_orderkey"))
    exchanges(raw) should be >= 1

    // same results either way
    colocated.agg(sum("n")).collect().head.getLong(0) shouldBe
      raw.count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
