package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Approximate aggregates — the sketch family a 100 TB engine leans on when
  * exact distinct counts / quantiles would shuffle the world. These cannot
  * be DuckDB-oracled (different sketch implementations), so the gate is a
  * tolerance band against the exact answers on the sf0.01 tables:
  * approx_count_distinct is HLL++ with default rsd 5%, approx_percentile
  * within the requested accuracy. Both are single-pass, mergeable,
  * fixed-size state — the scale contract.
  */
class ApproxAggSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("approx_count_distinct within rsd of exact, per group and global") {
    val ev = Tables.events(spark, sf)
    val exact = ev.agg(countDistinct("user_id")).head.getLong(0)
    val approx = ev.agg(approx_count_distinct("user_id")).head.getLong(0)
    approx.toDouble shouldBe exact.toDouble +- math.max(2.0, exact * 0.05 * 3)

    val per = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("ex"),
        approx_count_distinct("user_id").as("ap"))
      .collect()
    per.foreach { r =>
      val (ex, ap) = (r.getAs[Long]("ex"), r.getAs[Long]("ap"))
      withClue(s"${r.getString(0)}: ") {
        ap.toDouble shouldBe ex.toDouble +- math.max(2.0, ex * 0.05 * 3)
      }
    }
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val ev = Tables.events(spark, sf)
    val exact = ev.agg(expr("percentile(value, 0.5)")).head.getDouble(0)
    // percentile_approx returns an OBSERVED value; with accuracy 10000 it
    // must land within a tight value-neighborhood of the exact median
    val approx = ev.agg(expr("percentile_approx(value, 0.5, 10000)")).head.getDouble(0)
    val spread = ev.agg(max("value").cast("double") - min("value").cast("double"))
      .head.getDouble(0)
    math.abs(approx - exact) should be <= spread * 0.01
  }
}
