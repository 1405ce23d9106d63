package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Retract-mode aggregation semantics on a hand-built changelog: inserts,
  * an update pair, a delete, and a fully-retracted group.
  */
class RetractAggSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("retractions + retractAgg maintain count/sum under updates and deletes") {
    // (op, key, beforeV, afterV) — nulls where the side is absent
    val env = Seq(
      ("c", 1L, None, Some(10L)),          // +10
      ("c", 1L, None, Some(20L)),          // +20
      ("u", 1L, Some(20L), Some(25L)),     // 20 -> 25
      ("c", 2L, None, Some(7L)),
      ("d", 2L, Some(7L), None)            // group 2 fully retracted
    ).toDF("op", "k", "b", "a")
      .select(col("op"),
        when(col("b").isNotNull, struct(col("k"), col("b").as("v"))).as("before"),
        when(col("a").isNotNull, struct(col("k"), col("a").as("v"))).as("after"))

    val out = Materialize.retractAgg(
      Materialize.retractions(env), Seq("k"), col("v"))
      .orderBy("k").collect()

    out.length shouldBe 1 // group 2 dropped at zero live rows
    out(0).getLong(0) shouldBe 1L
    out(0).getAs[Long]("n_live") shouldBe 2L
    out(0).getAs[Long]("sum_value") shouldBe 35L // 10 + 25
  }
}
