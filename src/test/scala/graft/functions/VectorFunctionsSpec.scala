package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The native VecDot expression must be bit-for-bit the interpreted HOF fold
  * (same IEEE addition order) — that equivalence is what lets the similarity
  * operators swap it in without touching any oracle.
  */
class VectorFunctionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("vec_dot == interpreted HOF fold, bit for bit (random vectors incl. empty)") {
    import spark.implicits._
    val rnd = new Random(42)
    val cases = (0 until 30).map { i =>
      val n = if (i == 0) 0 else rnd.nextInt(129)
      (Seq.fill(n)((rnd.nextDouble() - 0.5) * 2e6),
        Seq.fill(n)((rnd.nextDouble() - 0.5) * 2e6))
    }
    val rows = cases.toDF("a", "b")
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      // bit-level compare: the fold orders must be identical, not just close
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("null array yields null; float arrays implicitly cast; SQL surface registered") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    df.select(VectorFunctions.vecDot(col("a"), col("b"))).collect().head.isNullAt(0) shouldBe true

    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("af", "b")
    f.select(VectorFunctions.vecDot(col("af"), col("b")).as("d"))
      .collect().head.getDouble(0) shouldBe 11.0

    spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0) shouldBe 11.0
  }
}
