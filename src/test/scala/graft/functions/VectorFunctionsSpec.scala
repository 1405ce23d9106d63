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

  test("HOF-equivalent edge semantics: ragged lengths and null elements yield null") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    val r = df.collect().head
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true

    val withNullElem = spark.sql(
      "SELECT vec_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)) AS d," +
        " aggregate(zip_with(array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)," +
        "   (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS h")
      .collect().head
    withNullElem.isNullAt(0) shouldBe true
    withNullElem.isNullAt(1) shouldBe true
  }

  test("optimizer rewrites the aggregate(zip_with) idiom to the native VecDot") {
    // non-foldable inputs (literal arrays would be constant-folded away
    // before the plan check could see the rewrite)
    val vecs = spark.range(2).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), col("id").cast("double")).as("b"))

    val df = vecs.select(hofDot(col("a"), col("b")).as("d"))
    df.queryExecution.optimizedPlan.toString should include("vec_dot")
    df.orderBy("d").collect().map(_.getDouble(0)) shouldBe Array(0.0, 5.0)

    // the SQL spelling goes through the same rule
    vecs.createOrReplaceTempView("vecs")
    val sqlDf = spark.sql(
      "SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) AS d FROM vecs")
    sqlDf.queryExecution.optimizedPlan.toString should include("vec_dot")
    sqlDf.orderBy("d").collect().map(_.getDouble(0)) shouldBe Array(0.0, 5.0)

    // a non-dot fold (sum of maxima) is left untouched
    val other = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => greatest(x, y)),
        lit(0.0), (acc, v) => acc + v).as("d"))
    other.queryExecution.optimizedPlan.toString should not include "vec_dot"
    other.orderBy("d").collect().map(_.getDouble(0)) shouldBe Array(5.0, 5.0)
  }
}
