package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class MinHashSigSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("signature: one minimum per slot, permutation-invariant, content-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("x y z")),
      (4L, Seq.empty[String])
    ).toDF("id", "sh")
      .withColumn("sig", TextHashFunctions.minHashSig(col("sh"), 8))

    val rows = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap

    rows(1).get should have length 8
    rows(1) shouldBe rows(2)           // set semantics: order never matters
    rows(1) should not be rows(3)      // different content, different minima
    rows(4) shouldBe None              // no shingles -> NULL signature

    // each slot is the true minimum over per-element slot hashes: a
    // superset's minima are <= the subset's, slotwise
    val sub = Seq((5L, Seq("a b c"))).toDF("id", "sh")
      .withColumn("sig", TextHashFunctions.minHashSig(col("sh"), 8))
      .select("sig").as[Seq[Long]].head()
    rows(1).get.zip(sub).foreach { case (sup, s) => sup should be <= s }
  }

  test("simHashVote matches the HOF majority vote bit for bit") {
    import spark.implicits._
    val powers = array((0 until 60).map(j => lit(1L << j)): _*)
    def hofVote(hashes: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(
          aggregate(hashes, array_repeat(lit(0L), 60),
            (acc, h) => zip_with(acc, powers,
              (c, p) => c + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(0L))),
          powers,
          (c, p) => when(c * 2 > n, p).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc + b)

    val rnd = new scala.util.Random(7)
    val rows = (0 until 20).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(rnd.nextLong().abs & ((1L << 60) - 1))))
    val out = rows.toDF("id", "hs")
      .select(
        TextHashFunctions.simHashVote(col("hs")).as("native"),
        hofVote(col("hs"),
          org.apache.spark.sql.functions.size(col("hs")).cast("long")).as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (native, hof) => native shouldBe hof }
  }

  test("interpreted eval matches codegen (literal folding vs column path)") {
    import spark.implicits._
    // constant-folded (interpreted nullSafeEval) result
    val folded = spark.range(1)
      .select(TextHashFunctions.minHashSig(
        array(lit("a b c"), lit("b c d")), 8).as("sig"))
      .as[Seq[Long]].head()
    // column-driven (codegen) result over the same data
    val gen = Seq(Seq("a b c", "b c d")).toDF("sh")
      .withColumn("sig", TextHashFunctions.minHashSig(col("sh"), 8))
      .select("sig").as[Seq[Long]].head()
    folded shouldBe gen
  }
}
