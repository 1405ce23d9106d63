package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Semantics of the generic keyed as-of join: inclusive vs strict time
  * ties, tiebreak among equal-time build rows, no-match nulls, and key
  * isolation.
  */
class AsofJoinSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val build = Seq(
    // (key, time, tiebreak, tag)
    (1L, 10L, 0L, "b10"), (1L, 20L, 0L, "b20"), (1L, 20L, 1L, "b20x"),
    (2L, 5L, 0L, "other-key")
  ).toDF("k", "bt", "tb", "tag")

  private def probeAt(times: (Long, Long)*) =
    times.toSeq.toDF("k", "pt")

  private def run(probe: org.apache.spark.sql.DataFrame, strict: Boolean) =
    AsofJoin.asofJoin(probe, build, Seq("k"),
      probeTime = col("pt"), buildTime = col("bt"),
      buildPayload = Seq("bt", "tag"), matchedCol = "m",
      buildTiebreak = col("tb"), strict = strict)
      .select(col("k"), col("pt"), col("m.tag").as("tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet

  test("inclusive as-of: equal-time build visible; largest tiebreak wins") {
    run(probeAt((1L, 20L), (1L, 15L), (1L, 9L), (1L, 100L)), strict = false) shouldBe Set(
      (1L, 20L, "b20x"), // same-time build visible, tiebreak 1 beats 0
      (1L, 15L, "b10"),
      (1L, 9L, null),    // nothing at or before 9
      (1L, 100L, "b20x"))
  }

  test("strict as-of: equal-time build invisible") {
    run(probeAt((1L, 20L), (1L, 21L)), strict = true) shouldBe Set(
      (1L, 20L, "b10"),  // builds AT 20 excluded
      (1L, 21L, "b20x"))
  }

  test("keys do not leak matches") {
    run(probeAt((2L, 100L), (3L, 100L)), strict = false) shouldBe Set(
      (2L, 100L, "other-key"),
      (3L, 100L, null)) // key 3 has no build rows at all
  }
}
