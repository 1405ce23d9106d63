package graft.scale

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pin [[SpanDedup.dedupSpans]] semantics on hand-computed cases: canonical
  * occurrence survives, later occurrences lose every covered token,
  * overlapping duplicate grams union their spans, and self-repetition
  * inside one document collapses to the leading occurrence.
  */
class SpanDedupSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] =
    SpanDedup.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .select("doc_id", "dedup_text", "n_removed")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap

  test("cross-document duplicate run: canonical doc untouched, later doc cut") {
    val out = run(Seq(
      1L -> "a b c d e f",
      2L -> "x a b c d y"), k = 3)
    // doc 1 holds the canonical (smallest doc_id) occurrence of "a b c" and
    // "b c d" — untouched even though its grams repeat elsewhere
    out(1L) shouldBe ("a b c d e f", 0L)
    // doc 2's occurrences of those two grams overlap: positions 1-3 and 2-4
    // union to {1,2,3,4}; only the flanking tokens survive
    out(2L) shouldBe ("x y", 4L)
  }

  test("within-document repetition collapses to the first occurrence") {
    val out = run(Seq(3L -> "p q p q p q p q"), k = 3)
    // grams "p q p" (canonical pos 0) and "q p q" (canonical pos 1) repeat
    // at pos 2..5; covered positions {2..7} are removed
    out(3L) shouldBe ("p q", 6L)
  }

  test("full copy reduces to empty; sub-k docs never modified") {
    val out = run(Seq(
      10L -> "m n o p",
      20L -> "m n o p", // byte-identical, larger id -> fully removed
      30L -> "m n"), // shorter than k: no grams, untouched
      k = 3)
    out(10L) shouldBe ("m n o p", 0L)
    out(20L) shouldBe ("", 4L)
    out(30L) shouldBe ("m n", 0L)
  }

  test("unique texts pass through byte-identical (split+rejoin lossless)") {
    val rows = Seq(100L -> "one two  three", 101L -> "four five six seven")
    val out = run(rows, k = 2)
    rows.foreach { case (id, t) => out(id) shouldBe (t, 0L) }
  }
}
