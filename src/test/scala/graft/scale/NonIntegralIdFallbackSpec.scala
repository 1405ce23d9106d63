package graft.scale

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pin the non-integral-id contract of the packed-arg-min operators
  * ([[TextOps.dedupLines]], [[SpanDedup.dedupSpans]],
  * [[Chunking.chunkDedupStats]]): the r13 packed Decimal order only applies
  * to integral id columns; a STRING id must keep the legacy
  * `min(struct(id, pos))` winner — the type's own (lexicographic) ordering
  * — not the numeric order the packing would impose (and not an ANSI cast
  * error). Ids "10" vs "9" discriminate: lexicographic min is "10",
  * numeric min is 9.
  */
class NonIntegralIdFallbackSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedupLines: string ids elect the lexicographic winner") {
    val out = TextOps.dedupLines(
      Seq("10" -> "dup", "9" -> "dup").toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(3))).toMap
    out("10") shouldBe ("dup", 0L) // "10" < "9" lexicographically: canonical
    out("9") shouldBe ("", 1L)
  }

  test("dedupSpans: string ids elect the lexicographic canonical occurrence") {
    val out = SpanDedup.dedupSpans(
      Seq("10" -> "a b c", "9" -> "a b c").toDF("doc_id", "text"),
      "doc_id", "text", k = 3)
      .select("doc_id", "dedup_text", "n_removed")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    out("10") shouldBe ("a b c", 0L)
    out("9") shouldBe ("", 3L)
  }

  test("chunkDedupStats: string ids elect the lexicographic winner chunk") {
    val out = Chunking.chunkDedupStats(
      Seq("10" -> "a b c", "9" -> "a b c").toDF("doc_id", "text"),
      "doc_id", "text", window = 8, stride = 4)
      .select("doc_id", "kept_frac")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out("10") shouldBe 1.0
    out("9") shouldBe 0.0
  }
}
