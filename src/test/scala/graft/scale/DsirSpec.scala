package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** DSIR importance-resampling semantics on hand-built corpora: weight
  * direction (target-like ≫ raw-like), feature counting (bag, not set),
  * and the determinism/shape contract of the Gumbel top-k.
  */
class DsirSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val target = Seq(
    (101L, "the quick brown fox jumps"),
    (102L, "the lazy brown dog sleeps")
  ).toDF("doc_id", "text")

  private val raw = Seq(
    (1L, "the quick brown fox runs"),   // mostly target vocabulary
    (2L, "zzz qqq www eee rrr"),        // disjoint vocabulary
    (3L, "zzz zzz zzz zzz zzz")         // repeated gram: bag counting
  ).toDF("doc_id", "text")

  test("importanceWeights: target-like docs outweigh raw-only docs") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    w.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L)
    // 5 tokens -> 5 unigrams + 4 bigrams, repeats included
    w.map(_.getLong(1)) shouldBe Array(9L, 9L, 9L)
    // relative ordering is the contract (absolute sign depends on the
    // add-one smoothing mass, which dominates at toy corpus size): the
    // target-vocabulary doc must outrank both disjoint-vocabulary docs
    val Array(w1, w2, w3) = w.map(_.getDouble(2))
    w1 should be > w2
    w1 should be > w3
    // docs 2/3 are pure raw vocabulary: below the smoothed baseline
    w2 should be < 0.0
  }

  test("resampleTopK: k rows, weight-dominant, reproducible") {
    val top2 = Dsir.resampleTopK(raw, target, "doc_id", "text", k = 2)
      .collect()
    top2.length shouldBe 2
    // doc 1's weight advantage (≫ Gumbel noise range here) keeps it ranked
    // first; the whole result reproduces exactly — no runtime RNG
    top2.head.getLong(0) shouldBe 1L
    val again = Dsir.resampleTopK(raw, target, "doc_id", "text", k = 2)
      .collect()
    again.map(_.toSeq) shouldBe top2.map(_.toSeq)
  }
}
