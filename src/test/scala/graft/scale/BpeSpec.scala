package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** BPE vocabulary induction ([[Bpe]]): the Sennrich et al. (ACL 2016)
  * worked example reproduced exactly, greedy-leftmost application,
  * generalization to an unseen word, and determinism of the learned merge
  * sequence under repartitioning.
  */
class BpeSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = Bpe.EndOfWord

  test("learnMerges reproduces the Sennrich worked example") {
    // the paper's toy vocabulary: low:5 lower:2 newest:6 widest:3
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.learnMerges(wc, numMerges = 5)
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))

    merges shouldBe Array(
      ("e", "s", 9L),      // newest(6) + widest(3)
      ("es", "t", 9L),
      ("est", W, 9L),
      ("l", "o", 7L),      // low(5) + lower(2)
      ("lo", "w", 7L))
  }

  test("segment generalizes learned merges to an unseen word") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val merges = Bpe.learnMerges(wc, numMerges = 5)
      .orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

    val segs = Bpe.segment(Seq((1L, "lowest"), (2L, "low lower"))
      .toDF("doc_id", "text"), "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

    segs(1L) shouldBe Seq("low", s"est$W") // the paper's generalization
    segs(2L) shouldBe Seq("low", W, "low", "e", "r", W)
  }

  test("greedy application merges leftmost-first on overlaps") {
    val out = Seq(Tuple1("aaa")).toDF("w")
      .select(Bpe.mergeOnce(split(col("w"), ""), "a", "a"))
      .as[Seq[String]].head()
    out shouldBe Seq("aa", "a")
  }

  test("string form handles back-to-back pair occurrences like the fold") {
    // the single-delimiter replace scheme got these wrong (consumed shared
    // delimiter -> missed adjacent occurrence); pin them explicitly
    val docs = Seq((1L, "abab"), (2L, "aaaa"), (3L, "aaaaa"), (4L, "ababab aabb"))
      .toDF("doc_id", "text")
    val merges = Seq("a" -> "b", "a" -> "a")
    val viaString = Bpe.segment(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    viaString(1L) shouldBe Seq("ab", "ab", W)
    viaString(2L) shouldBe Seq("aa", "aa", W)
    viaString(3L) shouldBe Seq("aa", "aa", "a", W)
    // "aabb": (a,b) fires first on positions 2-3 -> a, ab, b; (a,a) then
    // finds no adjacent pair
    viaString(4L) shouldBe Seq("ab", "ab", "ab", W, "a", "ab", "b", W)
    val viaFold = docs.select(col("doc_id"),
      flatten(transform(TextOps.tokens(col("text")),
        w => Bpe.applyMerges(w, merges))).as("subwords"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    viaString shouldBe viaFold
  }

  test("string-replace segmentation == the array-fold form on the corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val merges = Seq("e" -> "s", "es" -> "t", "est" -> W, "l" -> "o", "lo" -> "w")
    val viaString = Bpe.segment(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaFold = docs.select(col("doc_id"),
      flatten(transform(
        filter(TextOps.tokens(col("text")),
          w => org.apache.spark.sql.functions.length(w) > 0),
        w => Bpe.applyMerges(w, merges))).as("subwords"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    viaString shouldBe viaFold
  }

  test("learned merges are a pure function of the word-count table") {
    val wc = Bpe.wordCounts(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text")
    val a = Bpe.learnMerges(wc, numMerges = 8).collect().toSeq
    val b = Bpe.learnMerges(wc.repartition(7), numMerges = 8).collect().toSeq
    a shouldBe b
    a.size shouldBe 8 // the corpus vocabulary repeats plenty
  }
}
