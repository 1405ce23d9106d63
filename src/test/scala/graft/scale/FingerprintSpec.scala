package graft.scale

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Properties of the winnowing fingerprints and the byte-resample op that
  * the DuckDB oracle can't express:
  *
  *  - the WINNOWING GUARANTEE (Schleimer/Wilkerson/Aiken §3): two documents
  *    sharing any substring of length ≥ k + w - 1 share at least one
  *    fingerprint — the property plagiarism/near-dup detection relies on;
  *  - degradation on short inputs (single global minimum; none below k);
  *  - resizeBytes width/edge behavior.
  */
class FingerprintSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val k = 7
  private val w = 4

  private def fingerprints(texts: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    TextOps.winnowFingerprints(texts.toDF("id", "text"), "text", k, w)
      .select(col("id"), col("fingerprints"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 => shared fingerprint") {
    val rnd = new Random(7)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString

    // 20 random pairs, each sharing one planted substring of exactly k+w-1
    val planted = (0 until 20).map { i =>
      val shared = randText(k + w - 1)
      val a = randText(40) + shared + randText(40)
      val b = randText(55) + shared + randText(25)
      (i, shared, a, b)
    }
    val fps = fingerprints(planted.flatMap { case (i, _, a, b) =>
      Seq((i * 2L, a), (i * 2L + 1, b))
    })
    planted.foreach { case (i, shared, _, _) =>
      val common = fps(i * 2L).toSet & fps(i * 2L + 1).toSet
      withClue(s"pair $i shared='$shared': ") { common should not be empty }
    }
  }

  test("short-input degradation: one fingerprint below k+w-1 grams, none below k chars") {
    val fps = fingerprints(Seq(
      (1L, "abcdefgh"),     // len 8: 2 grams, < w windows -> single global min
      (2L, "abcdef"),       // len 6 < k: no grams -> no fingerprints
      (3L, "a" * (k + w - 1)))) // exactly one full window
    fps(1L).length shouldBe 1
    fps(2L) shouldBe empty
    fps(3L).length shouldBe 1
  }

  test("resizeBytes: fixed output width, shorter inputs upsample, empty stays empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "0123456789abcdef0123456789abcdef"), // 32 bytes -> stride 2
      (2L, "xyz"),                              // 3 bytes  -> upsample
      (3L, "")                                  // empty
    ).toDF("id", "s")
      .select(col("id"),
        Multimodal.resizeBytes(encode(col("s"), "UTF-8"), 16).as("b"))
      .select(col("id"), octet_length(col("b")).as("len"),
        col("b").cast("string").as("str"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap

    // 32 -> 16: every second byte
    df(1L) shouldBe ((16, "02468ace02468ace"))
    // 3 -> 16: nearest-neighbor repetition, still 16 wide
    df(2L)._1 shouldBe 16
    df(2L)._2 shouldBe "xxxxxxyyyyyzzzzz"
    // empty -> empty (no padding invented)
    df(3L)._1 shouldBe 0
  }
}
