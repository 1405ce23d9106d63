package graft.scale

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pin [[Chunking]] semantics on hand-computed cases: the window rule
  * (single chunk at or under the window, tail always reached, no chunk
  * start at/past n), span/text agreement, the chunk-key overflow guard,
  * and the dedup/retrieval rollups.
  */
class ChunkingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunks(text: String, window: Int, stride: Int): Seq[(Int, Int, Int, String)] =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", window, stride)
      .orderBy("chunk_id")
      .select("chunk_id", "tok_start", "tok_end", "chunk")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSeq

  test("n <= window yields exactly one chunk covering the whole document") {
    chunks("a b c", window = 5, stride = 2) shouldBe Seq((0, 0, 3, "a b c"))
    chunks("a b c d e", window = 5, stride = 2) shouldBe Seq((0, 0, 5, "a b c d e"))
  }

  test("windows overlap by window-stride and the last window reaches the tail") {
    // n=7, window=4, stride=2 → starts 0,2, then ceil((7-4)/2)=2 → +1 = 3 chunks? no:
    // nChunks = ceil(3/2)+1 = 2+1 = 3 → starts 0,2,4; last covers [4,7)
    chunks("a b c d e f g", window = 4, stride = 2) shouldBe Seq(
      (0, 0, 4, "a b c d"), (1, 2, 6, "c d e f"), (2, 4, 7, "e f g"))
  }

  test("exact multiple: no chunk starts at or past n") {
    // n=6, window=4, stride=2 → ceil(2/2)+1 = 2 chunks; a start at 4 would
    // be redundant (its window [4,6) is inside chunk 1's [2,6))
    chunks("a b c d e f", window = 4, stride = 2) shouldBe Seq(
      (0, 0, 4, "a b c d"), (1, 2, 6, "c d e f"))
  }

  test("stride == window tiles without overlap") {
    chunks("a b c d e", window = 2, stride = 2) shouldBe Seq(
      (0, 0, 2, "a b"), (1, 2, 4, "c d"), (2, 4, 5, "e"))
  }

  test("every token is covered by at least one chunk") {
    val df = Seq((1L, (1 to 37).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Chunking.chunkDocuments(df, "doc_id", "text", 8, 5)
      .select("tok_start", "tok_end").as[(Int, Int)].collect()
    val covered = spans.flatMap { case (s, e) => s until e }.toSet
    covered shouldBe (0 until 37).toSet
  }

  test("chunk key round-trips and guards overflow") {
    val df = Seq((7L, 3), (123456L, (1 << Chunking.ChunkKeyShift) - 1))
      .toDF("doc_id", "chunk_id")
    val back = df.select(
      Chunking.chunkKeyDoc(Chunking.chunkKey(col("doc_id"), col("chunk_id"))).as("d"),
      Chunking.chunkKeyChunk(Chunking.chunkKey(col("doc_id"), col("chunk_id"))).as("c"))
      .as[(Long, Long)].collect().toSet
    back shouldBe Set((7L, 3L), (123456L, (1L << Chunking.ChunkKeyShift) - 1))

    val bad = Seq((1L, 1 << Chunking.ChunkKeyShift)).toDF("doc_id", "chunk_id")
      .select(Chunking.chunkKey(col("doc_id"), col("chunk_id")))
    val ex = intercept[Exception](bad.collect())
    ex.getMessage should include("chunk_id overflows chunk key")
  }

  test("chunkDedupStats: shared boilerplate chunk survives once, corpus-wide") {
    // window=stride=2 tiles; docs 1 and 2 share their first tile "x y"
    val df = Seq(
      (1L, "x y a b"),
      (2L, "x y c d"),
      (3L, "e f g")).toDF("doc_id", "text")
    val out = Chunking.chunkDedupStats(df, "doc_id", "text", window = 2, stride = 2)
      .select("doc_id", "n_chunks", "n_kept", "kept_frac")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    out(1L) shouldBe ((2L, 2L, 1.0))   // doc 1 wins the shared tile
    out(2L) shouldBe ((2L, 1L, 0.5))   // doc 2's copy is the duplicate
    out(3L) shouldBe ((2L, 2L, 1.0))
  }

  test("chunkHitsToDocs: a document ranks by its best chunk, ties to low chunk_id") {
    val hits = Seq(
      // q 1: doc 5 has chunks scoring 2.0 (chunk 1) and 3.0 (chunk 0);
      // doc 6 one chunk scoring 2.5
      (10L, Chunking.key(5L, 0), 3.0, 1),
      (10L, Chunking.key(5L, 1), 2.0, 3),
      (10L, Chunking.key(6L, 2), 2.5, 2),
      // q 2: equal scores across two chunks of doc 7 → best_chunk = 0
      (11L, Chunking.key(7L, 4), 1.5, 2),
      (11L, Chunking.key(7L, 0), 1.5, 1))
      .toDF("q_id", "doc_id", "score", "rank")
    val out = Chunking.chunkHitsToDocs(hits, k = 5)
      .select("q_id", "doc_id", "best_chunk", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
      .toSet
    out shouldBe Set(
      (10L, 5L, 0L, 3.0, 1),
      (10L, 6L, 2L, 2.5, 2),
      (11L, 7L, 0L, 1.5, 1))
  }
}
