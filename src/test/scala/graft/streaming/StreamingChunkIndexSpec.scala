package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}
import graft.scale.{Chunking, Retrieval}

/** The stream-maintained chunk index must probe exactly like the batch
  * pipeline (chunk the surviving latest-version corpus → chunk-keyed
  * [[Retrieval.bm25TopK]] → [[Chunking.chunkHitsToDocs]]) — including the
  * case a chunk-keyed upsert contract gets wrong: a document re-sent with
  * SHORTER text chunks into fewer windows, and its old tail chunks must
  * die with the version, not linger as phantom passages.
  */
class StreamingChunkIndexSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  private def result(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), (Long, Long, Double)] =
    df.select("q_id", "rank", "doc_id", "best_chunk", "score").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("streamed ≡ batch chunk retrieval through shrinking update, delete, compaction") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val probes = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(slice(split(col("text"), " "), 5, 4))).as("term"))
    val indexDir = Files.createTempDirectory("graft-chunk-lsm").toString

    def send(b: Long, rows: org.apache.spark.sql.DataFrame): Unit =
      StreamingChunkIndex.processBatch(rows, b, indexDir, window = 32, stride = 16,
        opCol = Some("op"), compactSegments = 3)
    def probe() = result(StreamingChunkIndex.chunkTopKLiveDocs(spark, indexDir,
      probes, "q_id", "term", kChunks = 20, kDocs = 5))
    def batchPipeline(corpus: org.apache.spark.sql.DataFrame) = {
      val chunks = Chunking.chunkDocuments(corpus, "doc_id", "text", 32, 16)
        .select(Chunking.chunkKey(col("doc_id"), col("chunk_id")).as("ck"), col("chunk"))
      result(Chunking.chunkHitsToDocs(
        Retrieval.bm25TopK(chunks, "ck", "chunk", probes, "q_id", "term", k = 20), 5))
    }

    // batch 0: the whole corpus
    send(0, docs.withColumn("op", lit("u")))
    probe() shouldBe batchPipeline(docs)

    // batch 1: every %23 doc re-sent TRUNCATED to its first 40 tokens —
    // it chunks into 2 windows where the original had more; the original's
    // tail chunks must die with the superseded version
    val shortened = array_join(slice(split(col("text"), " "), 1, 40), " ")
    send(1, docs.filter(col("doc_id") % 23 === 0)
      .select(col("doc_id"), shortened.as("text"), lit("u").as("op")))
    val afterUpdate = docs.select(col("doc_id"),
      when(col("doc_id") % 23 === 0, shortened).otherwise(col("text")).as("text"))
    probe() shouldBe batchPipeline(afterUpdate)
    // no phantom passage: the max live chunk_id of an updated doc fits the
    // 40-token truncation (2 windows → ids 0 and 1)
    val live = SegmentStore.liveRows(
      StreamingChunkIndex.readSegments(spark, indexDir),
      StreamingChunkIndex.readDels(spark, indexDir), "doc_id")
    live.filter(col("doc_id") % 23 === 0)
      .select(max(Chunking.chunkKeyChunk(col("ck")))).as[Long].head() should be <= 1L

    // batch 2: every %31 doc deleted — marker tips segs+dels over the
    // threshold, compaction reclaims superseded versions physically
    send(2, docs.filter(col("doc_id") % 31 === 0)
      .select(col("doc_id"), lit("").as("text"), lit("d").as("op")))
    StreamingChunkIndex.readManifest(indexDir).segs shouldBe Seq("seg=c2")
    val survivors = afterUpdate.filter(col("doc_id") % 31 =!= 0)
    probe() shouldBe batchPipeline(survivors)

    // redelivered batch: committed id skips it, the answer is unchanged
    send(2, docs.limit(3).select(col("doc_id"), col("text"), lit("u").as("op")))
    StreamingChunkIndex.readManifest(indexDir).lastBatch shouldBe 2L
    probe() shouldBe batchPipeline(survivors)
  }
}
