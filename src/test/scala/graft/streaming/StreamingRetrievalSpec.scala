package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.scale.Retrieval

/** The streamed postings index equals the batch-built index at every batch
  * boundary: probes against the growing segment set return exactly what
  * [[Retrieval.bm25TopK]] computes over the union of all documents seen so
  * far — N, avgdl, and document frequencies included (they are derived at
  * probe time, so a later batch's arrivals reweight earlier documents'
  * scores exactly as a rebuild would).
  */
class StreamingRetrievalSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("streamed index ≡ batch rebuild after each micro-batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val indexDir = Files.createTempDirectory("graft-bm25-stream-idx").toString
    val ckpt = Files.createTempDirectory("graft-bm25-stream-ckpt").toString
    val q = StreamingRetrieval.attachIndexMaintenance(
      input.toDS().toDF("doc_id", "text"), indexDir, ckpt)

    val batch1 = Seq((1L, "alpha beta gamma pad"), (2L, "alpha pad pad pad"),
      (3L, "delta pad other rows"))
    val batch2 = Seq((4L, "alpha beta pad pad pad pad"), (5L, "beta other pad"))
    val probes = Seq((7L, "alpha"), (7L, "beta")).toDF("q_id", "term")

    def probe(): Map[(Long, Long), (Double, Int)] = {
      // deliberately NO clearCache: the probe plan holds nothing in the
      // plan-keyed cache, so an identical re-probe after new segments land
      // must read the grown index (the round-7 stale-candidate footgun,
      // engineered away by the linear no-cache probe plan)
      Retrieval.bm25TopKIndexed(spark.read.parquet(indexDir), probes, "q_id", "term", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3))))
        .toMap
    }
    def rebuilt(docs: Seq[(Long, String)]): Map[(Long, Long), (Double, Int)] =
      Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        probes, "q_id", "term", k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getInt(3))))
        .toMap

    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      probe() shouldBe rebuilt(batch1)

      input.addData(batch2: _*)
      q.processAllAvailable()
      val after2 = probe()
      after2 shouldBe rebuilt(batch1 ++ batch2)
      // batch 2 changed df(alpha)/N, so batch-1 docs' scores moved too —
      // the probe-time statistics derivation, not a stale-index read
      after2((7L, 1L))._1 should not be rebuilt(batch1)((7L, 1L))._1
    } finally q.stop()
  }
}
