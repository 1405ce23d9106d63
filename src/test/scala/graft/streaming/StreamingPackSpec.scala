package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}
import graft.scale.{Packing, TextOps}
import graft.streaming.StreamingPack.{PackDoc, PackedDoc}

/** Stream ≡ batch for next-fit packing: feeding the corpus through
  * id-ascending micro-batch slices must produce the identical
  * (bin_id, bin_fill) assignment as the one-shot batch fold — the open
  * bin's state survives the batch boundary, including a bin left partly
  * full at the cut and a document that must close it in the next batch.
  */
class StreamingPackSpec extends AnyFunSuite with Matchers {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("micro-batched packing == batch nextFitPack over the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("doc_id"),
        org.apache.spark.sql.functions.size(TextOps.tokens(col("text")))
          .cast("long").as("n_tokens"))
      .as[PackDoc].collect().sortBy(_.doc_id)

    val input = MemoryStream[PackDoc]
    val q = StreamingPack.nextFitPack(input.toDS(), capacity = 256L)
      .writeStream.format("memory").queryName("pack_out")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-pack-ckpt").toString)
      .outputMode("append").start()
    try {
      // id-ascending slices with uneven cuts (mid-source boundaries)
      docs.grouped(137).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("pack_out").as[PackedDoc].collect()
        .map(p => (p.source, p.doc_id) -> ((p.bin_id, p.bin_fill))).toMap

      val batch = Packing.nextFitPack(
        docs.toSeq.toDF("source", "doc_id", "n_tokens"),
        "doc_id", "n_tokens", "source", capacity = 256L)
        .select("source", "doc_id", "bin_id", "bin_fill")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap

      streamed.size shouldBe batch.size
      streamed shouldBe batch
      // sanity: state actually crossed batch boundaries — some source's
      // first doc of batch 2 continued a bin opened in batch 1
      val crossed = docs.grouped(137).toSeq.sliding(2).exists { w =>
        val lastIds = w.head.map(d => d.source -> d.doc_id).toMap
        w.last.exists { d =>
          lastIds.contains(d.source) &&
            streamed((d.source, d.doc_id))._1 > 0
        }
      }
      crossed shouldBe true
    } finally q.stop()
  }
}
