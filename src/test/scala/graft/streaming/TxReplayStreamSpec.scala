package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd}

/** Micro-batch tx replay: events and END markers arriving in DIFFERENT
  * batches, out-of-order commits, exactly-once emission across batches, and
  * state compaction carrying the header forward.
  */
class TxReplayStreamSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("micro-batch replay: buffer until END, commit order, no re-emission, compacted state") {
    val engine = new TxReplayStream(spark,
      Files.createTempDirectory("graft-txstream").toString)

    // batch 1: tx 1 (order 1 + line) arrives WITHOUT its END → holds
    val out1 = engine.processBatch(
      Seq(LeftEv(1, "c", 1, 1, OrderRow(7, "addr-1"))).toDF(),
      Seq(RightEv(1, 10, "c", 2, 1, LineRow(101, 1, 9.99))).toDF(),
      Seq.empty[TxEnd].toDF())
    out1.count() shouldBe 0
    engine.currentWatermark shouldBe Long.MinValue

    // batch 2: tx 1's END (commit 100) + a SECOND tx that commits EARLIER
    // (commit 50, order 2) → both emit, in commit order
    val out2 = engine.processBatch(
      Seq(LeftEv(2, "c", 5, 2, OrderRow(8, "addr-2"))).toDF(),
      Seq(RightEv(2, 20, "c", 6, 2, LineRow(202, 2, 19.99))).toDF(),
      Seq(TxEnd(1, 100, 1, 1), TxEnd(2, 50, 1, 1)).toDF())
      .orderBy("commit_lsn").collect()
    out2.map(r => (r.getAs[Long]("key"), r.getAs[Long]("commit_lsn"))).toSeq shouldBe
      Seq((2L, 50L), (1L, 100L))
    engine.currentWatermark shouldBe 100L

    // batch 3: tx 3 adds a line to order 1 (commit 200). The order's header
    // exists only in COMPACTED state from batch 1/2 — the doc must still
    // carry it, lines must accumulate, and nothing old re-emits.
    val out3 = engine.processBatch(
      Seq.empty[LeftEv].toDF(),
      Seq(RightEv(1, 11, "c", 7, 3, LineRow(102, 3, 29.99))).toDF(),
      Seq(TxEnd(3, 200, 0, 1)).toDF())
      .collect()
    out3.length shouldBe 1
    val doc = out3.head
    doc.getAs[Long]("key") shouldBe 1L
    doc.getAs[Long]("commit_lsn") shouldBe 200L
    val hdr = doc.getStruct(doc.fieldIndex("row"))
    (hdr.getInt(0), hdr.getString(1)) shouldBe ((7, "addr-1"))
    doc.getSeq[org.apache.spark.sql.Row](doc.fieldIndex("lines")).map(
      _.getLong(0)) shouldBe Seq(10L, 11L)
    engine.currentWatermark shouldBe 200L

    // batch 4: empty batch → no emissions, watermark stable
    val out4 = engine.processBatch(
      Seq.empty[LeftEv].toDF(), Seq.empty[RightEv].toDF(), Seq.empty[TxEnd].toDF())
    out4.count() shouldBe 0
    engine.currentWatermark shouldBe 200L
  }
}
