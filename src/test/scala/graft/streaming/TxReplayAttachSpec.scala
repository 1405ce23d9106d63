package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** One flat union-stream event; nulls where a stream kind has no value. */
case class WireEv(stream: String, key: Long, line_id: Long, op: String,
                  lsn: Long, tx_id: Long, row: OrderLineRow,
                  commit_lsn: Long, expected_left: Long, expected_right: Long)
case class OrderLineRow(purchaser: Int, shipping_address: String)

/** The replay engine attached to a REAL Structured Streaming query via
  * foreachBatch: events arrive over MemoryStream micro-batches, docs land in
  * a collected sink.
  */
class TxReplayAttachSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("foreachBatch attachment replays across real micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[WireEv]
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val q = TxReplayStream.attach(
      input.toDF(),
      Files.createTempDirectory("graft-attach-state").toString,
      Files.createTempDirectory("graft-attach-ckpt").toString) { (docs, _) =>
      emitted ++= docs.collect().map(r =>
        (r.getAs[Long]("key"), r.getAs[Long]("commit_lsn"), r.getAs[Boolean]("deleted")))
    }

    def l(key: Long, op: String, lsn: Long, tx: Long) =
      WireEv("l", key, -1, op, lsn, tx, OrderLineRow(9, s"addr-$tx"), -1, -1, -1)
    def r(key: Long, line: Long, op: String, lsn: Long, tx: Long) =
      WireEv("r", key, line, op, lsn, tx, OrderLineRow(-1, null), -1, -1, -1)
    def t(tx: Long, commit: Long, el: Long, er: Long) =
      WireEv("t", -1, -1, null, -1, tx, null, commit, el, er)

    try {
      // micro-batch 1: order + line, END not yet → nothing emitted
      input.addData(l(1, "c", 1, 1), r(1, 10, "c", 2, 1))
      q.processAllAvailable()
      emitted shouldBe empty

      // micro-batch 2: the END arrives → the doc emits
      input.addData(t(1, 100, 1, 1))
      q.processAllAvailable()
      emitted.toList shouldBe List((1L, 100L, false))

      // micro-batch 3: delete order + line in one tx → tombstone
      input.addData(l(1, "d", 3, 2), r(1, 10, "d", 4, 2), t(2, 200, 1, 1))
      q.processAllAvailable()
      emitted.toList shouldBe List((1L, 100L, false), (1L, 200L, true))
    } finally q.stop()
  }
}
