package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd}

/** Stall-timeout eviction for the native engine: an abandoned transaction
  * (announced but never completed — a crashed producer, a lost partition)
  * would otherwise stall the contiguity watermark FOREVER and pin its
  * partial events in state. With `stallTimeoutMs` set, the processing-time
  * timer declares it abandoned: the watermark advances past it, later
  * transactions emit, and the partial events are PURGED — never applied —
  * so emitted documents still reflect only fully-delivered transactions
  * (the consistency contract survives; what is traded away is the evicted
  * transaction itself, which is the operator's point).
  */
class TxReplayNativeStallSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def toNative(l: Seq[LeftEv], r: Seq[RightEv], e: Seq[TxEnd]): Seq[NativeEv] =
    l.map(x => NativeEv("l", x.key, -1L, x.op, x.lsn, x.tx_id, x.row, null, -1L, -1L, -1L)) ++
    r.map(x => NativeEv("r", x.key, x.line_id, x.op, x.lsn, x.tx_id, null, x.row, -1L, -1L, -1L)) ++
    e.map(x => NativeEv("t", -1L, -1L, null, -1L, x.tx_id, null, null,
      x.commit_lsn, x.expected_left, x.expected_right))

  test("an abandoned tx is evicted on timeout; its partial events never apply") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[NativeEv]
      val df = in.toDF()
      val left = df.filter(col("stream") === "l")
        .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
      val right = df.filter(col("stream") === "r")
        .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
          col("lrow").as("row"))
      val ends = df.filter(col("stream") === "t")
        .select(col("tx_id"), col("commit_lsn"), col("expected_left"), col("expected_right"))
      val q = TxReplayNative.docs(left, right, ends, stallTimeoutMs = Some(8000L))
        .writeStream.format("memory").queryName("native_stall").outputMode("append")
        // pace the continuous timer-check batches (see the docs scaladoc:
        // ProcessingTime mode means every batch "requires another batch",
        // so q.processAllAvailable() never quiesces — poll the sink instead)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .option("checkpointLocation",
          Files.createTempDirectory("graft-native-stall").toString)
        .start()
      def awaitRows(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("native_stall").count() < n &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      try {
        // batch 1: tx1 complete; tx2 ANNOUNCED but one right event short
        // (its one delivered line, 77, must never surface); tx3 complete
        // but stalled behind tx2
        in.addData(toNative(
          Seq(LeftEv(5, "c", 1, 1, OrderRow(9, "somewhere"))),
          Seq(RightEv(5, 11, "c", 2, 1, LineRow(1, 1, 1.0)),
              RightEv(5, 77, "c", 10, 2, LineRow(7, 7, 7.0)),
              RightEv(5, 88, "c", 20, 3, LineRow(8, 8, 8.0))),
          Seq(TxEnd(1, 100, 1, 1), TxEnd(2, 200, 0, 2), TxEnd(3, 300, 0, 1))))
        awaitRows(1)
        val afterB1 = spark.table("native_stall").collect()
        afterB1.map(_.getAs[Long]("commit_lsn")).toSeq shouldBe Seq(100L) // tx2 stalls 3

        // the 8s window above is what makes the stall observable before
        // eviction; now tx2's timer expires on a later continuous batch and
        // abandons it; tx4 arrives independently — the watermark advances
        // through 3 and 4
        in.addData(toNative(Seq.empty,
          Seq(RightEv(5, 99, "c", 30, 4, LineRow(9, 9, 9.0))),
          Seq(TxEnd(4, 400, 0, 1))))
        awaitRows(3)
        val rows = spark.table("native_stall").collect().sortBy(_.getAs[Long]("commit_lsn"))

        def lineIds(r: Row): Seq[Long] =
          Option(r.getSeq[Row](r.fieldIndex("lines")))
            .map(_.map(_.getLong(0)).sorted).getOrElse(Seq.empty)

        rows.map(_.getAs[Long]("commit_lsn")).toSeq shouldBe Seq(100L, 300L, 400L)
        lineIds(rows(0)) shouldBe Seq(11L)
        lineIds(rows(1)) shouldBe Seq(11L, 88L)      // 77 purged, not applied
        lineIds(rows(2)) shouldBe Seq(11L, 88L, 99L) // and stays gone
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
