package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** A timestamped event for the windowed-agg stream. */
case class TimedEv(ts: Timestamp, event_type: String, value: Double)

/** Watermarked tumbling-window aggregation over a real Structured Streaming
  * query (`withWatermark` + `window()` + append mode): windows emit only once
  * the watermark passes their end, and data later than the watermark delay is
  * dropped — the streaming half of the batch `q_window_agg` query.
  */
class WindowedAggSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("append-mode window agg: emission on watermark advance, late data dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[TimedEv]
    val agg = input.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

    val q = agg.writeStream.format("memory").queryName("window_agg")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-wagg").toString)
      .start()

    def emitted(): Seq[(Timestamp, String, Long, Double)] =
      spark.table("window_agg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1.getTime, x._2)).toSeq

    try {
      // batch 1: two events in the 10:00 window — nothing emits (append mode
      // holds a window until the watermark passes its end)
      input.addData(TimedEv(t("2024-01-01 10:05:00"), "click", 1.0),
        TimedEv(t("2024-01-01 10:20:00"), "click", 2.0))
      q.processAllAvailable()
      emitted() shouldBe empty

      // batch 2: an event at 11:30 advances the watermark to 11:20 — past
      // the 10:00 window's end, so that window emits, finalized
      input.addData(TimedEv(t("2024-01-01 11:30:00"), "view", 5.0))
      q.processAllAvailable()
      emitted() shouldBe Seq((t("2024-01-01 10:00:00"), "click", 2L, 3.0))

      // batch 3: a LATE event for the already-finalized 10:00 window (behind
      // the watermark) must be dropped — the emitted result never changes
      input.addData(TimedEv(t("2024-01-01 10:40:00"), "click", 100.0))
      q.processAllAvailable()
      emitted() shouldBe Seq((t("2024-01-01 10:00:00"), "click", 2L, 3.0))

      // batch 4: watermark moves past 12:00 → the 11:00 window emits too
      input.addData(TimedEv(t("2024-01-01 12:30:00"), "view", 7.0))
      q.processAllAvailable()
      emitted() shouldBe Seq(
        (t("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (t("2024-01-01 11:00:00"), "view", 1L, 5.0))
    } finally q.stop()
  }

  test("session boundary: an exact-gap pair MERGES (pins the q_session_agg oracle's strict break)") {
    import spark.implicits._
    // Spark merges when the next event is at exactly prev + gap; only a
    // STRICTLY larger gap starts a new session. The DuckDB oracle must
    // therefore break on `> gap`, not `>=` — this test keeps that honest
    // even though the synthetic corpus has no exact-gap pairs.
    val sessions = Seq(
      (t("2024-01-01 10:00:00"), "u"),
      (t("2024-01-01 10:10:00"), "u"),  // exactly +gap: same session
      (t("2024-01-01 10:20:00.001"), "u")) // gap exceeded by 1ms: new session
      .toDF("ts", "user")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("n")).orderBy("start")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    sessions shouldBe Seq(
      (t("2024-01-01 10:00:00"), 2L),
      (Timestamp.valueOf("2024-01-01 10:20:00.001"), 1L))
  }

  test("streaming session windows merge across micro-batches and close on watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[TimedEv]
    val agg = input.toDS()
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("s"), col("w.end").as("e"), col("event_type"), col("n"))

    val q = agg.writeStream.format("memory").queryName("session_agg")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-sagg").toString)
      .start()

    try {
      // two batches of events within the 10-minute gap: ONE session
      input.addData(TimedEv(t("2024-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      input.addData(TimedEv(t("2024-01-01 10:08:00"), "click", 1.0))
      q.processAllAvailable()
      // far-future event closes the session (watermark passes its end)
      input.addData(TimedEv(t("2024-01-01 12:00:00"), "click", 1.0))
      q.processAllAvailable()

      val rows = spark.table("session_agg").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(3))).toSeq
      // cross-batch merge: [10:00, 10:08+10min), 2 events, emitted once
      rows shouldBe Seq((t("2024-01-01 10:00:00"), t("2024-01-01 10:18:00"), 2L))
    } finally q.stop()
  }
}
