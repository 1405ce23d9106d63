package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** O7's STREAMING half: Debezium delivery is at-least-once, so the same
  * (key, lsn) change can arrive twice — including in different micro-batches,
  * where a plain batch dropDuplicates can't see the earlier copy.
  * `dropDuplicatesWithinWatermark` keeps dedup state per key until the
  * watermark passes it (bounded state — the 100 TB requirement), exactly the
  * planner-inserted dedup node Flink enables with
  * `table.exec.source.cdc-events-duplicate=true` (`KafkaChangelogJob.java:13`).
  */
class StreamingDedupSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("cross-batch duplicate (key, lsn) deliveries collapse to one row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (key, lsn, eventTimeSec)
    val input = MemoryStream[(Long, Long, Long)]
    val deduped = input.toDS().toDF("key", "lsn", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("key", "lsn")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((1L, 100L, 20L), (1L, 100L, 20L), (2L, 200L, 21L)) // in-batch dup
      q.processAllAvailable()
      input.addData((1L, 100L, 22L)) // cross-batch redelivery, inside the watermark
      q.processAllAvailable()
      input.addData((1L, 101L, 23L)) // genuinely new change for the same key
      q.processAllAvailable()

      val rows = spark.table("dedup_out").select("key", "lsn")
        .as[(Long, Long)].collect().sorted
      rows shouldBe Array((1L, 100L), (1L, 101L), (2L, 200L))
    } finally q.stop()
  }
}
