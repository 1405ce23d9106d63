package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc.Envelope
import graft.sources.EnvelopeSource
import graft.streaming.Stateful.ToastEvent

/** The reference's TOAST ingest job end-to-end as ONE streaming pipeline
  * (`postgres-toast-backfill/.../DataStreamJob.java:35-58`): envelope file
  * stream (S1) → typed decode/normalize → keyed `transformWithState` TOAST
  * latch (O1) → upsert-encoded K/V output with null-value tombstones
  * (S6/S8) — events arriving across REAL micro-batches (separate files), so
  * the latch genuinely carries state between batches.
  */
class StreamingIngestSpec extends AnyFunSuite with Matchers {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val S = Envelope.ToastSentinel

  private def envLine(id: Long, op: String, lsn: Long, bio: String): String = {
    val img = if (bio == null) s"""{"id":$id,"bio":null}"""
    else s"""{"id":$id,"bio":"$bio"}"""
    val (before, after) =
      if (op == "d") (img, "null") else ("null", img)
    s"""{"before":$before,"after":$after,"source":{"table":"authors","lsn":$lsn,"txId":1},"op":"$op","ts_ms":${1000 + lsn},"transaction":null}"""
  }

  test("file envelope stream -> toast latch -> upsert encode, across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ingest")
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("bio", StringType)))

    // batch 1: snapshot read seeds the latch; an update carries the sentinel
    Files.writeString(Paths.get(dir.toString, "b1.jsonl"),
      Seq(envLine(1, "r", 10, "bio-v1"),
          envLine(1, "u", 11, S)).mkString("", "\n", "\n"))

    val events = EnvelopeSource.fileStream(spark, dir.toString, rowSchema)
    val normalized = Envelope.normalize(events, "id")
      .select(col("key").as("id"), col("op"), col("lsn"),
        col("after.bio").as("value"))
      .as[ToastEvent]
    val backfilled = Stateful.toastBackfill(normalized)
    val (k, v) = Envelope.encodeUpsertKV(
      col("id"), struct(col("id"), col("value").as("bio")), col("op") === "d")
    val out = backfilled.select(col("lsn"), k.as("kafka_key"), v.as("kafka_value"))

    val q = out.writeStream.format("memory").queryName("ingest_out")
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("graft-ingest-ckpt").toString)
      .start()

    def collected(): Map[Long, (String, String)] =
      spark.table("ingest_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap

    try {
      q.processAllAvailable()
      val after1 = collected()
      after1(10L) shouldBe (("""{"id":1}""", """{"id":1,"bio":"bio-v1"}"""))
      // sentinel update: latched value substituted (DataStreamJob.java:83-97)
      after1(11L) shouldBe (("""{"id":1}""", """{"id":1,"bio":"bio-v1"}"""))

      // batch 2 (new file = new micro-batch): real update re-latches, a
      // second sentinel sees the NEW value, delete emits a tombstone
      Files.writeString(Paths.get(dir.toString, "b2.jsonl"),
        Seq(envLine(1, "u", 20, "bio-v2"),
            envLine(1, "u", 21, S),
            envLine(1, "d", 22, null)).mkString("", "\n", "\n"))
      q.processAllAvailable()
      val after2 = collected()
      after2(20L)._2 shouldBe """{"id":1,"bio":"bio-v2"}"""
      after2(21L)._2 shouldBe """{"id":1,"bio":"bio-v2"}""" // latch carried across batches
      after2(22L)._2 shouldBe null                          // S8 tombstone
      after2(22L)._1 shouldBe """{"id":1}"""                // keyed by id
    } finally q.stop()
  }
}
