package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** File-based streaming envelope ingestion: JSON-lines dir → typed decode →
  * metadata (S10) and proctime (P10) columns, through a real streaming query.
  */
class EnvelopeSourceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("fileStream decodes envelopes with metadata and proctime columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-envsrc")
    Files.writeString(Paths.get(dir.toString, "events-0.jsonl"),
      """{"before":null,"after":{"id":1,"name":"a"},"source":{"table":"t1","lsn":10,"txId":5},"op":"c","ts_ms":1000,"transaction":{"id":"5:100"}}
        |{"before":{"id":2,"name":"b"},"after":null,"source":{"table":"t1","lsn":11,"txId":5},"op":"d","ts_ms":1001,"transaction":{"id":"5:100"}}
        |""".stripMargin)

    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val q = EnvelopeSource.fileStream(spark, dir.toString, rowSchema)
      .writeStream.format("memory").queryName("env_src")
      .option("checkpointLocation", Files.createTempDirectory("graft-envsrc-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("env_src")
      rows.count() shouldBe 2
      val decoded = rows
        .selectExpr("coalesce(after.id, before.id) AS id", "op", "source.lsn",
          "transaction.id AS txid", "src_file", "proctime IS NOT NULL AS has_pt")
        .as[(Long, String, Long, String, String, Boolean)]
        .collect().sortBy(_._1).toList
      decoded.map(r => (r._1, r._2, r._3, r._4)) shouldBe List(
        (1L, "c", 10L, "5:100"), (2L, "d", 11L, "5:100"))
      all(decoded.map(_._5)) should include("events-0.jsonl") // S10 metadata
      all(decoded.map(_._6)) shouldBe true                    // P10 proctime
    } finally q.stop()
  }

  test("quarantine fileStream routes malformed lines with raw bytes, decodes the rest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-envsrc-q")
    Files.writeString(Paths.get(dir.toString, "events-0.jsonl"),
      """{"before":null,"after":{"id":1,"name":"a"},"source":{"table":"t1","lsn":10,"txId":5},"op":"c","ts_ms":1000,"transaction":{"id":"5:100"}}
        |{"after":{"id":2,
        |{"before":null,"after":{"id":3,"name":"c"},"source":{"table":"t1","lsn":12,"txId":6},"op":"c","ts_ms":1002,"transaction":{"id":"6:120"}}
        |""".stripMargin)

    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val q = EnvelopeSource.fileStreamQuarantine(spark, dir.toString, rowSchema)
      .writeStream.format("memory").queryName("env_src_q")
      .option("checkpointLocation", Files.createTempDirectory("graft-envsrc-q-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("env_src_q")
      rows.count() shouldBe 3
      val clean = rows.filter(!$"corrupt")
        .selectExpr("after.id AS id").as[Long].collect().sorted
      clean shouldBe Array(1L, 3L)
      val quarantined = rows.filter($"corrupt")
        .selectExpr("raw_payload", "src_file").as[(String, String)].collect()
      quarantined.map(_._1) shouldBe Array("""{"after":{"id":2,""")
      quarantined.head._2 should include("events-0.jsonl") // metadata rides along
    } finally q.stop()
  }
}
