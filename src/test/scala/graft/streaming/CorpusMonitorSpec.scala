package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The content monitor must flag a batch whose CONTENT shifted while
  * every query-level metric stays green — and must NOT flag batches that
  * look like the baseline. Drift = mean shift in units of baseline sd;
  * the log is idempotent per batch (redelivery rewrites, never appends).
  */
class CorpusMonitorSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  test("a degenerate batch flags; baseline-like batches don't; the log is per-batch idempotent") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val baseline = CorpusMonitor.profile(docs, "text")
    val dir = Files.createTempDirectory("graft-monitor").toString

    // batches 0 and 1: corpus slices — statistically the baseline
    CorpusMonitor.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, dir,
      baseline, "text", z = 2.0)
    CorpusMonitor.processBatch(docs.filter(col("doc_id") % 2 === 1), 1L, dir,
      baseline, "text", z = 2.0)
    // batch 2: a parser regression — every document collapses to the same
    // short boilerplate (quality and token-length means crater)
    CorpusMonitor.processBatch(
      docs.select(col("doc_id"), lit("click here to continue").as("text")),
      2L, dir, baseline, "text", z = 2.0)

    val log = CorpusMonitor.readLog(spark, dir)
      .select("batch", "drift", "z_quality")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getDouble(2)))).toMap
    log.keySet shouldBe Set(0L, 1L, 2L)
    log(0L)._1 shouldBe false
    log(1L)._1 shouldBe false
    log(2L)._1 shouldBe true
    log(2L)._2 should be > 2.0

    // redelivery of batch 2 with DIFFERENT (healthy) content rewrites its
    // row in place — one row per batch, latest attempt wins
    CorpusMonitor.processBatch(docs.filter(col("doc_id") % 2 === 0), 2L, dir,
      baseline, "text", z = 2.0)
    val log2 = CorpusMonitor.readLog(spark, dir)
    log2.count() shouldBe 3L
    log2.filter(col("batch") === 2L).select("drift").as[Boolean].head() shouldBe false
  }

  test("monitor attaches to a stream and profiles each micro-batch") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val baseline = CorpusMonitor.profile(docs, "text")
    val dir = Files.createTempDirectory("graft-monitor-stream").toString
    val ckpt = Files.createTempDirectory("graft-monitor-ckpt").toString
    val rows = docs.limit(50).as[(Long, String)].collect().toSeq
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = CorpusMonitor.attachMonitor(input.toDS().toDF("doc_id", "text"),
      dir, ckpt, baseline)
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((9999L, "the the the") +: rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val log = CorpusMonitor.readLog(spark, dir)
    log.count() shouldBe 2L
    log.select("n_docs").as[Long].collect().toSet shouldBe Set(50L, 51L)
  }
}
