package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.StreamingNearDup.NearDupMatch

/** Cross-batch behavior of the streaming MinHash-LSH near-dup matcher:
  * a near-dup arriving in a LATER micro-batch is matched against state
  * filed by an earlier one; unrelated docs never match; within-batch
  * pairs match too; the bucket cap stops state growth but not matching.
  */
class StreamingNearDupSpec extends AnyFunSuite with Matchers {

  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def checkpoint(): String =
    Files.createTempDirectory("graft-stream-ckpt").toString

  // 40 shared tokens; variants differ in ONE token → shingle Jaccard ≈ 0.93
  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = ((1 to 39).map(i => s"tok$i") :+ "tokX").mkString(" ")
  private val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")

  test("near-dups match across and within micro-batches; unrelated never") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val banded = StreamingNearDup.bandedSignatures(
      input.toDS().toDF("id", "seq", "text"), "id", "seq", "text")
    val q = StreamingNearDup.matches(banded, simThreshold = 0.7)
      .writeStream.format("memory").queryName("near_dup_stream")
      .outputMode("append").option("checkpointLocation", checkpoint())
      .start()
    try {
      // batch 1: the original + an unrelated doc + a within-batch near-dup
      input.addData((1L, 1L, base), (2L, 2L, unrelated), (3L, 3L, nearDup))
      q.processAllAvailable()
      // batch 2: another near-dup (matches BOTH earlier variants, proving
      // state carried across the batch boundary) + another unrelated doc
      input.addData((4L, 4L, base),
        (5L, 5L, (1 to 40).map(i => s"third$i").mkString(" ")))
      q.processAllAvailable()

      val pairs = spark.table("near_dup_stream").as[NearDupMatch].collect()
        .map(m => (m.doc_id, m.dup_of)).distinct.toSet
      pairs shouldBe Set((3L, 1L), (4L, 1L), (4L, 3L))

      val sims = spark.table("near_dup_stream").as[NearDupMatch].collect()
      all(sims.map(_.sim)) should be >= 0.7
    } finally q.stop()
  }

  test("bucket cap freezes state growth but capped buckets still match") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val banded = StreamingNearDup.bandedSignatures(
      input.toDS().toDF("id", "seq", "text"), "id", "seq", "text")
    // cap 1: only the FIRST doc per bucket is ever stored
    val q = StreamingNearDup.matches(banded, simThreshold = 0.7, maxBucket = 1)
      .writeStream.format("memory").queryName("near_dup_capped")
      .outputMode("append").option("checkpointLocation", checkpoint())
      .start()
    try {
      // identical texts → identical signatures → identical band keys, so
      // the cap semantics are exact: doc 1 fills every shared bucket to
      // capacity, doc 2 is stored NOWHERE
      input.addData((1L, 1L, base))
      q.processAllAvailable()
      input.addData((2L, 2L, base)) // matches doc 1; not stored (cap)
      q.processAllAvailable()
      input.addData((3L, 3L, base)) // must match ONLY doc 1, never doc 2
      q.processAllAvailable()

      val pairs = spark.table("near_dup_capped").as[NearDupMatch].collect()
        .map(m => (m.doc_id, m.dup_of)).distinct.toSet
      pairs shouldBe Set((2L, 1L), (3L, 1L))
    } finally q.stop()
  }
}
