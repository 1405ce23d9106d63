package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.KmvSketch
import graft.scale.Hashing

/** KMV in Structured Streaming: the aggregate's serialized O(k) buffer IS
  * the streaming state, so a running distinct-count over an unbounded
  * stream holds k longs per group forever — and because the sketch is a
  * pure function of the input SET, the streaming result after any
  * micro-batch slicing is bit-identical to the one-shot batch sketch over
  * the same rows (at-least-once redelivery included: duplicates are
  * no-ops). That equivalence is the property HLL state can only
  * approximate and this spec pins exactly.
  */
class StreamingKmvSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val k = 16

  test("streaming sketch across micro-batches == batch sketch, bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(String, Long)]
    val agg = input.toDS().toDF("grp", "v")
      .groupBy("grp")
      .agg(KmvSketch.kmv(Hashing.md5Long60(col("v").cast("string")), k).as("kmv"))

    val q = agg.writeStream.format("memory").queryName("kmv_out")
      .outputMode("complete").start()
    try {
      val batches = Seq(
        (1L to 40L).map(("a", _)) ++ (1L to 5L).map(("b", _)),
        (20L to 60L).map(("a", _)), // overlaps batch 1: redelivered values
        (61L to 90L).map(("a", _)) ++ (3L to 9L).map(("b", _)))
      batches.foreach { b => input.addData(b); q.processAllAvailable() }

      val streamed = spark.table("kmv_out").as[(String, Seq[Long])]
        .collect().toMap
      val batch = batches.flatten.toDF("grp", "v")
        .groupBy("grp")
        .agg(KmvSketch.kmv(Hashing.md5Long60(col("v").cast("string")), k).as("kmv"))
        .as[(String, Seq[Long])].collect().toMap

      streamed shouldBe batch
      streamed("a").length shouldBe k // full sketch: 90 distinct > k
      streamed("b").length shouldBe 9 // under-full: the distinct set itself
    } finally q.stop()
  }
}
