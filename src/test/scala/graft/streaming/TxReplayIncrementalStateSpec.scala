package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd}

/** Pins the incremental-state contract of [[TxReplayStream]]: bytes written
  * per micro-batch scale with the batch's DELTA (new events + the buckets
  * their emitting transactions touch), NOT with the size of the buffered
  * state — the parquet analogue of the reference's O(delta) ListState
  * updates (`TxAware…Operator.java:432-444`). Also proves the deferred
  * compaction is sound: documents emitted later must still resolve as-of
  * history that lives in buckets no recent batch rewrote, which requires
  * the END retention to cover untouched buckets.
  */
class TxReplayIncrementalStateSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Every regular file under `root` with its size — the inventory diffed
    * across batches to measure what a batch actually wrote.
    */
  private def inventory(root: String): Map[String, Long] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return Map.empty
    val walk = Files.walk(p)
    try walk.toArray.map(_.asInstanceOf[Path])
      .filter(Files.isRegularFile(_))
      .map(f => f.toString -> Files.size(f)).toMap
    finally walk.close()
  }

  private def newBytes(before: Map[String, Long], after: Map[String, Long]): Long =
    after.collect { case (f, sz) if !before.contains(f) => sz }.sum

  private def bucketsAtVersion(root: String, side: String, v: Long): Seq[String] = {
    val base = Paths.get(root, side)
    val ls = Files.list(base)
    try ls.toArray.map(_.asInstanceOf[Path])
      .filter(p => p.getFileName.toString.startsWith("b") &&
        Files.exists(p.resolve(s"v$v")))
      .map(_.getFileName.toString).toSeq.sorted
    finally ls.close()
  }

  test("a small batch rewrites only its dirty buckets; bytes scale with the delta") {
    val root = Files.createTempDirectory("graft-txincr").toString
    val engine = new TxReplayStream(spark, root, numBuckets = 8)

    // batch 0: a WIDE load — 64 keys across every bucket, all in tx 1,
    // which commits. This is the "large accumulated state" baseline.
    val inv0 = inventory(root)
    val out0 = engine.processBatch(
      (1L to 64L).map(k => LeftEv(k, "c", k, 1, OrderRow(k.toInt, s"addr-$k"))).toDF(),
      (1L to 64L).map(k => RightEv(k, k * 10, "c", 1000 + k, 1, LineRow(k.toInt, 1, 1.0))).toDF(),
      Seq(TxEnd(1, 100, 64, 64)).toDF())
    out0.count() shouldBe 64
    val inv1 = inventory(root)
    val bytesWide = newBytes(inv0, inv1)

    // batch 1: a 1-key delta — key 1000 in tx 2, which commits.
    val out1 = engine.processBatch(
      Seq(LeftEv(1000, "c", 200, 2, OrderRow(1000, "addr-new"))).toDF(),
      Seq(RightEv(1000, 1, "c", 201, 2, LineRow(1, 1, 2.0))).toDF(),
      Seq(TxEnd(2, 300, 1, 1)).toDF())
    out1.select("key").as[Long].collect().toSeq shouldBe Seq(1000L)
    val inv2 = inventory(root)
    val bytesDelta = newBytes(inv1, inv2)

    // exactly ONE bucket rewritten per side — the bucket of key 1000; the
    // other 7 buckets holding the 64-key state were not touched
    bucketsAtVersion(root, "left", 1).size shouldBe 1
    bucketsAtVersion(root, "right", 1).size shouldBe 1
    bucketsAtVersion(root, "left", 0).size should be >= 6

    // and the bytes written are delta-scale, not state-scale: even with
    // fixed parquet footer overhead on the 4 small outputs (emitted, ends,
    // 1 left + 1 right bucket), the 1-key batch must cost well under half
    // the 64-key load
    bytesDelta.toDouble should be < bytesWide.toDouble / 2

    // batch 2: an END for a tx whose DATA lives entirely in batch-0 state —
    // tx 3 updates key 7 (its bucket was NOT rewritten by batch 1), so the
    // emitted doc's as-of resolution must read deferred-compacted history
    // from an untouched bucket and its END enrichment must still find tx 1
    val out2 = engine.processBatch(
      Seq(LeftEv(7, "u", 400, 3, OrderRow(7, "addr-7b"))).toDF(),
      Seq.empty[RightEv].toDF(),
      Seq(TxEnd(3, 500, 1, 0)).toDF())
      .collect()
    out2.length shouldBe 1
    out2.head.getAs[Long]("key") shouldBe 7L
    out2.head.getAs[Long]("commit_lsn") shouldBe 500L
    // the doc joins the NEW header with the OLD (batch-0, untouched-bucket)
    // line history of key 7
    out2.head.getSeq[org.apache.spark.sql.Row](out2.head.fieldIndex("lines"))
      .map(_.getLong(0)) shouldBe Seq(70L)
    engine.currentWatermark shouldBe 500L
  }
}
