package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.Stateful.{ToastEvent, UpsertEvent}

/** MemoryStream-driven suites for the streaming stateful operators —
  * multi-batch, so the keyed state genuinely carries across micro-batches
  * (the property the batch OVER-window form can't test).
  */
class StatefulSpec extends AnyFunSuite with Matchers {

  private lazy val spark = {
    val s = TestSpark.spark
    // transformWithState requires the RocksDB state store provider
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def checkpoint(): String =
    Files.createTempDirectory("graft-stream-ckpt").toString

  test("streaming toast backfill latches across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[ToastEvent]
    val q = Stateful.toastBackfill(input.toDS())
      .writeStream.format("memory").queryName("toast_stream")
      .outputMode("update").option("checkpointLocation", checkpoint())
      .start()
    try {
      // batch 1: snapshot read seeds the latch
      input.addData(ToastEvent(1, "r", 1, "bio-v1"), ToastEvent(2, "r", 2, "other"))
      q.processAllAvailable()
      // batch 2: sentinel update must backfill from batch 1's latch;
      // a real update advances the latch
      input.addData(
        ToastEvent(1, "u", 3, graft.cdc.Envelope.ToastSentinel),
        ToastEvent(2, "u", 4, "other-v2"))
      q.processAllAvailable()
      // batch 3: sentinel again — now latched to other-v2; delete clears
      input.addData(
        ToastEvent(2, "u", 5, graft.cdc.Envelope.ToastSentinel),
        ToastEvent(1, "d", 6, null))
      q.processAllAvailable()

      val out = spark.table("toast_stream").as[ToastEvent].collect()
        .sortBy(e => (e.lsn)).toList
      out.map(e => (e.id, e.op, e.value)) shouldBe List(
        (1L, "r", "bio-v1"), (2L, "r", "other"),
        (1L, "u", "bio-v1"),    // sentinel replaced by latch
        (2L, "u", "other-v2"),
        (2L, "u", "other-v2"),  // sentinel replaced by advanced latch
        (1L, "d", null))
    } finally q.stop()
  }

  test("streaming commit-lsn fixer buffers until END, flushes with corrected LSN") {
    import spark.implicits._
    import Stateful.TxKeyedEvent
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TxKeyedEvent]
    val q = Stateful.fixCommitLsn(input.toDS())
      .writeStream.format("memory").queryName("fixer_stream")
      .outputMode("update").option("checkpointLocation", checkpoint())
      .start()
    def ev(tx: Long, key: Long, lsn: Long) =
      TxKeyedEvent(tx, "e", key, "c", lsn, s"p$lsn", -1L)
    def end(tx: Long, lsn: Long, commit: Long) =
      TxKeyedEvent(tx, "end", -1, "", lsn, null, commit)
    try {
      // batch 1: two events of tx 5, no END → nothing emitted (buffered)
      input.addData(ev(5, 1, 1), ev(5, 2, 2))
      q.processAllAvailable()
      spark.table("fixer_stream").count() shouldBe 0
      // batch 2: END for tx 5 (commit 500) → both flush, corrected; a late
      // event of tx 5 in the same batch passes straight through
      input.addData(end(5, 3, 500), ev(5, 3, 4))
      q.processAllAvailable()
      val out = spark.table("fixer_stream").as[TxKeyedEvent].collect()
        .sortBy(_.lsn).toList
      out.map(e => (e.key, e.lsn, e.commit_lsn)) shouldBe List(
        (1L, 1L, 500L), (2L, 2L, 500L), (3L, 4L, 500L))
    } finally q.stop()
  }

  test("metrics listener tracks events-seen and state rows across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val input = MemoryStream[ToastEvent]
    val q = Stateful.toastBackfill(input.toDS())
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode("update").option("checkpointLocation", checkpoint())
      .start()
    try {
      input.addData(ToastEvent(1, "c", 1, "x"), ToastEvent(2, "c", 2, "y"))
      q.processAllAvailable()
      input.addData(ToastEvent(1, "u", 3, "x2"))
      q.processAllAvailable()
      // listener delivery is async — poll briefly
      var m = listener.snapshot.get("obs_stream")
      val deadline = System.nanoTime() + 10e9.toLong
      while ((m.isEmpty || m.get.eventsSeen < 3) && System.nanoTime() < deadline) {
        Thread.sleep(100); m = listener.snapshot.get("obs_stream")
      }
      m.map(_.eventsSeen) shouldBe Some(3L)   // TotalNumberOfEventsSeen analogue
      m.get.stateRows should be >= 2L         // keyed latch state
      m.get.batches should be >= 2L
    } finally { q.stop(); spark.streams.removeListener(listener) }
  }

  test("streaming keep-latest materializer emits current row per key, tombstone on delete") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[UpsertEvent]
    val q = Stateful.keepLatest(input.toDS())
      .writeStream.format("memory").queryName("upsert_stream")
      .outputMode("update").option("checkpointLocation", checkpoint())
      .start()
    try {
      input.addData(
        UpsertEvent(1, "c", 1, "a1"), UpsertEvent(1, "u", 2, "a2"),
        UpsertEvent(2, "c", 3, "b1"))
      q.processAllAvailable() // in-batch fold: key 1 emits only a2
      input.addData(UpsertEvent(1, "u", 4, "a3"), UpsertEvent(2, "d", 5, "ignored"))
      q.processAllAvailable()
      // out-of-order stale event (lsn 1 < state lsn 4) must not regress state
      input.addData(UpsertEvent(1, "u", 1, "stale"))
      q.processAllAvailable()
      // EQUAL-lsn redelivery carries the newer serialization: the incoming
      // event must beat the stored state on a tie
      input.addData(UpsertEvent(1, "u", 4, "a3-redelivered"))
      q.processAllAvailable()

      val out = spark.table("upsert_stream").as[UpsertEvent].collect()
        .sortBy(_.lsn).toList // stable: equal-lsn rows keep arrival order
      out.map(e => (e.key, e.lsn, e.payload)) shouldBe List(
        (1L, 2L, "a2"), (2L, 3L, "b1"),
        (1L, 4L, "a3"),                 // batch 2
        (1L, 4L, "a3"),                 // batch 3: stale ignored, current re-emitted
        (1L, 4L, "a3-redelivered"),     // batch 4: tie → incoming wins
        (2L, 5L, null))                 // tombstone
    } finally q.stop()
  }
}
