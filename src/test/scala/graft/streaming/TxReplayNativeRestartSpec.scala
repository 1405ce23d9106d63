package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd}

/** Restart/recovery of the streaming-native engine: unlike
  * [[TxReplayStream]] (which carries its own manifest + redelivery
  * machinery), [[TxReplayNative]] delegates state durability to the
  * PLATFORM — the RocksDB state store snapshots into the query checkpoint.
  * This spec pins that the delegation actually holds: a new query
  * incarnation over the same checkpoint resumes the three stages' state
  * (buffered events, pending sequencer set, tx→key memory, per-key
  * running docs) and neither re-emits nor loses documents.
  */
class TxReplayNativeRestartSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a restarted query resumes all three stages' state exactly-once") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val checkpoint = Files.createTempDirectory("graft-native-restart").toString
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[NativeEv]
      // foreachBatch sink: the memory sink is not fault-tolerant (refuses
      // checkpoint recovery); collecting per batch is, and is also the
      // production delivery shape (Kafka writer etc.)
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

      def startQuery() = {
        val df = in.toDF()
        val left = df.filter(col("stream") === "l")
          .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
        val right = df.filter(col("stream") === "r")
          .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
            col("lrow").as("row"))
        val ends = df.filter(col("stream") === "t")
          .select(col("tx_id"), col("commit_lsn"), col("expected_left"), col("expected_right"))
        TxReplayNative.docs(left, right, ends)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            emitted.synchronized {
              emitted ++= batch.select("key", "commit_lsn").collect()
                .map(r => (r.getLong(0), r.getLong(1)))
            }
            ()
          }
          .outputMode("append")
          .option("checkpointLocation", checkpoint)
          .start()
      }

      def toNative(l: Seq[LeftEv], r: Seq[RightEv], e: Seq[TxEnd]): Seq[NativeEv] =
        l.map(x => NativeEv("l", x.key, -1L, x.op, x.lsn, x.tx_id, x.row, null, -1L, -1L, -1L)) ++
        r.map(x => NativeEv("r", x.key, x.line_id, x.op, x.lsn, x.tx_id, null, x.row, -1L, -1L, -1L)) ++
        e.map(x => NativeEv("t", -1L, -1L, null, -1L, x.tx_id, null, null,
          x.commit_lsn, x.expected_left, x.expected_right))

      // incarnation 1: tx 1 commits (emits); tx 2's data arrives but its
      // END does not — buffered state must survive the restart in the
      // assembler's ListState, and the sequencer must remember nothing is pending
      val q1 = startQuery()
      in.addData(toNative(
        Seq(LeftEv(1, "c", 1, 1, OrderRow(7, "addr-1")),
            LeftEv(2, "c", 3, 2, OrderRow(8, "addr-2"))),
        Seq(RightEv(1, 10, "c", 2, 1, LineRow(101, 1, 9.99)),
            RightEv(2, 20, "c", 4, 2, LineRow(202, 2, 19.99))),
        Seq(TxEnd(1, 100, 1, 1))))
      q1.processAllAvailable()
      emitted.synchronized(emitted.toSeq) shouldBe Seq((1L, 100L))
      q1.stop()

      // incarnation 2: same checkpoint — tx 2's END arrives; its doc must
      // join the BUFFERED incarnation-1 data, and tx 1 must NOT re-emit
      val q2 = startQuery()
      in.addData(toNative(Seq.empty, Seq.empty, Seq(TxEnd(2, 200, 1, 1))))
      q2.processAllAvailable()
      val rows = emitted.synchronized(emitted.toArray)
      q2.stop()
      rows.count(_ == ((1L, 100L))) shouldBe 1 // no re-emission across incarnations
      val doc2 = rows.filter(_._1 == 2L)
      doc2 shouldBe Array((2L, 200L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
