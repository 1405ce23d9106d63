package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Stateful.ToastEvent

/** Hand-runnable drive of the streaming surface (forked, proper JVM opts):
  * `sbt "Test/runMain graft.streaming.StreamingDemo"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-streaming-demo")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[ToastEvent]
    val q = Stateful.toastBackfill(in.toDS()).writeStream.format("memory")
      .queryName("t").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-demo-ckpt").toString)
      .start()
    in.addData(ToastEvent(9, "c", 1, "hello-bio"))
    q.processAllAvailable()
    in.addData(ToastEvent(9, "u", 2, graft.cdc.Envelope.ToastSentinel))
    q.processAllAvailable()
    println("DRIVE-RESULT: " + spark.table("t").as[ToastEvent].collect()
      .sortBy(_.lsn).map(e => (e.id, e.op, e.value)).mkString(" | "))
    q.stop()

    // micro-batch tx replay: END arrives a batch after its events
    import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd}
    val engine = new TxReplayStream(spark,
      java.nio.file.Files.createTempDirectory("graft-demo-tx").toString)
    val b1 = engine.processBatch(
      Seq(LeftEv(1, "c", 1, 1, OrderRow(7, "addr"))).toDF(),
      Seq(RightEv(1, 10, "c", 2, 1, LineRow(101, 1, 9.99))).toDF(),
      Seq.empty[TxEnd].toDF())
    println(s"DRIVE-TX-BATCH1: emitted=${b1.count()} wm=${engine.currentWatermark}")
    val b2 = engine.processBatch(
      Seq.empty[LeftEv].toDF(), Seq.empty[RightEv].toDF(),
      Seq(TxEnd(1, 100, 1, 1)).toDF())
    println(s"DRIVE-TX-BATCH2: emitted=${b2.count()} wm=${engine.currentWatermark}")

    // file-based envelope source with metadata/proctime + metrics listener
    import org.apache.spark.sql.types._
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val dir = java.nio.file.Files.createTempDirectory("graft-demo-src")
    java.nio.file.Files.writeString(dir.resolve("ev.jsonl"),
      """{"after":{"id":1},"source":{"lsn":10},"op":"c","ts_ms":1,"transaction":{"id":"5:100"}}""" + "\n")
    val rowSchema = StructType(Seq(StructField("id", LongType)))
    val src = graft.sources.EnvelopeSource.fileStream(spark, dir.toString, rowSchema)
      .writeStream.format("memory").queryName("src_demo")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-demo-src-ckpt").toString)
      .start()
    src.processAllAvailable()
    val row = spark.table("src_demo")
      .selectExpr("after.id", "op", "src_file IS NOT NULL", "proctime IS NOT NULL")
      .collect().head
    println(s"DRIVE-SRC: $row")
    Thread.sleep(2000)
    println(s"DRIVE-METRICS: ${listener.snapshot.get("src_demo").map(m => (m.eventsSeen, m.batches))}")
    src.stop()
    spark.stop()
  }
}
