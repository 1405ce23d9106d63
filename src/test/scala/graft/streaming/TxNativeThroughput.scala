package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Harness-local payload shapes (the fixture's struct columns, typed).
case class NtOrow(o_custkey: Long, o_orderstatus: String)
case class NtLrow(l_partkey: Long, l_quantity: Double)
case class NtEv(stream: String, key: Long, line_id: Long, op: String,
                lsn: Long, tx_id: Long, orow: NtOrow, lrow: NtLrow,
                commit_lsn: Long, expected_left: Long, expected_right: Long)

/** Throughput measure for the streaming-NATIVE tx replay engine
  * ([[TxReplayNative]], the transformWithState chain on RocksDB state):
  * `sbt "Test/runMain graft.streaming.TxNativeThroughput [sfDir] [nBatches]"`.
  * Same fixture synthesis and commit-contiguous batch slicing as
  * [[TxStreamThroughput]], driven through a real MemoryStream query, so
  * the two engines' numbers are directly comparable.
  */
object TxNativeThroughput {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("tx-native-throughput")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)

    val orders = graft.Tables.orders(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    val left = orders.select(lit("l").as("stream"),
      col("o_orderkey").as("key"), lit(-1L).as("line_id"), lit("c").as("op"),
      (col("o_orderkey") * 100).as("lsn"), expr("o_orderkey div 10").as("tx_id"),
      struct(col("o_custkey"), col("o_orderstatus")).as("orow"),
      lit(null).cast("struct<l_partkey:bigint,l_quantity:double>").as("lrow"),
      lit(-1L).as("commit_lsn"), lit(-1L).as("expected_left"), lit(-1L).as("expected_right"))
    val right = lineitem.select(lit("r").as("stream"),
      col("l_orderkey").as("key"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("line_id"),
      when(col("l_returnflag") === "R", "d").otherwise("c").as("op"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("lsn"),
      expr("l_orderkey div 10").as("tx_id"),
      lit(null).cast("struct<o_custkey:bigint,o_orderstatus:string>").as("orow"),
      struct(col("l_partkey"), col("l_quantity")).as("lrow"),
      lit(-1L).as("commit_lsn"), lit(-1L).as("expected_left"), lit(-1L).as("expected_right"))
    val ends = left.groupBy("tx_id").agg(count(lit(1)).as("expected_left"))
      .join(right.groupBy("tx_id").agg(count(lit(1)).as("expected_right")),
        Seq("tx_id"), "full")
      .na.fill(0L, Seq("expected_left", "expected_right"))
      .select(lit("t").as("stream"), lit(-1L).as("key"), lit(-1L).as("line_id"),
        lit(null).cast("string").as("op"), lit(-1L).as("lsn"), col("tx_id"),
        lit(null).cast("struct<o_custkey:bigint,o_orderstatus:string>").as("orow"),
        lit(null).cast("struct<l_partkey:bigint,l_quantity:double>").as("lrow"),
        (lit(1000000L) + col("tx_id")).as("commit_lsn"),
        col("expected_left"), col("expected_right"))

    val all = left.unionByName(right).unionByName(ends).as[NtEv].cache()
    val maxTx = all.agg(max("tx_id")).collect()(0).getLong(0)
    val step = maxTx / nBatches + 1
    val nEvents = all.filter(col("stream") =!= "t").count()
    // commit-contiguous slices collected to the driver (MemoryStream input)
    val slices = (0 until nBatches).map { i =>
      all.filter(col("tx_id") >= i * step && col("tx_id") < (i + 1) * step)
        .collect().toSeq
    }
    all.unpersist()

    val in = MemoryStream[NtEv]
    val df = in.toDF()
    val l = df.filter(col("stream") === "l")
      .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
    val r = df.filter(col("stream") === "r")
      .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
        col("lrow").as("row"))
    val e = df.filter(col("stream") === "t")
      .select(col("tx_id"), col("commit_lsn"), col("expected_left"), col("expected_right"))
    val q = TxReplayNative.docs(l, r, e)
      .writeStream.format("memory").queryName("native_tp").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("tx-native-tp").toString)
      .start()
    val t0 = System.nanoTime()
    slices.foreach { b => in.addData(b); q.processAllAvailable() }
    val secs = (System.nanoTime() - t0) / 1e9
    val docs = spark.table("native_tp").count()
    q.stop()
    println(f"NATIVE-THROUGHPUT events=$nEvents docs=$docs batches=$nBatches " +
      f"wall=$secs%.1fs events_per_s=${nEvents / secs}%.0f docs_per_s=${docs / secs}%.0f")
    spark.stop()
  }
}
