package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Throughput measure for the micro-batch tx replay engine:
  * `sbt "Test/runMain graft.streaming.TxStreamThroughput [sfDir] [nBatches]"`.
  * Slices the sf tx-stream fixture (orders/lineitem as CDC events, one tx
  * per 10 orders — same synthesis as TxQueries) into commit-contiguous
  * micro-batches, drives TxReplayStream.processBatch over them, and prints
  * events/s and docs/s including state persistence + compaction per batch.
  */
object TxStreamThroughput {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("tx-throughput")
    // experiment knobs for per-batch fixed-cost A/Bs (SCALING.md r6)
    sys.env.get("GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v == "1"))
    sys.env.get("GRAFT_SHUFFLE").foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v.toInt))
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)

    val orders = graft.Tables.orders(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    val left = orders.select(col("o_orderkey").as("key"), lit("c").as("op"),
      (col("o_orderkey") * 100).as("lsn"), expr("o_orderkey div 10").as("tx_id"),
      struct(col("o_custkey"), col("o_orderstatus")).as("row"))
    val right = lineitem.select(col("l_orderkey").as("key"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("line_id"),
      when(col("l_returnflag") === "R", "d").otherwise("c").as("op"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("lsn"),
      expr("l_orderkey div 10").as("tx_id"),
      struct(col("l_partkey"), col("l_quantity")).as("row"))
    val nl = left.groupBy("tx_id").agg(count(lit(1)).as("expected_left"))
    val nr = right.groupBy("tx_id").agg(count(lit(1)).as("expected_right"))
    val ends = nl.join(nr, Seq("tx_id"), "full")
      .na.fill(0L, Seq("expected_left", "expected_right"))
      .withColumn("commit_lsn", lit(1000000L) + col("tx_id")).cache()

    val maxTx = ends.agg(max("tx_id")).collect()(0).getLong(0)
    val step = maxTx / nBatches + 1
    val nEvents = left.count() + right.count()

    val engine = new TxReplayStream(spark,
      Files.createTempDirectory("tx-throughput").toString)
    var docs = 0L
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      val lo = i * step
      val hi = lo + step
      def slice(df: org.apache.spark.sql.DataFrame) =
        df.filter(col("tx_id") >= lo && col("tx_id") < hi)
      docs += engine.processBatch(slice(left), slice(right), slice(ends)).count()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"THROUGHPUT events=$nEvents docs=$docs batches=$nBatches " +
      f"wall=$secs%.1fs events_per_s=${nEvents / secs}%.0f docs_per_s=${docs / secs}%.0f")
    spark.stop()
  }
}
