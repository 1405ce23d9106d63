package graft.tx

/** Phase profiler for the tx replay over the synthetic CDC streams:
  * `sbt "Test/runMain graft.tx.TxProfile [sfDir]"`.
  */
object TxProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("tx-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val orders = graft.Tables.orders(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    val l = orders.select(col("o_orderkey").as("key"), lit("c").as("op"),
      (col("o_orderkey") * 100).as("lsn"), expr("o_orderkey div 10").as("tx_id"),
      struct(col("o_custkey"), col("o_orderstatus")).as("row"))
    val r = lineitem.select(col("l_orderkey").as("key"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("line_id"),
      when(col("l_returnflag") === "R", "d").otherwise("c").as("op"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("lsn"),
      expr("l_orderkey div 10").as("tx_id"),
      struct(col("l_partkey"), col("l_quantity")).as("row"))
    val nl = l.groupBy("tx_id").agg(count(lit(1)).as("expected_left"))
    val nr = r.groupBy("tx_id").agg(count(lit(1)).as("expected_right"))
    val ends = nl.join(nr, Seq("tx_id"), "full")
      .na.fill(0L, Seq("expected_left", "expected_right"))
      .withColumn("commit_lsn", lit(1000000L) + col("tx_id"))

    timed("scan l")(l.write.format("noop").mode("overwrite").save())
    timed("scan r")(r.write.format("noop").mode("overwrite").save())
    timed("ends")(ends.write.format("noop").mode("overwrite").save())
    timed("completeness")(
      TxReplay.txCompleteness(l, r, ends).write.format("noop").mode("overwrite").save())
    timed("replay-full")(
      TxReplay.replay(l, r, ends).write.format("noop").mode("overwrite").save())
    timed("replay-again")(
      TxReplay.replay(l, r, ends).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
