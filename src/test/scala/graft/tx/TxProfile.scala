package graft.tx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase/variant profiler for the tx replay over the synthetic CDC streams:
  * `sbt "Test/runMain graft.tx.TxProfile [sfDir] [reps]"`. Reports each
  * variant's full-replay time per rep — run ≥3 reps and read the minimum
  * (shared host).
  */
object TxProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("tx-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Full replay, parameterized on how `probes` is staged. */
    def replayVariant(stage: DataFrame => DataFrame): DataFrame = {
      val endsC = ends.cache()
      val le = TxReplay.fixCommitLsn(l, endsC)
      val re = TxReplay.fixCommitLsn(r, endsC)
      val reach = TxReplay.txCompleteness(l, r, endsC)
        .filter(col("reachable")).select("tx_id", "commit_lsn").cache()
      val lr = le.join(broadcast(reach.select("tx_id")), Seq("tx_id"))
      val rr = re.join(broadcast(reach.select("tx_id")), Seq("tx_id"))
      val probes = stage(
        lr.select(col("key"), col("commit_lsn"))
          .union(rr.select(col("key"), col("commit_lsn")))
          .distinct()
          .withColumnRenamed("commit_lsn", "probe_lsn"))
      val header = probes.join(le, Seq("key"))
        .where(col("commit_lsn") <= col("probe_lsn"))
        .groupBy("key", "probe_lsn")
        .agg(max_by(struct(col("commit_lsn"), col("op"), col("row")),
          struct(col("commit_lsn"), col("lsn"))).as("h"))
        .select(col("key"), col("probe_lsn"),
          col("h.commit_lsn").as("left_lsn"), col("h.op").as("left_op"),
          col("h.row").as("row"))
      val latestLines = probes.join(re, Seq("key"))
        .where(col("commit_lsn") <= col("probe_lsn"))
        .groupBy("key", "probe_lsn", "line_id")
        .agg(max_by(struct(col("op"), col("row")),
          struct(col("commit_lsn"), col("lsn"))).as("v"))
      val lines = latestLines
        .groupBy("key", "probe_lsn")
        .agg(count(lit(1)).as("n_pairs"),
          sort_array(collect_list(
            when(col("v.op") =!= "d", struct(col("line_id"), col("v.row").as("row")))))
            .as("lines"))
      header.join(lines, Seq("key", "probe_lsn"), "left")
        .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
        .where(col("left_lsn") < col("probe_lsn") || col("n_pairs") > 0)
        .select(col("key"), col("probe_lsn").as("commit_lsn"), col("row"),
          col("lines"), (col("left_op") === "d").as("deleted"))
    }

    val n = spark.sessionState.conf.numShufflePartitions
    val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
      "plain        " -> identity,
      "cache        " -> (_.cache()),
      "repart+cache " -> (df => df.repartition(n, col("key")).cache()),
      "repart       " -> (_.repartition(n, col("key"))))

    // warmup
    noop(replayVariant(identity)); spark.catalog.clearCache()

    (1 to reps).foreach { i =>
      variants.foreach { case (name, v) =>
        timed(s"$name rep$i")(noop(replayVariant(v)))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
