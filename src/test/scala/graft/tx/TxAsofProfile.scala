package graft.tx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B profiler for the header as-of inside the tx replay: the shipped
  * probes⋈events + max_by form vs a union + running-window form (the
  * [[graft.ops.AsofJoin]] pattern): merge events and probes into one
  * key-partitioned (commit_lsn, lsn)-ordered stream and latch the last
  * event struct — one shuffle of V+P rows and a per-key sort instead of a
  * V×P-per-key join expansion.
  * `sbt "Test/runMain graft.tx.TxAsofProfile [sfDir] [reps]"`.
  */
object TxAsofProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("tx-asof-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // mode "hot": few keys × many committing txs each — the versioned-key
    // regime where the probes×events expansion is quadratic per key
    val hot = args.drop(2).headOption.contains("hot")
    val (l, r) =
      if (hot) {
        val ev = spark.range(0, 200L * 400L).select(
          (col("id") % 200).as("key"),
          lit("u").as("op"),
          col("id").as("lsn"),
          expr("id div 200").as("tx_id"),
          struct((col("id") * 7).as("o_custkey"),
            lit("O").as("o_orderstatus")).as("row"))
        val rv = spark.range(0, 200L * 400L).select(
          (col("id") % 200).as("key"),
          (col("id") % 5).as("line_id"),
          lit("u").as("op"),
          (col("id") + 1000000000L).as("lsn"),
          expr("id div 200").as("tx_id"),
          struct((col("id") * 3).as("l_partkey"),
            (col("id") % 50).cast("decimal(15,2)").as("l_quantity")).as("row"))
        (ev, rv)
      } else {
        val orders = graft.Tables.orders(spark, sf)
        val lineitem = graft.Tables.lineitem(spark, sf)
        (orders.select(col("o_orderkey").as("key"), lit("c").as("op"),
          (col("o_orderkey") * 100).as("lsn"), expr("o_orderkey div 10").as("tx_id"),
          struct(col("o_custkey"), col("o_orderstatus")).as("row")),
          lineitem.select(col("l_orderkey").as("key"),
            expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("line_id"),
            when(col("l_returnflag") === "R", "d").otherwise("c").as("op"),
            expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey").as("lsn"),
            expr("l_orderkey div 10").as("tx_id"),
            struct(col("l_partkey"), col("l_quantity")).as("row")))
      }
    val nl = l.groupBy("tx_id").agg(count(lit(1)).as("expected_left"))
    val nr = r.groupBy("tx_id").agg(count(lit(1)).as("expected_right"))
    val ends = nl.join(nr, Seq("tx_id"), "full")
      .na.fill(0L, Seq("expected_left", "expected_right"))
      .withColumn("commit_lsn", lit(1000000L) + col("tx_id"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    /** Full replay with a pluggable header stage. */
    def replayWith(header: (DataFrame, DataFrame) => DataFrame): DataFrame = {
      val endsC = ends.cache()
      val le = TxReplay.fixCommitLsn(l, endsC)
      val re = TxReplay.fixCommitLsn(r, endsC)
      val reach = TxReplay.txCompleteness(l, r, endsC)
        .filter(col("reachable")).select("tx_id", "commit_lsn").cache()
      val lr = le.join(broadcast(reach.select("tx_id")), Seq("tx_id"))
      val rr = re.join(broadcast(reach.select("tx_id")), Seq("tx_id"))
      val probes = lr.select(col("key"), col("commit_lsn"))
        .union(rr.select(col("key"), col("commit_lsn")))
        .distinct()
        .withColumnRenamed("commit_lsn", "probe_lsn")
      val hd = header(probes, le)
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
      hd.join(lines, Seq("key", "probe_lsn"), "left")
        .withColumn("n_pairs", coalesce(col("n_pairs"), lit(0L)))
        .where(col("left_lsn") < col("probe_lsn") || col("n_pairs") > 0)
        .select(col("key"), col("probe_lsn").as("commit_lsn"), col("row"),
          col("lines"), (col("left_op") === "d").as("deleted"))
    }

    /** Shipped form: probes ⋈ events expansion + max_by. */
    def joinHeader(probes: DataFrame, le: DataFrame): DataFrame =
      probes.join(le, Seq("key"))
        .where(col("commit_lsn") <= col("probe_lsn"))
        .groupBy("key", "probe_lsn")
        .agg(max_by(struct(col("commit_lsn"), col("op"), col("row")),
          struct(col("commit_lsn"), col("lsn"))).as("h"))
        .select(col("key"), col("probe_lsn"),
          col("h.commit_lsn").as("left_lsn"), col("h.op").as("left_op"),
          col("h.row").as("row"))

    /** Union + running-window form. A probe at L sorts after every event
      * with commit_lsn <= L (events carry real lsns < MaxValue; the m
      * column breaks exact collisions event-first), so the running
      * ignore-nulls last() is exactly max_by over the <= L prefix.
      */
    def windowHeader(probes: DataFrame, le: DataFrame): DataFrame = {
      val ev = le.select(col("key"), col("commit_lsn"), col("lsn"),
        lit(0).as("m"),
        struct(col("commit_lsn"), col("op"), col("row")).as("h"))
      val pr = probes.select(col("key"), col("probe_lsn").as("commit_lsn"),
        lit(Long.MaxValue).as("lsn"), lit(1).as("m"),
        lit(null).cast(ev.schema("h").dataType).as("h"))
      val w = Window.partitionBy("key")
        .orderBy("commit_lsn", "lsn", "m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.unionByName(pr)
        .withColumn("hh", last(col("h"), ignoreNulls = true).over(w))
        .where(col("m") === 1 && col("hh").isNotNull)
        .select(col("key"), col("commit_lsn").as("probe_lsn"),
          col("hh.commit_lsn").as("left_lsn"), col("hh.op").as("left_op"),
          col("hh.row").as("row"))
    }

    /** Packed-argmax + join-back form (the r13 assignBucketsScored rule):
      * phase 1 reduces the probes⋈events expansion to the winning packed
      * (commit_lsn, lsn) per (key, probe_lsn) — a NARROW HashAggregate, no
      * sort, no payload riding the expansion — and phase 2 fetches the
      * winner's (op, row) by joining back to the events on (key, packed).
      * Requires non-negative LSNs so the Decimal(38,0) packing is
      * order-isomorphic: commit_lsn·2⁶³ + lsn < 2¹²⁶ < 10³⁸.
      */
    def packedHeader(probes: DataFrame, le: DataFrame): DataFrame = {
      val two63 = lit(BigDecimal(2).pow(63)).cast(org.apache.spark.sql.types.DecimalType(38, 0))
      val lo = le.withColumn("_ord",
        col("commit_lsn").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * two63
          + col("lsn"))
      val win = probes.join(lo, Seq("key"))
        .where(col("commit_lsn") <= col("probe_lsn"))
        .groupBy("key", "probe_lsn")
        .agg(max(col("_ord")).as("_ord"))
      win.hint("shuffle_hash").join(lo, Seq("key", "_ord"))
        .select(col("key"), col("probe_lsn"),
          col("commit_lsn").as("left_lsn"), col("op").as("left_op"), col("row"))
    }

    // equivalence gate before timing anything
    val a = replayWith(joinHeader)
    val b = replayWith(windowHeader)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"PROFILE equivalence diff rows: $diff")
    require(diff == 0, "window header is not equivalent")
    val c = replayWith(packedHeader)
    val diffP = a.exceptAll(c).count() + c.exceptAll(a).count()
    println(s"PROFILE packed equivalence diff rows: $diffP")
    require(diffP == 0, "packed header is not equivalent")
    spark.catalog.clearCache()

    noop(replayWith(joinHeader)); spark.catalog.clearCache() // warmup

    (1 to reps).foreach { i =>
      timed(s"join-header   rep$i")(noop(replayWith(joinHeader)))
      spark.catalog.clearCache()
      timed(s"window-header rep$i")(noop(replayWith(windowHeader)))
      spark.catalog.clearCache()
      timed(s"packed-header rep$i")(noop(replayWith(packedHeader)))
      spark.catalog.clearCache()
      timed(s"sorted-scan   rep$i")(noop(TxReplay.replaySorted(l, r, ends)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
