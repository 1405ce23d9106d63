package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Ordered._
import graft.cdc.Envelope
import graft.tx.TxReplay

/** Driver-verifiable queries for the transactional-CDC replay engine
  * (SURVEY.md §2 J1/A1/J4/O3/O4/O9/O10). CDC event streams are synthesized
  * DETERMINISTICALLY from the driver parquet tables so the DuckDB oracle can
  * reproduce the expected emission sequence in plain SQL:
  *
  *  - orders → parent ('left') change stream: op 'c', key = o_orderkey,
  *    lsn = o_orderkey*100, tx = o_orderkey div 10 (10 orders per tx).
  *  - lineitem → child ('right') change stream: line_id = l_linenumber,
  *    op 'd' where l_returnflag = 'R' (deleted lines), else 'c',
  *    lsn = o_orderkey*100 + l_linenumber.
  *  - tx END events: commit_lsn = 1000000 + tx_id (commit order == tx order),
  *    expected counts = actual counts, except where a test deliberately
  *    understates/overstates them to exercise the completeness stall.
  */
object TxQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TxBase = 1000000L

  /** orders as the parent CDC stream. */
  private def leftEvents(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey").as("key"),
      lit("c").as("op"),
      (col("o_orderkey") * 100).as("lsn"),
      expr("o_orderkey div 10").as("tx_id"),
      struct(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority")).as("row"))

  /** lineitem as the child CDC stream; 'R' return flag plays the delete op.
    * l_linenumber is NOT unique per order in the synthetic data, so line_id
    * is the composite (l_linenumber, l_partkey, l_suppkey) packed into one
    * long — unique per order at sf0.01/0.1 (verified), and the oracle can
    * recompute it. lsn = line_id (one event per line → unique per key).
    */
  private def rightEvents(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey").as("key"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey")
        .as("line_id"),
      when(col("l_returnflag") === "R", "d").otherwise("c").as("op"),
      expr("(CAST(l_linenumber AS BIGINT) * 100000 + l_partkey) * 1000 + l_suppkey")
        .as("lsn"),
      expr("l_orderkey div 10").as("tx_id"),
      struct(col("l_partkey"), col("l_quantity"), col("l_extendedprice")).as("row"))

  /** tx END dimension with expected == actual counts; `tamperRight` adds a
    * phantom expected event to the given tx (making it incomplete forever —
    * the WatermarkInjector stall case).
    */
  private def txEnds(left: DataFrame, right: DataFrame,
                     tamperRightTx: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val nl = left.groupBy("tx_id").agg(count(lit(1)).as("expected_left"))
    val nr = right.groupBy("tx_id").agg(count(lit(1)).as("expected_right"))
    val base = nl.join(nr, Seq("tx_id"), "full")
      .na.fill(0L, Seq("expected_left", "expected_right"))
      .withColumn("commit_lsn", lit(TxBase) + col("tx_id"))
    tamperRightTx match {
      case None => base
      case Some(cond) =>
        base.withColumn("expected_right",
          when(cond, col("expected_right") + 1).otherwise(col("expected_right")))
    }
  }

  /** END dimension + reachable-tx set from ONE pass over the event streams.
    *
    * These queries synthesize `expected_*` FROM the actual per-tx counts, so
    * letting [[TxReplay.replay]] derive completeness internally re-aggregates
    * both event streams a second time (replay can't know the END counts came
    * from the same aggregation). Computing the counts once (cached — a
    * tx-DIMENSION table, one row per tx), deriving the END events from it,
    * and handing replay the precomputed `reachable` set through its
    * streaming-caller parameter halves the event-side aggregation passes.
    * Same emission bit-for-bit: [[TxReplay.txCompletenessFromCounts]] is
    * exactly the aggregation replay would run ([[TxReplay.txCompleteness]]
    * delegates to it).
    *
    * @param tamper  post-processing of the END dimension (phantom expected
    *   counts — the completeness-stall probes); applied BEFORE reachability
    *   so the stall rule sees the tampered counts, as replay's internal path
    *   would.
    */
  private def endsAndReachable(left: DataFrame, right: DataFrame,
                               tamper: DataFrame => DataFrame = identity)
      : (DataFrame, DataFrame) = {
    val counts = left.groupBy("tx_id").agg(count(lit(1)).as("n_left"))
      .join(right.groupBy("tx_id").agg(count(lit(1)).as("n_right")), Seq("tx_id"), "full")
      .na.fill(0L, Seq("n_left", "n_right"))
      .cache()
    val ends = tamper(counts.select(col("tx_id"),
      col("n_left").as("expected_left"), col("n_right").as("expected_right"),
      (lit(TxBase) + col("tx_id")).as("commit_lsn")))
    val reachable = TxReplay.txCompletenessFromCounts(counts, ends)
      .filter(col("reachable")).select("tx_id", "commit_lsn")
      .cache()
    (ends, reachable)
  }

  /** Flatten the replay output for the oracle compare: header columns at top
    * level, lines as canonical JSON text, total order on (key, commit_lsn).
    */
  private def present(emitted: DataFrame): DataFrame =
    emitted.select(
      col("key"), col("commit_lsn"),
      col("row.o_custkey").as("o_custkey"),
      col("row.o_orderstatus").as("o_orderstatus"),
      col("row.o_totalprice").as("o_totalprice"),
      col("row.o_orderdate").as("o_orderdate"),
      col("row.o_orderpriority").as("o_orderpriority"),
      to_json(col("lines")).as("lines"),
      col("deleted"))
      .ordered("key", "commit_lsn")

  val queries: Map[String, Q] = Map(
    // J1+A1+O3+O9 end-to-end: one doc per (order, tx), with the final 4 txs
    // unreachable: tx (max-3) is made incomplete, so complete txs behind it
    // stall too (contiguity rule, WatermarkInjector.java:127-147).
    "q_tx_replay_orders" -> ((s, d) => {
      val l = leftEvents(s, d)
      val r = rightEvents(s, d)
      val maxTx = l.agg(max("tx_id").as("max_tx"))
      val (ends, reachable) = endsAndReachable(l, r, tamper = base =>
        base.crossJoin(broadcast(maxTx))
          .withColumn("expected_right",
            when(col("tx_id") === col("max_tx") - 3, col("expected_right") + 1)
              .otherwise(col("expected_right")))
          .drop("max_tx"))
      present(TxReplay.replay(l, r, ends, reachable = Some(reachable)))
    }),

    // The same end-to-end replay through the sorted per-key scan form —
    // identical semantics and oracle; the hot-key (many-txs-per-key) plan.
    "q_tx_replay_sorted" -> ((s, d) => {
      val l = leftEvents(s, d)
      val r = rightEvents(s, d)
      val maxTx = l.agg(max("tx_id").as("max_tx"))
      val (ends, reachable) = endsAndReachable(l, r, tamper = base =>
        base.crossJoin(broadcast(maxTx))
          .withColumn("expected_right",
            when(col("tx_id") === col("max_tx") - 3, col("expected_right") + 1)
              .otherwise(col("expected_right")))
          .drop("max_tx"))
      present(TxReplay.replaySorted(l, r, ends, reachable = Some(reachable)))
    }),

    // A1 accumulation across transactions (IT scenario 3 shape): odd-suppkey
    // lines commit with their order; even-suppkey lines commit in a later
    // tx (+50000) → a second, cumulative doc per affected order.
    // (line_id % 2 == l_suppkey % 2 since the packing multiplier is even.)
    "q_tx_accumulate" -> ((s, d) => {
      val l = leftEvents(s, d)
      val r0 = rightEvents(s, d)
      val r = r0.withColumn("tx_id",
        when(col("line_id") % 2 === 0, col("tx_id") + 50000).otherwise(col("tx_id")))
      val (ends, reachable) = endsAndReachable(l, r)
      present(TxReplay.replay(l, r, ends, reachable = Some(reachable)))
    }),

    // O10/S8 tombstones: orders with status 'F' get a delete event in a late
    // tx (base tx + 100000) → the doc for that (key, tx) is a null value.
    "q_tx_tombstones" -> ((s, d) => {
      val l0 = leftEvents(s, d)
      val deletes = Tables.orders(s, d).filter(col("o_orderstatus") === "F").select(
        col("o_orderkey").as("key"),
        lit("d").as("op"),
        (col("o_orderkey") * 100 + 99).as("lsn"),
        expr("o_orderkey div 10 + 100000").as("tx_id"),
        struct(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")).as("row"))
      val l = l0.unionByName(deletes)
      val r = rightEvents(s, d)
      val (ends, reachable) = endsAndReachable(l, r)
      // timestampFormat matches DuckDB's JSON timestamp rendering
      TxReplay.replay(l, r, ends, reachable = Some(reachable)).select(
        col("key"), col("commit_lsn"),
        when(col("deleted"), lit(null).cast(StringType))
          .otherwise(to_json(struct(col("row"), col("lines")),
            Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss",
                "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss"))).as("doc"))
        .ordered("key", "commit_lsn")
    }),

    // S-layer for the tx engine: the Debezium TRANSACTION-METADATA topic
    // decoded into the txEnds dimension. BEGIN/END JSON is synthesized from
    // the per-tx counts (Debezium lists only tables WITH events — the
    // zero-count side exercises the idle-table default), then decodeTxEnds
    // filters ENDs, parses "<txId>:<commitLsn>", and extracts per-table
    // counts.
    "q_tx_topic_decode" -> ((s, d) => {
      val l = leftEvents(s, d)
      val r = rightEvents(s, d)
      val ends = txEnds(l, r)
      val collections = filter(array(
        struct(lit("inventory.purchaseorders").as("data_collection"),
          col("expected_left").as("event_count")),
        struct(lit("inventory.orderlines").as("data_collection"),
          col("expected_right").as("event_count"))),
        c => c.getField("event_count") > 0)
      val endJson = ends.select(to_json(struct(
        lit("END").as("status"),
        concat_ws(":", col("tx_id"), col("commit_lsn")).as("id"),
        (col("expected_left") + col("expected_right")).as("event_count"),
        collections.as("data_collections"),
        (lit(1700000000000L) + col("tx_id")).as("ts_ms"))).as("payload"))
      val beginJson = ends.select(to_json(struct(
        lit("BEGIN").as("status"),
        concat_ws(":", col("tx_id"), col("commit_lsn")).as("id"),
        lit(null).cast(LongType).as("event_count"),
        lit(null).cast(Envelope.txEventSchema("data_collections").dataType)
          .as("data_collections"),
        (lit(1700000000000L) + col("tx_id")).as("ts_ms"))).as("payload"))
      Envelope.decodeTxEnds(endJson.unionByName(beginJson), "payload",
        "inventory.purchaseorders", "inventory.orderlines")
        .ordered("tx_id")
    }),

    // O4: commit-LSN fix — events carry only a tx id; the commit LSN comes
    // from the tx END event; txs without an END (id % 100 == 13) stay
    // buffered, i.e. withheld (CommitLsnFixer.java:63-93).
    "q_commitlsn_fix" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"), expr("event_id div 20").as("tx_id"))
      val ends = ev.select("tx_id").distinct()
        .filter(expr("tx_id % 100") =!= 13)
        .withColumn("commit_lsn", lit(7000000L) + col("tx_id"))
      TxReplay.fixCommitLsn(ev, ends)
        .select("event_id", "user_id", "commit_lsn")
        .ordered("event_id")
    }),

    // O3/A4: tx completeness + contiguous-watermark reachability as data —
    // txs with id % 50 == 7 expect one more event than arrived (incomplete);
    // the first of them stalls every later tx (complete or not).
    "q_tx_watermark" -> ((s, d) => {
      val ev = Tables.events(s, d).select(expr("event_id div 20").as("tx_id"))
      val cnt = ev.groupBy("tx_id").agg(count(lit(1)).as("n"))
      val ends = cnt.select(
        col("tx_id"),
        (lit(7000000L) + col("tx_id")).as("commit_lsn"),
        (col("n") + when(expr("tx_id % 50") === 7, 1L).otherwise(0L)).as("expected_left"),
        col("n").as("expected_right"))
      TxReplay.txCompleteness(ev, ev, ends)
        .select("tx_id", "commit_lsn", "n_left", "n_right", "complete", "reachable")
        .ordered("tx_id")
    })
  )

  private val lineId = "(CAST(l.l_linenumber AS BIGINT) * 100000 + l.l_partkey) * 1000 + l.l_suppkey"

  private val linesJson =
    s"""to_json(coalesce(array_agg({'line_id': $lineId,
      |   'row': {'l_partkey': l.l_partkey, 'l_quantity': l.l_quantity,
      |           'l_extendedprice': l.l_extendedprice}}
      |   ORDER BY $lineId) FILTER (WHERE l.l_returnflag <> 'R'), []))""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_tx_replay_orders" ->
      s"""SELECT o.o_orderkey AS key, 1000000 + (o.o_orderkey // 10) AS commit_lsn,
        | o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        | $linesJson AS lines,
        | false AS deleted
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE (o.o_orderkey // 10) < (SELECT max(o_orderkey // 10) FROM orders) - 3
        |GROUP BY ALL ORDER BY key, commit_lsn""".stripMargin,

    // identical semantics to q_tx_replay_orders (the sorted-scan form)
    "q_tx_replay_sorted" ->
      s"""SELECT o.o_orderkey AS key, 1000000 + (o.o_orderkey // 10) AS commit_lsn,
        | o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        | $linesJson AS lines,
        | false AS deleted
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE (o.o_orderkey // 10) < (SELECT max(o_orderkey // 10) FROM orders) - 3
        |GROUP BY ALL ORDER BY key, commit_lsn""".stripMargin,

    "q_tx_accumulate" ->
      s"""WITH first_doc AS (
        | SELECT o.o_orderkey AS key, 1000000 + (o.o_orderkey // 10) AS commit_lsn,
        |  o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |  $linesJson AS lines, false AS deleted
        | FROM orders o JOIN lineitem l
        |   ON o.o_orderkey = l.l_orderkey AND l.l_suppkey % 2 = 1
        | GROUP BY ALL),
        |second_doc AS (
        | SELECT o.o_orderkey AS key, 1050000 + (o.o_orderkey // 10) AS commit_lsn,
        |  o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |  $linesJson AS lines, false AS deleted
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | WHERE EXISTS (SELECT 1 FROM lineitem e
        |   WHERE e.l_orderkey = o.o_orderkey AND e.l_suppkey % 2 = 0)
        | GROUP BY ALL)
        |SELECT * FROM (SELECT * FROM first_doc UNION ALL SELECT * FROM second_doc)
        |ORDER BY key, commit_lsn""".stripMargin,

    "q_tx_tombstones" ->
      s"""WITH agg AS (
        | SELECT o.o_orderkey AS key, 1000000 + (o.o_orderkey // 10) AS commit_lsn,
        |  o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |  coalesce(array_agg({'line_id': $lineId,
        |    'row': {'l_partkey': l.l_partkey, 'l_quantity': l.l_quantity,
        |            'l_extendedprice': l.l_extendedprice}}
        |    ORDER BY $lineId) FILTER (WHERE l.l_returnflag <> 'R'), []) AS lines_arr
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | GROUP BY ALL),
        |docs AS (
        | SELECT key, commit_lsn,
        |  to_json({'row': {'o_custkey': o_custkey, 'o_orderstatus': o_orderstatus,
        |    'o_totalprice': o_totalprice, 'o_orderdate': o_orderdate,
        |    'o_orderpriority': o_orderpriority}, 'lines': lines_arr}) AS doc
        | FROM agg),
        |tombs AS (
        | SELECT o.o_orderkey AS key, 1100000 + (o.o_orderkey // 10) AS commit_lsn,
        |  CAST(NULL AS VARCHAR) AS doc
        | FROM orders o
        | WHERE o.o_orderstatus = 'F'
        |   AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |SELECT * FROM (SELECT * FROM docs UNION ALL SELECT * FROM tombs)
        |ORDER BY key, commit_lsn""".stripMargin,

    "q_tx_topic_decode" ->
      """WITH nl AS (SELECT o_orderkey // 10 AS tx_id, count(*) AS expected_left
        |            FROM orders GROUP BY 1),
        |nr AS (SELECT l_orderkey // 10 AS tx_id, count(*) AS expected_right
        |       FROM lineitem GROUP BY 1)
        |SELECT coalesce(nl.tx_id, nr.tx_id) AS tx_id,
        | 1000000 + coalesce(nl.tx_id, nr.tx_id) AS commit_lsn,
        | coalesce(expected_left, 0) AS expected_left,
        | coalesce(expected_right, 0) AS expected_right
        |FROM nl FULL JOIN nr ON nl.tx_id = nr.tx_id
        |ORDER BY tx_id""".stripMargin,

    "q_commitlsn_fix" ->
      """SELECT event_id, user_id, 7000000 + (event_id // 20) AS commit_lsn
        |FROM events WHERE (event_id // 20) % 100 <> 13
        |ORDER BY event_id""".stripMargin,

    "q_tx_watermark" ->
      """WITH tx AS (SELECT event_id // 20 AS tx_id, count(*) AS n FROM events GROUP BY 1),
        |flags AS (SELECT tx_id, 7000000 + tx_id AS commit_lsn, n AS n_left, n AS n_right,
        |  (tx_id % 50 <> 7) AS complete FROM tx)
        |SELECT tx_id, commit_lsn, n_left, n_right, complete,
        | complete AND commit_lsn < coalesce(
        |   (SELECT min(commit_lsn) FROM flags WHERE NOT complete),
        |   9223372036854775807) AS reachable
        |FROM flags ORDER BY tx_id""".stripMargin
  )
}
