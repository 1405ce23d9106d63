package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Ordered._
import graft.cdc.Envelope
import graft.ops.{Denormalize, Layout, Materialize, RangeJoin, Toast}

/** Driver-verifiable queries covering the reference's operator surface
  * (SURVEY.md §2) over the driver parquet tables. Each entry has a DuckDB
  * oracle in [[ReferenceQueries.oracle]] with IDENTICAL column names and an
  * explicit deterministic ORDER BY.
  *
  * Determinism rules used throughout (Spark vs DuckDB hash-compare):
  *  - never `sum` raw doubles (accumulation order differs) — cast to DECIMAL
  *    first (exact), cast the final back to DOUBLE;
  *  - per-row double arithmetic is IEEE-deterministic, safe to pass through;
  *  - every query ends in a total ORDER BY on a unique key set.
  */
object ReferenceQueries {
  type Q = (SparkSession, String) => DataFrame
  private val dec = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  val queries: Map[String, Q] = Map(
    // A2-adjacent pricing summary: scan→filter→hash agg with partial combine.
    // Filter + 4-col projection push into the parquet scan.
    "q_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast(DoubleType).as("sum_price"),
          (sum(col("l_extendedprice").cast(dec)).cast(DoubleType) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n_rows"))
        .ordered("l_returnflag", "l_linestatus")
    }),

    // OLAP CUBE: all four grouping sets of (priority, status) in ONE
    // expand + aggregate pass (no per-set re-scan); grouping_id
    // disambiguates a real NULL-ish group from a subtotal row, and the
    // DECIMAL-routed sum keeps the total aggregation-order independent
    // (q_agg_pricing's convention).
    "q_cube_pricing" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast(DoubleType).as("total_price"),
          grouping_id().cast(IntegerType).as("gid"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          col("n_orders"), col("total_price"), col("gid"))
        .ordered("o_orderpriority", "o_orderstatus")
    }),

    // J3/A2 flagship: denormalized orders (poc.md:14-27). Join key == group
    // key → single shuffle, exchange reuse between join and agg. The nested
    // lines array is emitted as canonical JSON text so the driver's scalar
    // hash compare works (arrays of structs aren't hashable driver-side).
    "q_denorm_orders_lines" -> ((s, d) => {
      Denormalize.ordersWithLines(
        Tables.orders(s, d), Tables.lineitem(s, d),
        "o_orderkey", "l_orderkey",
        Seq("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"))
        .withColumn("lines", to_json(col("lines")))
        .ordered("o_orderkey")
    }),

    // P1/P12: projection + filter, pushed to the scan.
    "q_proj_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .ordered("l_orderkey", "l_linenumber")
    }),

    // P4/P5: CASE WHEN + NULLIF against a sentinel.
    "q_case_nullif" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        nullif(col("lang"), lit("und")).as("lang_checked"),
        when(col("n_chars") < 100, "short")
          .when(col("n_chars") < 300, "mid")
          .otherwise("long").as("size_bucket"))
        .ordered("doc_id")
    }),

    // P7/P8: split/split_part + concat_ws (txId:commitLsn parsing shape).
    "q_split_concat" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        split_part(col("c_name"), lit("#"), lit(2)).cast(LongType).as("name_num"),
        concat_ws(".", col("c_mktsegment"), col("c_name")).as("qualified"))
        .ordered("c_custkey")
    }),

    // P9: epoch-day / epoch-millis conversions (Debezium temporal encodings).
    "q_epoch_dates" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast(DateType))
          .cast(LongType).as("epoch_day"),
        unix_millis(col("o_orderdate").cast(TimestampType)).as("epoch_ms"),
        date_add(lit("1970-01-01").cast(DateType),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast(DateType)))
          .cast(TimestampType).as("roundtrip_date"))
        .ordered("o_orderkey")
    }),

    // P6: op-dependent key extraction shape — COALESCE over an outer join.
    // nation is tiny → Catalyst broadcasts automatically.
    "q_coalesce_key" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"))
        .ordered("c_custkey")
    }),

    // P11/S1: JSON field extraction (events.props stands in for envelope JSON).
    "q_json_get" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast(LongType)).cast(LongType).as("sum_k"),
          count(lit(1)).as("n"))
        .ordered("event_type")
    }),

    // §1.2: JSONB as a first-class type — the reference's `details jsonb`
    // column (`debezium-engine/postgres/public_inventory.sql:38`) mapped to
    // Spark 4 VARIANT instead of string+get_json_object: parse once
    // (binary-encoded, no re-parse per path), then typed path extraction
    // incl. nested objects and array indexing. The oracle recomputes the
    // same values from the base columns directly — proving the variant
    // round-trip is lossless and correctly typed.
    "q_variant" -> ((s, d) => {
      val enriched = Tables.events(s, d).withColumn("j", to_json(struct(
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        struct(col("event_type").as("t")).as("meta"),
        array(col("value"), col("value") * 2).as("arr"))))
      enriched
        .withColumn("v", parse_json(col("j")))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          variant_get(col("v"), "$.meta.t", "string").as("t"),
          variant_get(col("v"), "$.arr[1]", "double").as("v2"))
        .ordered("event_id")
    }),

    // S1+S4+S5: full envelope encode→decode roundtrip. Build a Debezium
    // envelope JSON from each event row, decode it with the typed schema,
    // re-derive txId/commitLsn (P7) — output must equal the source rows.
    "q_envelope_roundtrip" -> ((s, d) => {
      val rowSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("event_type", StringType), StructField("value", DoubleType)))
      val enveloped = Tables.events(s, d).select(to_json(struct(
        lit(null).cast(rowSchema).as("before"),
        struct(col("event_id"), col("user_id"), col("event_type"), col("value")).as("after"),
        struct(
          lit("3.4.0.Final").as("version"), lit("postgresql").as("connector"),
          lit("dbserver1").as("name"), unix_millis(col("ts")).as("ts_ms"),
          lit("false").as("snapshot"), lit("postgres").as("db"),
          lit(null).cast(StringType).as("sequence"),
          lit("inventory").as("schema"), lit("events").as("table"),
          col("event_id").as("txId"), col("event_id").as("lsn"),
          lit(null).cast(LongType).as("xmin")).as("source"),
        lit("c").as("op"), unix_millis(col("ts")).as("ts_ms"),
        struct(concat_ws(":", col("event_id"), col("event_id") * 10).as("id")).as("transaction")
      )).as("payload"))
      val env = Envelope.decode(enveloped, "payload", rowSchema)
      env.select(
        col("after.event_id").as("event_id"),
        col("after.user_id").as("user_id"),
        col("after.event_type").as("event_type"),
        col("after.value").as("value"),
        col("op"), col("source.lsn").as("lsn"),
        Envelope.txId(col("transaction.id")).as("tx_id"),
        Envelope.commitLsn(col("transaction.id")).as("commit_lsn"),
        Envelope.qualifiedTable(col("source")).as("tbl"))
        .ordered("event_id")
    }),

    // S1 robustness: dead-letter decode. Every 10th payload is truncated
    // mid-structure (invalid JSON); the quarantine decode must flag exactly
    // those, keep their raw bytes, and decode the rest normally — no
    // crashed task, no silent nulls.
    "q_envelope_quarantine" -> ((s, d) => {
      val rowSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType)))
      val enveloped = Tables.events(s, d).select(
        col("event_id").as("src_id"),
        to_json(struct(
          lit(null).cast(rowSchema).as("before"),
          struct(col("event_id"), col("user_id")).as("after"),
          lit("c").as("op"), unix_millis(col("ts")).as("ts_ms"))).as("payload"))
      val noisy = enveloped.select(col("src_id"),
        when(col("src_id") % 10 === 0, substring(col("payload"), 1, 20))
          .otherwise(col("payload")).as("payload"))
      Envelope.decodeQuarantine(noisy, "payload", rowSchema)
        .select(col("src_id"), col("corrupt"),
          col("after.event_id").as("dec_event_id"), col("op"),
          length(col("raw_payload")).as("raw_len"))
        .ordered("src_id")
    }),

    // §2.8 observability: the replication-slot lag surface
    // (`postgres-replication-slots/README.md:91-110` slot-status SQL,
    // `replication_dashboard.json` MilliSecondsBehindSource /
    // TotalNumberOfEventsSeen) as a query over the event stream: per slot
    // (event_type), confirmed position vs head, event count, ms behind,
    // CASE status. Two tiny aggregates + a broadcast of the 1-row head.
    "q_replication_lag" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val slots = ev.groupBy("event_type").agg(
        max("event_id").as("confirmed_lsn"),
        count(lit(1)).as("events_seen"),
        max("ts").as("last_event_ts"))
      val head = ev.agg(max("event_id").as("head_lsn"), max("ts").as("head_ts"))
      slots.crossJoin(broadcast(head))
        .select(col("event_type").as("slot"),
          col("confirmed_lsn"), col("head_lsn"),
          (col("head_lsn") - col("confirmed_lsn")).as("lsn_lag"),
          col("events_seen"),
          (unix_millis(col("head_ts")) - unix_millis(col("last_event_ts")))
            .as("ms_behind"),
          when(col("head_lsn") - col("confirmed_lsn") > 100, "lagging")
            .otherwise("ok").as("status"))
        .ordered("slot")
    }),

    // J4 generalized: keyed AS-OF join via union + running window (one
    // shuffle, no range-join explosion) — each error event enriched with
    // the latest strictly-prior non-error event of the same user.
    "q_asof_enrich" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id")
      val builds = ev.filter(col("event_type") =!= "error")
        .select("event_id", "user_id", "event_type", "value")
      graft.ops.AsofJoin.asofJoin(probes, builds, Seq("user_id"),
        probeTime = col("event_id"), buildTime = col("event_id"),
        buildPayload = Seq("event_id", "event_type", "value"),
        matchedCol = "prior", strict = true)
        .select(col("event_id"), col("user_id"),
          col("prior.event_id").as("prior_event_id"),
          col("prior.event_type").as("prior_event_type"),
          col("prior.value").as("prior_value"))
        .ordered("event_id")
    }),

    // O8/A3/S3: changelog → current table, latest row per key. map-side
    // combining max_by keeps shuffle volume at |keys|, not |events|.
    "q_changelog_materialize" -> ((s, d) => {
      Materialize.latestByKey(
        Tables.events(s, d), Seq("user_id"), struct(col("ts"), col("event_id")))
        .select("user_id", "event_id", "event_type", "value")
        .ordered("user_id")
    }),

    // S3/O8 with deletes: upsert semantics where event_type='error' acts as a
    // tombstone — keys whose latest event is a delete drop out of the table.
    "q_upsert_with_deletes" -> ((s, d) => {
      val norm = Tables.events(s, d).select(
        col("user_id").as("key"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"),
        struct(col("event_id"), col("event_type"), col("value")).as("after"),
        col("event_id").as("lsn"))
      Materialize.latestByKey(norm, Seq("key"), col("lsn"))
        .filter(col("op") =!= "d")
        .select(col("key").as("user_id"), col("after.event_id").as("event_id"),
          col("after.event_type").as("event_type"))
        .ordered("user_id")
    }),

    // O7: at-least-once dedup — duplicate delivery simulated by self-union.
    "q_dedup_events" -> ((s, d) => {
      val e = Tables.events(s, d).select("event_id", "user_id", "event_type")
      e.union(e).dropDuplicates("event_id").ordered("event_id")
    }),

    // W1/O1: TOAST backfill, batch OVER-agg form (SqlOverAggJob.java:109-135).
    // events.props plays the TOAST column; 'click' rows carry the sentinel.
    "q_toast_backfill" -> ((s, d) => {
      val src = Tables.events(s, d).select(
        col("user_id").as("id"), col("event_id").as("lsn"),
        when(col("event_type") === "click", Envelope.ToastSentinel)
          .otherwise(col("props")).as("biography"))
      Toast.backfill(src, "id", col("lsn"), "biography")
        .ordered("id", "lsn")
    }),

    // W1 with the reference's literal frame: RANGE 30 days PRECEDING —
    // a sentinel only backfills from values within the trailing window.
    "q_toast_backfill_range" -> ((s, d) => {
      val src = Tables.events(s, d).select(
        col("user_id").as("id"), col("event_id"), col("ts"),
        when(col("event_type") === "click", Envelope.ToastSentinel)
          .otherwise(col("props")).as("biography"))
      Toast.backfillRange(src, "id", "ts", "biography", rangeDays = 30)
        .select("id", "event_id", "biography")
        .ordered("id", "event_id")
    }),

    // O2: the SQL PTF's exact state machine (SqlPtfJob.java:131-165) — like
    // q_toast_backfill but a delete RESETS the latch: a sentinel arriving
    // after a 'd' backfills NULL, not the pre-delete value. error→'d',
    // purchase→'c', click→'u'+sentinel, rest→'u'.
    "q_toast_ptf" -> ((s, d) => {
      val src = Tables.events(s, d).select(
        col("user_id").as("id"), col("event_id").as("lsn"),
        when(col("event_type") === "error", "d")
          .when(col("event_type") === "purchase", "c")
          .otherwise("u").as("op"),
        when(col("event_type") === "click", Envelope.ToastSentinel)
          .otherwise(col("props")).as("biography"))
      Toast.backfillPtf(src, "id", col("lsn"), "op", "biography")
        .ordered("id", "lsn")
    }),

    // J4: latest-version-per-key as-of a point (the tx join's row resolution).
    "q_latest_asof" -> ((s, d) => {
      val cutoff = lit("1997-01-01").cast(TimestampType)
      Materialize.latestByKey(
        Tables.lineitem(s, d).filter(col("l_shipdate") <= cutoff),
        Seq("l_orderkey"),
        struct(col("l_shipdate"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .ordered("l_orderkey")
    }),

    // J2 shape: fact × broadcast dims enrich + aggregate.
    "q_broadcast_enrich" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec4))
            .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .ordered("p_brand")
    }),

    // A4: per-group event counting joined back to the parent (tx-completeness
    // check shape: actual count vs expected).
    "q_count_per_group" -> ((s, d) => {
      val counts = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"))
      val o = Tables.orders(s, d)
      o.join(counts, o("o_orderkey") === counts("l_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          when(coalesce(col("n_lines"), lit(0L)) >= 4, "complete")
            .otherwise("partial").as("status"))
        .ordered("o_orderkey")
    }),

    // §2.7: set operations (union / intersect / except).
    "q_set_ops" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_custkey")
      val rich = c.filter(col("c_acctbal") > 1000).select("c_custkey")
      val n3 = c.filter(col("c_nationkey") === 3).select("c_custkey")
      a.union(b).distinct().intersect(rich).except(n3).ordered("c_custkey")
    }),

    // The 100×-scale rewrite of q_set_ops: the chained distinct/intersect/
    // except runs THREE shuffle-dedups over the same base; tagging each
    // source with a flag and folding everything through ONE groupBy
    // computes the identical membership in a single shuffle (map-side
    // combine bounds volume by |keys|). Same final row set as q_set_ops,
    // plus the membership flags a pipeline usually wants anyway.
    "q_set_ops_onepass" -> ((s, d) => {
      val c = Tables.customer(s, d)
      def tagged(cond: org.apache.spark.sql.Column, tag: String) =
        c.filter(cond).select(col("c_custkey"),
          lit(tag == "ab").as("in_ab"), lit(tag == "rich").as("in_rich"),
          lit(tag == "n3").as("in_n3"))
      tagged(col("c_mktsegment") === "BUILDING" || col("c_mktsegment") === "AUTOMOBILE", "ab")
        .unionByName(tagged(col("c_acctbal") > 1000, "rich"))
        .unionByName(tagged(col("c_nationkey") === 3, "n3"))
        .groupBy("c_custkey")
        .agg(max("in_ab").as("in_ab"), max("in_rich").as("in_rich"),
          max("in_n3").as("in_n3"))
        .withColumn("selected", col("in_ab") && col("in_rich") && !col("in_n3"))
        .ordered("c_custkey")
    }),

    // A3 history-side: changelog → SCD2 versioned table — every change
    // becomes a version row with a [valid_from, valid_to) range, the newest
    // per key flagged current. One keyed window shuffle.
    "q_scd2_history" -> ((s, d) => {
      val ev = Tables.events(s, d).select(
        col("user_id").as("key"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"),
        col("event_id").as("lsn"), col("value"))
      Materialize.scd2History(ev, Seq("key"), col("lsn"))
        .select("key", "op", "lsn", "value", "valid_from", "valid_to", "is_current")
        .ordered("key", "lsn")
    }),

    // Semi/anti join surface: customers partitioned by order existence.
    // left_semi/left_anti never materialize the probe side's payload —
    // at scale they shuffle only the key column of orders.
    "q_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val o = Tables.orders(s, d).select("o_custkey")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .withColumn("has_orders", lit(true))
      val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("has_orders", lit(false))
      withOrders.unionByName(withoutOrders).ordered("c_custkey")
    }),

    // Tumbling event-time window aggregation — the batch form of the
    // Structured Streaming `window(ts, "1 hour")` + watermark pipeline
    // (streaming variant covered by WindowedAggSpec; watermarks don't
    // change batch results). Sums go through DECIMAL: cross-engine double
    // summation order is not deterministic, fixed-point is.
    "q_window_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .ordered("window_start", "event_type")
    }),

    // Sliding windows: each event lands in duration/slide = 2 overlapping
    // windows (Spark expands via an Expand node — rows × overlap factor,
    // then one hash agg; the oracle unnests the same 2 bucket candidates).
    "q_sliding_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .ordered("window_start", "event_type")
    }),

    // Session windows (gap-based sessionization) — the merge-on-overlap
    // windowing mode streaming engines use for activity sessions; Spark's
    // session_window works identically in batch and (with a watermark)
    // streaming. Boundary semantics (pinned by WindowedAggSpec): an event
    // at EXACTLY the previous event + gap still merges — a new session
    // starts only when the gap is STRICTLY GREATER than the gap duration.
    // Oracle reproduces it as gaps-and-islands SQL with the same strict
    // break.
    "q_session_agg" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
        .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
          col("user_id"), col("n"), col("sum_value"))
        .ordered("user_id", "session_start")
    }),

    // §2.7: global sort + limit (top-k). TakeOrderedAndProject — no full sort
    // shuffle; each partition keeps k, driver merges.
    "q_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    }),

    // S5 encode: change rows → Debezium-style changelog JSON (deletes carry
    // before, inserts carry after; explicit nulls like the real envelope).
    "q_changelog_encode" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val isDel = col("event_type") === "error"
      val img = struct(col("event_id"), col("value"))
      val norm = ev.select(
        col("event_id"),
        when(isDel, "d").otherwise("c").as("op"),
        when(isDel, img).as("before"),
        when(!isDel, img).as("after"),
        unix_millis(col("ts")).as("ts_ms"))
      val (k, v) = Envelope.encodeChangelogJson(
        col("event_id"), col("before"), col("after"), col("op"), col("ts_ms"))
      norm.select(col("event_id"), k.as("kafka_key"), v.as("kafka_value"))
        .ordered("event_id")
    }),

    // S6/S8 encode: upsert materialization → kafka key/value with NULL-value
    // tombstones for keys whose latest change is a delete.
    "q_upsert_encode" -> ((s, d) => {
      val norm = Tables.events(s, d).select(
        col("user_id").as("key"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"),
        struct(col("event_id"), col("event_type")).as("after"),
        col("event_id").as("lsn"))
      val latest = Materialize.latestByKey(norm, Seq("key"), col("lsn"))
      val (k, v) = Envelope.encodeUpsertKV(col("key"), col("after"), col("op") === "d")
      latest.select(col("key"), k.as("kafka_key"), v.as("kafka_value"))
        .ordered("key")
    }),

    // Debezium decimal.handling.mode=string (postgres-connector.json:20):
    // NUMERIC columns arrive as strings; decode restores exact decimals —
    // exact-sum aggregation proves no double detour.
    "q_string_decimal" -> ((s, d) => {
      val stringified = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).cast(StringType).as("price_str"))
      stringified
        .withColumn("price", Envelope.stringDecimal(col("price_str"), 18, 2))
        .groupBy("o_orderpriority")
        .agg(sum(col("price")).as("total"), count(lit(1)).as("n"))
        .ordered("o_orderpriority")
    }),

    // S7: generic (schema-less) envelope mode — row images as
    // MAP<STRING,STRING>, values extracted by key, numbers as strings.
    "q_generic_envelope" -> ((s, d) => {
      val payload = Tables.events(s, d).select(
        col("event_id").as("src_id"),
        to_json(struct(
          lit(null).cast(StringType).as("before"),
          struct(col("event_id"), col("event_type"), col("value")).as("after"),
          lit("c").as("op"),
          unix_millis(col("ts")).as("ts_ms"))).as("payload"))
      Envelope.decodeGeneric(payload, "payload")
        .select(
          element_at(col("after"), "event_id").cast(LongType).as("event_id"),
          element_at(col("after"), "event_type").as("event_type_str"),
          element_at(col("after"), "value").as("value_str"),
          col("op"))
        .ordered("event_id")
    }),

    // Equi+range join via time binning: any same-user event within 6 hours
    // after a purchase. The bin equi-join replaces the nested-loop plan a
    // bare BETWEEN predicate would get (see RangeJoin).
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val win = 21600000L // 6 h in ms
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("purchase_id"),
        unix_millis(col("ts")).as("start_ms"),
        (unix_millis(col("ts")) + win).as("end_ms"))
      val others = ev.filter(col("event_type") =!= "purchase").select(
        col("user_id"), col("event_id"), unix_millis(col("ts")).as("t_ms"))
      RangeJoin.pointInInterval(others, purchases, Seq("user_id"),
        "t_ms", "start_ms", "end_ms", binWidth = win)
        .select(col("user_id"), col("purchase_id"), col("event_id"),
          (col("t_ms") - col("start_ms")).as("gap_ms"))
        .ordered("purchase_id", "event_id")
    }),

    // Retract-mode aggregation (Flink's changelog-aware aggregates): an
    // envelope stream — inserts for every event, −U/+U pairs doubling the
    // value where event_id % 7 = 0, deletes for errors — maintains per-user
    // count/sum by SIGNED contribution in one hash agg; the oracle aggregates
    // the equivalent final table directly.
    "q_retract_agg" -> ((s, d) => {
      val dec = DecimalType(18, 2)
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"),
        col("value").cast(dec).as("v"), col("event_type"))
      val isDel = col("event_type") === "error"
      val isUpd = !isDel && col("event_id") % 7 === 0
      val img = struct(col("user_id"), col("v"))
      val imgDoubled = struct(col("user_id"), (col("v") * 2).cast(dec).as("v"))
      val never = lit(false)
      val env = ev.select(when(never, img).as("before"), img.as("after"))
        .unionByName(ev.filter(isUpd).select(img.as("before"), imgDoubled.as("after")))
        .unionByName(ev.filter(isDel).select(img.as("before"), when(never, img).as("after")))
      Materialize.retractAgg(Materialize.retractions(env), Seq("user_id"), col("v"))
        .select(col("user_id"), col("n_live"),
          col("sum_value").cast(DoubleType).as("sum_value"),
          (col("sum_value").cast(DoubleType) / col("n_live")).as("avg_value"))
        .ordered("user_id")
    }),

    // Table profiling (ANALYZE-style column statistics): per-column min /
    // max / exact distinct count / null fraction in ONE pass over the scan
    // — the stats a cost-based optimizer and a data-quality monitor both
    // feed on. Multiple count(DISTINCT) in one agg expand via a single
    // Expand node (one shuffle), not one scan per column.
    "q_table_stats" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.agg(
        count(lit(1)).as("n_rows"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"),
        countDistinct("o_custkey").as("ndv_custkey"),
        countDistinct("o_orderpriority").as("ndv_priority"),
        round(sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)), 6).as("null_frac_status"))
    }),

    // Ranking-window family: ntile / percent_rank / cume_dist / dense_rank
    // over a totally-ordered partition (tie-broken by key so both engines
    // rank identically). One keyed shuffle + per-partition sort.
    "q_rank_funcs" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        dense_rank().over(w).as("drank"))
        .ordered("o_orderkey")
    }),

    // Boolean / conditional aggregate family: count_if, bool_and, bool_or,
    // and a tie-deterministic max_by (ordering struct includes the id).
    "q_bool_aggs" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          expr("count_if(event_type = 'error')").as("n_errors"),
          expr("bool_and(value >= 0)").as("all_nonneg"),
          expr("bool_or(event_type = 'purchase')").as("has_purchase"),
          max_by(col("event_id"), struct(col("ts"), col("event_id")))
            .as("last_event_id"))
        .ordered("user_id")
    }),

    // Z-order (Morton) layout values: bit-interleave two keys so a range
    // partition on z clusters BOTH dimensions (multi-dim scan pruning).
    // The oracle checks the interleave arithmetic; LayoutSpec checks the
    // actual per-partition envelope narrowing.
    "q_zorder" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        pmod(col("o_custkey"), lit(1024L)).as("cx"),
        pmod(col("o_orderkey"), lit(1024L)).as("cy"))
        .withColumn("z", Layout.zValue2(col("cx"), col("cy"), bits = 10))
        .ordered("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_cube_pricing" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        | coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        | CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY 1, 2""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        | count(*) AS n_rows
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_denorm_orders_lines" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
        | o.o_orderdate, o.o_orderpriority,
        | to_json(coalesce(array_agg({'l_linenumber': l.l_linenumber, 'l_partkey': l.l_partkey,
        |   'l_quantity': l.l_quantity, 'l_extendedprice': l.l_extendedprice}
        |   ORDER BY l.l_linenumber, l.l_partkey, l.l_quantity, l.l_extendedprice)
        |   FILTER (WHERE l.l_orderkey IS NOT NULL), [])) AS lines
        |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY ALL ORDER BY o.o_orderkey""".stripMargin,

    "q_proj_filter" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_case_nullif" ->
      """SELECT doc_id, nullif(lang, 'und') AS lang_checked,
        | CASE WHEN n_chars < 100 THEN 'short' WHEN n_chars < 300 THEN 'mid'
        |      ELSE 'long' END AS size_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_split_concat" ->
      """SELECT c_custkey,
        | CAST(split_part(c_name, '#', 2) AS BIGINT) AS name_num,
        | concat_ws('.', c_mktsegment, c_name) AS qualified
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_epoch_dates" ->
      """SELECT o_orderkey,
        | CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day,
        | epoch_ms(o_orderdate) AS epoch_ms,
        | CAST(DATE '1970-01-01' + CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS TIMESTAMP) AS roundtrip_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_coalesce_key" ->
      """SELECT c_custkey, coalesce(n_name, 'UNKNOWN') AS nation_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_json_get" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | event_type AS t, value * 2 AS v2
        |FROM events ORDER BY event_id""".stripMargin,

    "q_envelope_roundtrip" ->
      """SELECT event_id, user_id, event_type, value, 'c' AS op,
        | event_id AS lsn, event_id AS tx_id, event_id * 10 AS commit_lsn,
        | 'inventory.events' AS tbl
        |FROM events ORDER BY event_id""".stripMargin,

    "q_envelope_quarantine" ->
      """WITH j AS (SELECT event_id AS src_id,
        |  '{"after":{"event_id":' || event_id || ',"user_id":' || user_id ||
        |  '},"op":"c","ts_ms":' || epoch_ms(ts) || '}' AS payload
        | FROM events),
        |n AS (SELECT src_id,
        |  CASE WHEN src_id % 10 = 0 THEN substr(payload, 1, 20) ELSE payload END AS payload
        | FROM j)
        |SELECT src_id, src_id % 10 = 0 AS corrupt,
        | CASE WHEN src_id % 10 <> 0 THEN src_id END AS dec_event_id,
        | CASE WHEN src_id % 10 <> 0 THEN 'c' END AS op,
        | length(payload) AS raw_len
        |FROM n ORDER BY src_id""".stripMargin,

    "q_replication_lag" ->
      """WITH slots AS (SELECT event_type, max(event_id) AS confirmed_lsn,
        |  count(*) AS events_seen, max(ts) AS last_event_ts
        | FROM events GROUP BY 1),
        |head AS (SELECT max(event_id) AS head_lsn, max(ts) AS head_ts FROM events)
        |SELECT event_type AS slot, confirmed_lsn, head_lsn,
        | head_lsn - confirmed_lsn AS lsn_lag, events_seen,
        | epoch_ms(head_ts) - epoch_ms(last_event_ts) AS ms_behind,
        | CASE WHEN head_lsn - confirmed_lsn > 100 THEN 'lagging' ELSE 'ok' END AS status
        |FROM slots, head ORDER BY slot""".stripMargin,

    "q_asof_enrich" ->
      """WITH marked AS (
        | SELECT event_id, user_id, event_type,
        |  max(CASE WHEN event_type <> 'error' THEN event_id END)
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_event_id
        | FROM events),
        |errors AS (SELECT event_id, user_id, prior_event_id
        |           FROM marked WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, e.prior_event_id,
        | b.event_type AS prior_event_type, b.value AS prior_value
        |FROM errors e LEFT JOIN events b ON b.event_id = e.prior_event_id
        |ORDER BY e.event_id""".stripMargin,

    "q_changelog_materialize" ->
      """SELECT user_id, event_id, event_type, value FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_upsert_with_deletes" ->
      """SELECT user_id, event_id, event_type FROM (
        | SELECT user_id, event_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        | FROM events) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,

    "q_dedup_events" ->
      """SELECT DISTINCT event_id, user_id, event_type FROM events ORDER BY event_id""".stripMargin,

    "q_toast_backfill" ->
      """WITH src AS (
        | SELECT user_id AS id, event_id AS lsn,
        |  CASE WHEN event_type = 'click' THEN '__debezium_unavailable_value'
        |       ELSE props END AS biography
        | FROM events)
        |SELECT id, lsn,
        | CASE WHEN biography = '__debezium_unavailable_value' THEN
        |  last_value(nullif(biography, '__debezium_unavailable_value') IGNORE NULLS)
        |   OVER (PARTITION BY id ORDER BY lsn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        | ELSE biography END AS biography
        |FROM src ORDER BY id, lsn""".stripMargin,

    "q_toast_backfill_range" ->
      """WITH src AS (
        | SELECT user_id AS id, event_id, ts,
        |  CASE WHEN event_type = 'click' THEN '__debezium_unavailable_value'
        |       ELSE props END AS biography
        | FROM events)
        |SELECT id, event_id,
        | CASE WHEN biography = '__debezium_unavailable_value' THEN
        |  last_value(nullif(biography, '__debezium_unavailable_value') IGNORE NULLS)
        |   OVER (PARTITION BY id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
        | ELSE biography END AS biography
        |FROM src ORDER BY id, event_id""".stripMargin,

    "q_toast_ptf" ->
      """WITH src AS (
        | SELECT user_id AS id, event_id AS lsn,
        |  CASE WHEN event_type = 'error' THEN 'd'
        |       WHEN event_type = 'purchase' THEN 'c' ELSE 'u' END AS op,
        |  CASE WHEN event_type = 'click' THEN '__debezium_unavailable_value'
        |       ELSE props END AS biography
        | FROM events)
        |SELECT id, lsn, op,
        | CASE WHEN op = 'u' AND biography = '__debezium_unavailable_value' THEN
        |  (last_value(CASE WHEN op = 'd' THEN {'v': NULL::VARCHAR}
        |              WHEN op = 'c' THEN {'v': biography}
        |              WHEN op = 'u' AND biography IS DISTINCT FROM '__debezium_unavailable_value'
        |               THEN {'v': biography} END IGNORE NULLS)
        |    OVER (PARTITION BY id ORDER BY lsn
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).v
        | ELSE biography END AS biography
        |FROM src ORDER BY id, lsn""".stripMargin,

    "q_latest_asof" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
        | SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
        | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-01-01')
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "q_broadcast_enrich" ->
      """SELECT p_brand,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_count_per_group" ->
      """SELECT o_orderkey, coalesce(n_lines, 0) AS n_lines,
        | CASE WHEN coalesce(n_lines, 0) >= 4 THEN 'complete' ELSE 'partial' END AS status
        |FROM orders LEFT JOIN (
        | SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey) c
        |ON o_orderkey = c.l_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_set_ops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 1000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_nationkey = 3
        |ORDER BY c_custkey""".stripMargin,

    "q_set_ops_onepass" ->
      """SELECT c_custkey,
        | bool_or(c_mktsegment IN ('BUILDING', 'AUTOMOBILE')) AS in_ab,
        | bool_or(c_acctbal > 1000) AS in_rich,
        | bool_or(c_nationkey = 3) AS in_n3,
        | bool_or(c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))
        |   AND bool_or(c_acctbal > 1000)
        |   AND NOT bool_or(c_nationkey = 3) AS selected
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |   OR c_acctbal > 1000 OR c_nationkey = 3
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_scd2_history" ->
      """SELECT user_id AS key,
        | CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
        | event_id AS lsn, value,
        | event_id AS valid_from,
        | lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS valid_to,
        | lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL AS is_current
        |FROM events ORDER BY key, lsn""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_mktsegment,
        | EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        | count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_sliding_agg" ->
      """WITH e AS (
        | SELECT event_type, value,
        |  unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
        |    AS window_start
        | FROM events)
        |SELECT window_start, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_session_agg" ->
      """WITH o AS (
        | SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        | SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |   ROWS UNBOUNDED PRECEDING) AS sid
        | FROM o)
        |SELECT min(ts) AS session_start,
        | max(ts) + INTERVAL 10 MINUTE AS session_end,
        | user_id, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_changelog_encode" ->
      """SELECT event_id,
        | to_json({'id': event_id}) AS kafka_key,
        | to_json({
        |  'before': CASE WHEN event_type = 'error'
        |    THEN {'event_id': event_id, 'value': value} ELSE NULL END,
        |  'after': CASE WHEN event_type = 'error'
        |    THEN NULL ELSE {'event_id': event_id, 'value': value} END,
        |  'op': CASE WHEN event_type = 'error' THEN 'd' ELSE 'c' END,
        |  'ts_ms': epoch_ms(ts)}) AS kafka_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_upsert_encode" ->
      """SELECT user_id AS key, to_json({'id': user_id}) AS kafka_key,
        | CASE WHEN event_type = 'error' THEN NULL
        |      ELSE to_json({'event_id': event_id, 'event_type': event_type}) END AS kafka_value
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 ORDER BY key""".stripMargin,

    "q_string_decimal" ->
      """SELECT o_orderpriority,
        | sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DECIMAL(18,2))) AS total,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_generic_envelope" ->
      """SELECT event_id, event_type AS event_type_str,
        | CAST(value AS VARCHAR) AS value_str, 'c' AS op
        |FROM events ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS start_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id, epoch_ms(ts) AS t_ms
        |      FROM events WHERE event_type <> 'purchase')
        |SELECT p.user_id, p.purchase_id, c.event_id, c.t_ms - p.start_ms AS gap_ms
        |FROM p JOIN c ON p.user_id = c.user_id
        | AND c.t_ms >= p.start_ms AND c.t_ms <= p.start_ms + 21600000
        |ORDER BY purchase_id, event_id""".stripMargin,

    "q_table_stats" ->
      """SELECT count(*) AS n_rows,
        | min(o_totalprice) AS min_price,
        | max(o_totalprice) AS max_price,
        | count(DISTINCT o_custkey) AS ndv_custkey,
        | count(DISTINCT o_orderpriority) AS ndv_priority,
        | round(CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*), 6) AS null_frac_status
        |FROM orders""".stripMargin,

    "q_rank_funcs" ->
      """SELECT o_orderkey, o_orderpriority,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cdist,
        | CAST(dense_rank() OVER w AS INTEGER) AS drank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_bool_aggs" ->
      """WITH agg AS (
        | SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(event_type = 'purchase') AS has_purchase
        | FROM events GROUP BY user_id),
        |last AS (
        | SELECT user_id, event_id AS last_event_id FROM (
        |  SELECT user_id, event_id,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1)
        |SELECT user_id, n_errors, all_nonneg, has_purchase, last_event_id
        |FROM agg JOIN last USING (user_id) ORDER BY user_id""".stripMargin,

    "q_retract_agg" ->
      """WITH fin AS (
        | SELECT user_id,
        |  CASE WHEN event_id % 7 = 0
        |   THEN CAST(2 * CAST(value AS DECIMAL(18,2)) AS DECIMAL(18,2))
        |   ELSE CAST(value AS DECIMAL(18,2)) END AS v
        | FROM events WHERE event_type <> 'error')
        |SELECT user_id, count(*) AS n_live, CAST(sum(v) AS DOUBLE) AS sum_value,
        | CAST(sum(v) AS DOUBLE) / count(*) AS avg_value
        |FROM fin GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_zorder" ->
      """SELECT o_orderkey, o_custkey % 1024 AS cx, o_orderkey % 1024 AS cy,
        | CAST(list_sum(list_transform(range(0, 10), i ->
        |   ((((o_custkey % 1024) >> i) & 1) << (2*i))
        |   + ((((o_orderkey % 1024) >> i) & 1) << (2*i + 1)))) AS BIGINT) AS z
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
