package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Debezium change-event envelope as a first-class Spark data model.
  *
  * Shape per the reference's PoC doc
  * (`transactional-cdc-processing/transactional-cdc-processing-poc.md:200-225`) and
  * the Flink DDL
  * (`debezium-kafka-flink-sql-ingest/.../KafkaAppendStreamJob.java:18-48`):
  *
  * {{{
  * { before: ROW|null, after: ROW|null,
  *   source: ROW(version, connector, name, ts_ms, snapshot, db, sequence,
  *               schema, table, txId, lsn, xmin),
  *   op: 'c'|'u'|'d'|'r', ts_ms: BIGINT,
  *   transaction: { id: "<txId>:<commitLsn>" } | null }
  * }}}
  *
  * Everything here is pure `Column`/`DataFrame` functions — declarative, so
  * Catalyst prunes unused envelope branches and pushes filters into the source.
  */
object Envelope {

  /** `source` block schema (poc.md:206-218). `txId`/`lsn` widened to LONG —
    * Postgres LSNs exceed 32 bits in any real deployment.
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", LongType)
  ))

  /** Full envelope schema for a table whose row image is `rowSchema` (typed mode). */
  def schema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("transaction", StructType(Seq(StructField("id", StringType))))
  ))

  /** Generic (schema-less) row image — mirrors the reference's
    * `Map<String,Object>` mode (`DataChangeEvent.java:16-18`).
    */
  val genericSchema: StructType = schema(StructType(Nil)) match {
    case s =>
      val m = MapType(StringType, StringType)
      StructType(s.fields.map {
        case StructField("before", _, n, md) => StructField("before", m, n, md)
        case StructField("after", _, n, md)  => StructField("after", m, n, md)
        case f => f
      })
  }

  /** Transaction-metadata event (BEGIN/END), per
    * `model/generic/TransactionEvent.java:26-50` and FIXTURES.md §2.
    */
  val txEventSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("id", StringType),
    StructField("event_count", LongType),
    StructField("data_collections", ArrayType(StructType(Seq(
      StructField("data_collection", StringType),
      StructField("event_count", LongType)
    )))),
    StructField("ts_ms", LongType)
  ))

  /** Decode the Debezium TRANSACTION-METADATA topic
    * (`transaction-metadata` events, `TransactionEvent.java:26-50`) into the
    * tx END dimension the replay engine consumes
    * ([[graft.tx.TxReplay]] `txEnds` contract: tx_id, commit_lsn,
    * expected_left, expected_right): keep END events, parse
    * `"<txId>:<commitLsn>"`, and pull each side's announced event count from
    * `data_collections` (`TransactionEvent.countFor`,
    * `TransactionEvent.java:41-49` — tables absent from the list count 0,
    * the idle-table case of poc.md:232-262). Narrow projection; the
    * dimension is one row per transaction.
    */
  def decodeTxEnds(df: DataFrame, jsonCol: String,
                   leftTable: String, rightTable: String): DataFrame = {
    def countFor(table: String): Column = coalesce(
      element_at(filter(col("_tx.data_collections"),
        c => c.getField("data_collection") === table), 1)
        .getField("event_count"),
      lit(0L))
    df.withColumn("_tx", from_json(col(jsonCol), txEventSchema))
      .filter(col("_tx.status") === "END")
      .select(
        txId(col("_tx.id")).as("tx_id"),
        commitLsn(col("_tx.id")).as("commit_lsn"),
        countFor(leftTable).as("expected_left"),
        countFor(rightTable).as("expected_right"))
  }

  // ---- scalar helpers over envelope columns (SURVEY §2.2) ----

  /** P7: `transaction.id = "<txId>:<commitLsn>"` → txId
    * (`DataChangeEvent.java:24-26`).
    */
  def txId(transactionId: Column): Column =
    split(transactionId, ":").getItem(0).cast(LongType)

  /** P7: commit LSN from `transaction.id` (`DataChangeEvent.java:28-30`). */
  def commitLsn(transactionId: Column): Column =
    split(transactionId, ":").getItem(1).cast(LongType)

  /** P6: op-dependent key — deletes carry only `before`
    * (`DataChangeEvent.java:53-55`, `DataStreamV2Job.java:131`).
    */
  def keyOf(after: Column, before: Column, field: String): Column =
    coalesce(after.getField(field), before.getField(field))

  /** P8: qualified table name (`DataChangeEvent.java:57-59`). */
  def qualifiedTable(source: Column): Column =
    concat_ws(".", source.getField("schema"), source.getField("table"))

  /** P9: Debezium DATE columns arrive as epoch-day ints
    * (`OrderWithLines.java:57`).
    */
  def epochDayToDate(days: Column): Column =
    date_add(to_date(lit("1970-01-01")), days.cast(IntegerType))

  /** P9: Debezium TIMESTAMP columns arrive as epoch-micros
    * (`postgres-toast-backfill/README.md:84`).
    */
  def epochMicrosToTimestamp(micros: Column): Column = timestamp_micros(micros)

  /** P9: envelope `ts_ms` / `TO_TIMESTAMP_LTZ(ts_ms, 3)` (`SqlOverAggJob.java:56`). */
  def epochMillisToTimestamp(millis: Column): Column = timestamp_millis(millis)

  /** Decimals arrive as strings under `decimal.handling.mode=string`
    * (`postgres-connector.json:20`).
    */
  def stringDecimal(c: Column, precision: Int = 10, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** The TOAST placeholder Debezium emits for unchanged unfetched columns
    * (`postgres-toast-backfill/README.md:72-107`).
    */
  val ToastSentinel = "__debezium_unavailable_value"

  // ---- decode / encode ----

  /** S1: decode a raw JSON envelope column (e.g. Kafka `value` cast to string)
    * into the typed envelope struct, exploded to top-level columns.
    */
  def decode(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame =
    df.withColumn("_env", from_json(col(jsonCol), schema(rowSchema)))
      .select(col("_env.*"))

  /** S1 robustness: decode with a dead-letter channel. Malformed payloads
    * (bytes that are not valid JSON — a truncated Kafka record, a
    * non-envelope producer on the topic) must not vanish as silent nulls
    * mid-pipeline: each row keeps the raw payload and gets a `corrupt`
    * flag, so the caller routes `filter(col("corrupt"))` to a quarantine
    * sink and the rest onward. The reference gets this for free by
    * crashing (Jackson throws, the task restarts); a 100 TB pipeline
    * cannot stop the world for one bad record.
    */
  def decodeQuarantine(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    // non-payload columns (Kafka key/partition/offset, ids) ride along
    val passthrough = df.columns.filterNot(_ == jsonCol).map(col).toIndexedSeq
    // PERMISSIVE from_json maps a malformed payload to a row of nulls — it
    // does NOT null the struct — so json-validity needs the declared
    // corrupt-record column: malformed input lands there verbatim, schema
    // mismatches (valid JSON, unexpected fields) do not.
    val corruptField = "_corrupt_record"
    val withCorrupt = StructType(schema(rowSchema).fields :+
      StructField(corruptField, StringType))
    df.withColumn("_env", from_json(col(jsonCol), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptField)))
      .withColumn("corrupt", col("_env").getField(corruptField).isNotNull)
      .withColumn("_env", col("_env").dropFields(corruptField))
      .select(passthrough ++
        Seq(col("_env.*"), col("corrupt"), col(jsonCol).as("raw_payload")): _*)
  }

  /** Normalized change-row view used by the materializer / replay engine:
    * key, op, row image (after for c/u/r, before for d), lsn, commit lsn, txId.
    */
  def normalize(env: DataFrame, keyField: String): DataFrame =
    env.select(
      keyOf(col("after"), col("before"), keyField).as("key"),
      col("op"),
      col("before"),
      col("after"),
      col("source.lsn").as("lsn"),
      txId(col("transaction.id")).as("tx_id"),
      commitLsn(col("transaction.id")).as("commit_lsn"),
      col("ts_ms")
    )

  /** JSON options for encoders: Debezium envelopes carry explicit nulls
    * (`"before": null` on inserts), so null fields must render.
    */
  private val jsonOpts = Map("ignoreNullFields" -> "false")

  /** S5: encode change rows back into a Debezium-style envelope JSON value. */
  def encodeChangelogJson(keyCol: Column, before: Column, after: Column,
                          op: Column, tsMs: Column): (Column, Column) = {
    val value = to_json(struct(
      before.as("before"), after.as("after"), op.as("op"), tsMs.as("ts_ms")), jsonOpts)
    (to_json(struct(keyCol.as("id"))), value)
  }

  /** S6/S8: upsert-kafka / tombstone encoding — latest row per key as JSON,
    * deletes become null values (Kafka tombstones)
    * (`OrderWithLinesSerializationSchema.java:41-75`).
    */
  def encodeUpsertKV(keyCol: Column, payload: Column, deleted: Column): (Column, Column) =
    (to_json(struct(keyCol.as("id"))),
     when(deleted, lit(null).cast(StringType)).otherwise(to_json(payload, jsonOpts)))

  /** S7: generic (schema-less) decode — row images land as
    * MAP<STRING,STRING>, mirroring the reference's `Map<String,Object>` mode
    * (`DataChangeEvent.java:16-18`).
    */
  def decodeGeneric(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("_env", from_json(col(jsonCol), genericSchema))
      .select(col("_env.*"))
}
