package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.Envelope

/** The reference's five Debezium-encoding conversion jobs
  * (`debezium-kafka-flink-sql-ingest/debezium-ingest-job/src/main/java/dev/morling/demos/cdcingest/Kafka*Job.java`)
  * as library compositions over the envelope codec + materializer. Each job
  * is a one-liner here because the pieces — decode (S1), dedup (O7),
  * keep-latest materialization (O8/A3), changelog/upsert encoders (S5/S6/S8)
  * — are the oracle-verified operators; the jobs are just wirings.
  *
  * Input contract: `raw` has a JSON envelope string column; keyField names
  * the primary key inside the row image.
  */
object Conversions {

  /** `KafkaAppendStreamJob` (S1→S4): full-envelope passthrough — decode,
    * project, re-encode key/value. Insert-only; every event kept.
    */
  def appendStream(raw: DataFrame, jsonCol: String, rowSchema: StructType,
                   keyField: String): DataFrame = {
    val env = Envelope.decode(raw, jsonCol, rowSchema)
    val n = Envelope.normalize(env, keyField)
    val (k, v) = Envelope.encodeChangelogJson(
      col("key"), col("before"), col("after"), col("op"), col("ts_ms"))
    n.select(k.as("kafka_key"), v.as("kafka_value"))
  }

  /** `KafkaChangelogJob` (S2): changelog interpretation — decode + at-least-
    * once dedup; downstream operators see retraction-style change rows.
    */
  def changelog(raw: DataFrame, jsonCol: String, rowSchema: StructType,
                keyField: String): DataFrame =
    Materialize.dedupByLsn(
      Envelope.normalize(Envelope.decode(raw, jsonCol, rowSchema), keyField))

  /** `KafkaUpsertJob` (S3): upsert view — latest row per key, deletes drop. */
  def upsert(raw: DataFrame, jsonCol: String, rowSchema: StructType,
             keyField: String): DataFrame =
    Materialize.changelogToTable(changelog(raw, jsonCol, rowSchema, keyField), col("lsn"))

  /** `KafkaChangelogToUpsertJob` (S2→S6): changelog in, upsert-kafka out —
    * latest change per key encoded as key/value with null tombstones.
    */
  def changelogToUpsert(raw: DataFrame, jsonCol: String, rowSchema: StructType,
                        keyField: String): DataFrame = {
    val latest = Materialize.latestByKey(
      changelog(raw, jsonCol, rowSchema, keyField), Seq("key"), col("lsn"))
    val (k, v) = Envelope.encodeUpsertKV(col("key"), col("after"), col("op") === "d")
    latest.select(k.as("kafka_key"), v.as("kafka_value"))
  }

  /** `KafkaUpsertToChangelogJob` (S3→S5): upsert in, changelog out — each
    * upsert row becomes a change event (null value → delete op).
    */
  def upsertToChangelog(raw: DataFrame, jsonCol: String, rowSchema: StructType,
                        keyField: String): DataFrame = {
    val n = Materialize.dedupByLsn(
      Envelope.normalize(Envelope.decode(raw, jsonCol, rowSchema), keyField))
    val (k, v) = Envelope.encodeChangelogJson(
      col("key"),
      when(col("op") === "d", col("before")),
      when(col("op") =!= "d", col("after")),
      col("op"), col("ts_ms"))
    n.select(k.as("kafka_key"), v.as("kafka_value"))
  }
}
