package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader
import org.apache.spark.sql.types.StructType

import graft.cdc.Envelope

/** S1/S10/S11 + P10 — envelope stream ingestion.
  *
  * The reference reads Debezium JSON from Kafka
  * (`KafkaAppendStreamJob.java:17-59`). This environment has no Kafka
  * connector jars or broker (zero egress; `spark-sql-kafka-0-10` is not in
  * the offline cache — re-verified 2026-08-15 in rounds 10 AND 11: no
  * kafka artifact among the cache's 118 jars or /opt/spark/jars' 287, no
  * coursier CLI to fetch one), so the runnable source
  * here is a
  * JSON-lines file stream with the IDENTICAL decode path a Kafka `value`
  * column would take. [[kafka]] builds the real `format("kafka")` reader —
  * resolved lazily at `load()`, so it is usable as-is on any cluster with
  * the connector on the classpath and exercised by the env-gated
  * integration spec (KafkaIntegrationSpec, enabled via
  * `GRAFT_KAFKA_BOOTSTRAP`).
  */
object EnvelopeSource {

  /** S11: startup-mode and connection options for a Kafka deployment —
    * `spark.readStream.format("kafka").options(kafkaOptions(...))`, then
    * `Envelope.decode(df.selectExpr("CAST(value AS STRING) AS payload"),
    * "payload", rowSchema)`.
    */
  def kafkaOptions(bootstrapServers: String, topic: String,
                   startingOffsets: String = "earliest"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets,
    "failOnDataLoss" -> "false")

  /** S11: the configured `format("kafka")` streaming reader. Source
    * resolution happens at `load()` (not here), so building the reader is
    * safe without the connector jar; `.load()` requires
    * `spark-sql-kafka-0-10` on the classpath.
    */
  def kafka(spark: SparkSession, bootstrapServers: String, topic: String,
            startingOffsets: String = "earliest"): DataStreamReader =
    spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrapServers, topic, startingOffsets))

  /** S1 over Kafka: `.load()` + the same typed decode as [[fileStream]],
    * with S10 metadata (topic/partition/offset) and P10 proctime exposed.
    * Runnable only with the Kafka connector on the classpath.
    */
  def kafkaStream(spark: SparkSession, bootstrapServers: String, topic: String,
                  rowSchema: StructType,
                  startingOffsets: String = "earliest"): DataFrame = {
    val raw = kafka(spark, bootstrapServers, topic, startingOffsets).load()
      .select(
        col("value").cast("string").as("payload"),
        concat_ws("/", col("topic"), col("partition"), col("offset"))
          .as("src_file"),                               // S10 ↔ topic/partition/offset
        current_timestamp().as("proctime"))              // P10 ↔ PROCTIME()
    raw
      .withColumn("_env", from_json(col("payload"), Envelope.schema(rowSchema)))
      .select(col("_env.*"), col("src_file"), col("proctime"))
  }

  /** S1: streaming envelope source over a directory of JSON-lines files.
    * Each line is one Debezium envelope; the payload goes through the same
    * typed decode as a Kafka value. S10 metadata columns are exposed from
    * the file source (`_metadata`), P10 as a processing-time column.
    */
  def fileStream(spark: SparkSession, dir: String, rowSchema: StructType): DataFrame = {
    val raw = spark.readStream
      .format("text")
      .load(dir)
      .select(
        col("value").as("payload"),
        col("_metadata.file_path").as("src_file"),       // S10 ↔ topic/partition
        current_timestamp().as("proctime"))              // P10 ↔ PROCTIME()
    raw
      .withColumn("_env", from_json(col("payload"), Envelope.schema(rowSchema)))
      .select(col("_env.*"), col("src_file"), col("proctime"))
  }

  /** [[fileStream]] with the dead-letter channel: same source and metadata
    * columns, decoded through [[Envelope.decodeQuarantine]] — malformed
    * lines arrive flagged `corrupt` with `raw_payload` intact (routed by
    * the caller to a quarantine sink) instead of as silent all-null rows.
    */
  def fileStreamQuarantine(spark: SparkSession, dir: String,
                           rowSchema: StructType): DataFrame = {
    val raw = spark.readStream
      .format("text")
      .load(dir)
      .select(
        col("value").as("payload"),
        col("_metadata.file_path").as("src_file"),
        current_timestamp().as("proctime"))
    Envelope.decodeQuarantine(raw, "payload", rowSchema)
  }
}
