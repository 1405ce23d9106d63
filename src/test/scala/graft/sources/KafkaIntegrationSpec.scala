package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc.Envelope

/** Kafka transport integration — the reference's actual ingress/egress
  * (`KafkaAppendStreamJob.java:17-59`). This sandbox has no broker and no
  * `spark-sql-kafka-0-10` jar (zero egress, not in the offline cache), so
  * the round-trip test is GATED on `GRAFT_KAFKA_BOOTSTRAP`: point it at a
  * broker on a cluster with the connector jar and the full
  * encode → topic → [[EnvelopeSource.kafkaStream]] decode path runs.
  * What always runs here: the reader BUILDER — source resolution happens
  * at `load()`, so the configured reader must construct without the jar.
  */
class KafkaIntegrationSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("configured kafka reader builds without the connector jar (resolution is lazy)") {
    val reader = EnvelopeSource.kafka(spark, "broker:9092", "dbserver1.inventory.authors")
    reader should not be null
    // and the options builder carries the startup-mode control (S11)
    EnvelopeSource.kafkaOptions("b:9092", "t", "latest")("startingOffsets") shouldBe "latest"
  }

  test("round-trip: envelope JSON → kafka topic → kafkaStream typed decode") {
    assume(bootstrap.isDefined,
      "set GRAFT_KAFKA_BOOTSTRAP=<host:port> (cluster with spark-sql-kafka-0-10) to run")
    val servers = bootstrap.get
    val topic = s"graft-it-${System.currentTimeMillis()}"
    import spark.implicits._

    // produce: 3 envelopes through the batch kafka sink
    val payloads = Seq(1L, 2L, 3L).toDF("id").select(to_json(struct(
      lit(null).cast(rowSchema).as("before"),
      struct(col("id"), concat(lit("n-"), col("id")).as("name")).as("after"),
      lit("c").as("op"), lit(0L).as("ts_ms"))).as("value"))
    payloads.selectExpr("CAST(value AS STRING) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()

    // consume: the streaming reader, drained with AvailableNow into memory
    val decoded = EnvelopeSource.kafkaStream(spark, servers, topic, rowSchema)
    val q = decoded.writeStream
      .format("memory").queryName("kafka_it")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT after.id AS id, after.name AS name FROM kafka_it")
      .orderBy("id").as[(Long, String)].collect().toSeq
    got shouldBe Seq((1L, "n-1"), (2L, "n-2"), (3L, "n-3"))
  }
}
