package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Schema evolution at the decode seam. A live CDC pipeline sees the source
  * table gain columns mid-stream (Debezium re-emits the new shape; old
  * events in the topic keep the old one). The declared-schema decode must
  * read BOTH generations in one pass: missing fields → NULL, unknown extra
  * fields → ignored — the same permissive-reader contract as the reference's
  * Jackson `@JsonIgnoreProperties(ignoreUnknown=true)` model classes
  * (`DataChangeEvent.java:14`).
  */
class SchemaEvolutionSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("one declared schema reads old, new, and future event generations") {
    import spark.implicits._
    val oldGen = // written before the 'email' column existed
      """{"before":null,"after":{"id":1,"name":"ada"},"source":{"table":"t","lsn":10,"txId":1},"op":"c","ts_ms":1010,"transaction":null}"""
    val newGen = // current shape
      """{"before":null,"after":{"id":2,"name":"bob","email":"b@x"},"source":{"table":"t","lsn":11,"txId":1},"op":"c","ts_ms":1011,"transaction":null}"""
    val futureGen = // a LATER producer with a column we don't know yet
      """{"before":null,"after":{"id":3,"name":"cyd","email":"c@x","age":44},"source":{"table":"t","lsn":12,"txId":1},"op":"c","ts_ms":1012,"transaction":null}"""

    // the CURRENT declared row schema (has email; knows nothing of age)
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("email", StringType)))

    val decoded = Envelope.decode(
      Seq(oldGen, newGen, futureGen).toDF("payload"), "payload", rowSchema)
      .select(col("after.id"), col("after.name"), col("after.email"), col("op"))
      .orderBy("id")
      .as[(Long, String, Option[String], String)].collect()

    decoded shouldBe Array(
      (1L, "ada", None, "c"),          // missing field -> NULL
      (2L, "bob", Some("b@x"), "c"),
      (3L, "cyd", Some("c@x"), "c"))   // unknown field ignored, row intact
  }

  test("quarantine keeps evolution-tolerance without swallowing real corruption") {
    import spark.implicits._
    val good = """{"before":null,"after":{"id":1,"name":"ada","email":null},"source":{"table":"t","lsn":10,"txId":1},"op":"c","ts_ms":1010,"transaction":null}"""
    val corrupt = """{"before":null,"after":{"id":NOT_JSON"""

    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("email", StringType)))

    val out = Envelope.decodeQuarantine(
      Seq(good, corrupt).toDF("payload"), "payload", rowSchema)
    out.filter(!col("corrupt")).count() shouldBe 1
    // the quarantined row keeps its raw payload for the dead-letter sink
    out.filter(col("corrupt")).select("raw_payload")
      .as[String].collect() shouldBe Array(corrupt)
  }
}
