package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.scale.Skew

/** The five ingest-conversion compositions round-trip correctly over a
  * synthetic envelope stream, and the skew utilities preserve join/agg
  * results.
  */
class ConversionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** c → u → d for key 1; c for key 2; a duplicate delivery of (1, u). */
  private def rawEnvelopes = Seq(
    """{"after":{"id":1,"v":"a1"},"op":"c","ts_ms":1,"source":{"lsn":1,"txId":1},"transaction":{"id":"1:10"}}""",
    """{"before":{"id":1,"v":"a1"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2,"source":{"lsn":2,"txId":1},"transaction":{"id":"1:10"}}""",
    """{"before":{"id":1,"v":"a1"},"after":{"id":1,"v":"a2"},"op":"u","ts_ms":2,"source":{"lsn":2,"txId":1},"transaction":{"id":"1:10"}}""",
    """{"before":{"id":1,"v":"a2"},"op":"d","ts_ms":3,"source":{"lsn":3,"txId":2},"transaction":{"id":"2:20"}}""",
    """{"after":{"id":2,"v":"b1"},"op":"c","ts_ms":4,"source":{"lsn":4,"txId":3},"transaction":{"id":"3:30"}}"""
  ).toDF("payload")

  test("changelog: decode + dedup drops the duplicate delivery") {
    val rows = Conversions.changelog(rawEnvelopes, "payload", rowSchema, "id")
    rows.count() shouldBe 4 // 5 events - 1 duplicate
    rows.filter(col("key") === 1).count() shouldBe 3
  }

  test("upsert: latest per key, deleted keys drop out") {
    val table = Conversions.upsert(rawEnvelopes, "payload", rowSchema, "id")
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toList
    table shouldBe List((2L, "b1")) // key 1 ended in a delete
  }

  test("changelogToUpsert: tombstone for deleted key, value for live key") {
    val out = Conversions.changelogToUpsert(rawEnvelopes, "payload", rowSchema, "id")
      .orderBy("kafka_key").collect()
    out.length shouldBe 2
    val byKey = out.map(r => (r.getString(0), Option(r.getString(1)))).toMap
    byKey("""{"id":1}""") shouldBe None // tombstone
    byKey("""{"id":2}""").get should include(""""v":"b1"""")
  }

  test("appendStream and upsertToChangelog re-encode every (deduped) event") {
    Conversions.appendStream(rawEnvelopes, "payload", rowSchema, "id")
      .count() shouldBe 5 // append keeps all
    val cl = Conversions.upsertToChangelog(rawEnvelopes, "payload", rowSchema, "id")
      .collect()
    cl.length shouldBe 4 // deduped
    all(cl.map(_.getString(1))) should (include(""""op":""""))
  }

  test("quarantine decode: malformed payloads flagged with raw bytes kept, extra fields tolerated") {
    import graft.cdc.Envelope
    val payloads = Seq(
      (1L, """{"after":{"id":1,"v":"a"},"op":"c","ts_ms":1}"""),
      (2L, """{"after":{"id":2,"v":"b"},"op":"c","ts_ms":2,"unknown_extra":true}"""),
      (3L, """{"after":{"id":3,"""), // truncated mid-structure
      (4L, "not json at all"),
      (5L, null)
    ).toDF("src", "payload")
    val out = Envelope.decodeQuarantine(payloads, "payload", rowSchema)
      .select(col("src"), col("corrupt"), col("after.id").as("id"), col("raw_payload"))
      .orderBy("src").collect()

    out.map(r => (r.getLong(0), r.getBoolean(1))) shouldBe
      Array((1L, false), (2L, false), (3L, true), (4L, true), (5L, false))
    // decoded fields present iff clean; raw bytes survive verbatim for triage
    out(0).getLong(2) shouldBe 1L
    out(1).getLong(2) shouldBe 2L // unknown fields ignored, not corrupt
    out(2).isNullAt(2) shouldBe true
    out(2).getString(3) shouldBe """{"after":{"id":3,"""
    out(3).getString(3) shouldBe "not json at all"
    out(4).isNullAt(3) shouldBe true // null payload: no record, not corrupt
  }

  test("salted join: identical duplicate rows spread across salts; row-preserving only for inner/left") {
    // CDC/at-least-once inputs: the hot key's rows are FULLY IDENTICAL. A
    // pure row-hash salt would send all of them to one salt; the positional
    // component must spread them.
    val dupRows = Seq.fill(800)((7L, "same")).toDF("k", "v")
    val small = Seq((7L, "dim")).toDF("k", "name")
    val joined = Skew.saltedJoin(dupRows, small, "k", salts = 8)
    joined.count() shouldBe 800 // row-preserving under duplicates

    // observable spread: identical rows land on >1 salt only because of
    // the per-partition occurrence counter (a pure content hash would
    // collapse them all onto one salt)
    val saltDist = graft.scale.Skew.withSalt(dupRows, 8)
      .select("_salt").distinct().count()
    saltDist should be > 1L

    // retry stability: the salt is a pure function of the partition's row
    // MULTISET (content hash + occurrence), so re-evaluating the same
    // input — Spark's recompute of a retried task — yields the identical
    // salted multiset, row order notwithstanding
    val a = graft.scale.Skew.withSalt(dupRows, 8)
      .groupBy("_salt").count().orderBy("_salt").collect().toSeq
    val b = graft.scale.Skew.withSalt(dupRows, 8)
      .groupBy("_salt").count().orderBy("_salt").collect().toSeq
    a shouldBe b

    // the row-preserving contract holds only for inner/left
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(dupRows, small, "k", salts = 8, joinType = "right")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedJoin(dupRows, small, "k", salts = 8, joinType = "full_outer")
    Skew.saltedJoin(dupRows, small, "k", salts = 8, joinType = "left_outer")
      .count() shouldBe 800
  }

  test("salted join and salted sum match their unsalted equivalents") {
    val large = (1L to 1000L).map(i => (if (i % 10 == 0) 1L else i, i.toDouble))
      .toDF("k", "v") // key 1 is hot (~10% of rows)
    val small = Seq((1L, "hot"), (2L, "x"), (500L, "y")).toDF("k", "name")

    val plain = large.join(small, Seq("k")).agg(sum("v")).first().getDouble(0)
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
      .agg(sum("v")).first().getDouble(0)
    salted shouldBe plain

    val plainSum = large.groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val saltedSum = Skew.saltedSum(large, "k", col("v"), salts = 8, "s")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    saltedSum shouldBe plainSum
  }
}
