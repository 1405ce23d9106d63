package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.cdc.Envelope
import graft.ops.{Conversions, Toast}

/** SQL-TEXT parity for the reference's seven SQL jobs: each job's query body
  * (the five ingest conversions in
  * `debezium-kafka-flink-sql-ingest/.../Kafka*Job.java` and the two TOAST
  * SQL jobs in `postgres-toast-backfill/.../Sql{OverAgg,Ptf}Job.java`) is
  * expressed as `spark.sql` text over temp views of an authors-table
  * envelope fixture and asserted row-equal to the library-operator result
  * (`Conversions` / `Toast`). Flink's `value.format = 'debezium-json'` /
  * `'upsert-kafka'` source semantics have no Spark reader equivalent, so
  * the SQL text spells them out (DISTINCT for the at-least-once dedup the
  * jobs enable via `table.exec.source.cdc-events-duplicate=true`;
  * `row_number()` latest-per-key for the upsert view) — that spelled-out
  * form IS the Spark SQL surface of those jobs.
  */
class SqlIngestParitySpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val Sentinel = Envelope.ToastSentinel

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("first_name", StringType),
    StructField("last_name", StringType), StructField("biography", StringType),
    StructField("registered", LongType)))

  /** Authors change history (KafkaAppendStreamJob.java:18-48 schema):
    * creates, updates (incl. TOAST sentinels), deletes, a re-insert after
    * delete, an exact at-least-once duplicate, a post-delete sentinel
    * (exercises the PTF's state reset), and a >30-day-old value (exercises
    * the OVER-agg job's RANGE frame aging the latch out).
    * (op, lsn, id, biography, tsOffsetDays)
    */
  private val history: Seq[(String, Long, Long, Option[String], Int)] = Seq(
    ("c", 1L, 1L, Some("bio-1"), 0),
    ("c", 2L, 2L, Some("bio-2"), 0),
    ("u", 3L, 1L, Some(Sentinel), 0),
    ("d", 4L, 2L, None, 0),
    ("c", 5L, 3L, None, 0),          // genuine NULL biography
    ("u", 6L, 1L, Some("bio-1c"), 0),
    ("c", 7L, 2L, Some("bio-2n"), 0),
    ("c", 5L, 3L, None, 0),          // exact duplicate delivery of lsn 5
    ("c", 8L, 4L, Some("bio-4"), 0),
    ("d", 9L, 4L, None, 0),
    ("u", 10L, 4L, Some(Sentinel), 0), // sentinel AFTER delete: PTF → NULL
    ("c", 11L, 5L, Some("bio-old"), -40), // outside the 30-day RANGE frame
    ("u", 12L, 5L, Some(Sentinel), 0))   // OVER-agg latch finds nothing

  private lazy val raw: DataFrame = {
    import spark.implicits._
    val base = 1700000000000L // fixed epoch anchor; offsets stay relative
    val df = history.toDF("op", "lsn", "id", "bio", "ts_off_days")
    def img(bio: Column) = struct(col("id"),
      concat(lit("fn-"), col("id")).as("first_name"),
      concat(lit("ln-"), col("id")).as("last_name"),
      bio.as("biography"),
      (col("id") * 100).as("registered"))
    val after = when(col("op") =!= "d", img(col("bio")))
    val before = when(col("op").isin("u", "d"), img(lit("prev-bio")))
    df.select(to_json(struct(
      before.as("before"), after.as("after"),
      struct(
        lit("3.4.0.Final").as("version"), lit("postgresql").as("connector"),
        lit("dbserver1").as("name"), (lit(base) + col("lsn")).as("ts_ms"),
        lit("false").as("snapshot"), lit("postgres").as("db"),
        lit(null).cast(StringType).as("sequence"),
        lit("inventory").as("schema"), lit("authors").as("table"),
        col("lsn").as("txId"), col("lsn").as("lsn"),
        lit(null).cast(LongType).as("xmin")).as("source"),
      col("op").as("op"),
      (lit(base) + col("lsn") * 60000L
        + col("ts_off_days").cast(LongType) * 86400000L).as("ts_ms"),
      struct(concat_ws(":", col("lsn"), col("lsn") * 10).as("id")).as("transaction")),
      Map("ignoreNullFields" -> "false")).as("payload"))
  }

  private def envelopeView(name: String): Unit =
    Envelope.decode(raw, "payload", rowSchema)
      .withColumn("id", Envelope.keyOf(col("after"), col("before"), "id"))
      .createOrReplaceTempView(name)

  private def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val cols = a.columns.sorted.toIndexedSeq
    a.columns.sorted shouldBe b.columns.sorted
    a.select(cols.map(col): _*).exceptAll(b.select(cols.map(col): _*))
      .isEmpty shouldBe true
    b.select(cols.map(col): _*).exceptAll(a.select(cols.map(col): _*))
      .isEmpty shouldBe true
    a.count() should be > 0L
  }

  test("KafkaAppendStreamJob: full-envelope passthrough SQL == Conversions.appendStream") {
    envelopeView("authors_source")
    // the job's body verbatim (KafkaAppendStreamJob.java:104)
    val body = spark.sql(
      "SELECT id, before, after, source, op, ts_ms FROM authors_source")
    val (k, v) = Envelope.encodeChangelogJson(
      col("id"), col("before"), col("after"), col("op"), col("ts_ms"))
    assertSameRows(
      body.select(k.as("kafka_key"), v.as("kafka_value")),
      Conversions.appendStream(raw, "payload", rowSchema, "id"))
  }

  test("KafkaChangelogJob: debezium-json change rows SQL == Conversions.changelog") {
    envelopeView("authors_envelope")
    // the debezium-json source interpretation spelled out: op-dependent row
    // image (the -D row presents `before`), DISTINCT = the job's
    // cdc-events-duplicate dedup; then the job's 5-column body
    // (KafkaChangelogJob.java:66)
    val viaSql = spark.sql(
      """SELECT DISTINCT id, op, source.lsn AS lsn,
        |  CASE WHEN op = 'd' THEN before.first_name ELSE after.first_name END AS first_name,
        |  CASE WHEN op = 'd' THEN before.last_name  ELSE after.last_name  END AS last_name,
        |  CASE WHEN op = 'd' THEN before.biography  ELSE after.biography  END AS biography,
        |  CASE WHEN op = 'd' THEN before.registered ELSE after.registered END AS registered
        |FROM authors_envelope""".stripMargin)
    def side(f: String) =
      when(col("op") === "d", col(s"before.$f")).otherwise(col(s"after.$f")).as(f)
    val viaLib = Conversions.changelog(raw, "payload", rowSchema, "id")
      .select(col("key").as("id"), col("op"), col("lsn"),
        side("first_name"), side("last_name"), side("biography"), side("registered"))
    assertSameRows(viaSql, viaLib)
  }

  test("KafkaUpsertJob: latest-per-key upsert view SQL == Conversions.upsert") {
    envelopeView("authors_envelope")
    // upsert-kafka source semantics: latest value per key wins, a delete
    // (Flink: null-value tombstone) removes the key; then the job's body
    // (KafkaUpsertJob.java:61)
    val viaSql = spark.sql(
      """WITH changes AS (SELECT DISTINCT id, before, after, op, source FROM authors_envelope),
        |ranked AS (
        |  SELECT id, op, after,
        |         row_number() OVER (PARTITION BY id ORDER BY source.lsn DESC) AS rn
        |  FROM changes)
        |SELECT id, after.first_name, after.last_name, after.biography, after.registered
        |FROM ranked WHERE rn = 1 AND op <> 'd'""".stripMargin)
    val viaLib = Conversions.upsert(raw, "payload", rowSchema, "id")
      .select(col("key").as("id"), col("first_name"), col("last_name"),
        col("biography"), col("registered"))
    assertSameRows(viaSql, viaLib)
  }

  test("KafkaChangelogToUpsertJob: changelog→upsert encode SQL == Conversions.changelogToUpsert") {
    envelopeView("authors_envelope")
    // latest change per key, encoded as upsert-kafka K/V — a latest-op
    // delete becomes the null-value tombstone (KafkaChangelogToUpsertJob.java:60)
    val viaSql = spark.sql(
      """WITH changes AS (SELECT DISTINCT id, before, after, op, source FROM authors_envelope),
        |ranked AS (
        |  SELECT id, op, after,
        |         row_number() OVER (PARTITION BY id ORDER BY source.lsn DESC) AS rn
        |  FROM changes)
        |SELECT to_json(named_struct('id', id)) AS kafka_key,
        |       CASE WHEN op = 'd' THEN CAST(NULL AS STRING)
        |            ELSE to_json(after, map('ignoreNullFields', 'false')) END AS kafka_value
        |FROM ranked WHERE rn = 1""".stripMargin)
    assertSameRows(viaSql,
      Conversions.changelogToUpsert(raw, "payload", rowSchema, "id"))
  }

  test("KafkaUpsertToChangelogJob: upsert→changelog encode SQL == Conversions.upsertToChangelog") {
    envelopeView("authors_envelope")
    // every deduped change re-encoded as a debezium-style envelope: deletes
    // carry only `before`, everything else only `after`
    // (KafkaUpsertToChangelogJob.java:55)
    val viaSql = spark.sql(
      """WITH changes AS (
        |  SELECT DISTINCT id, before, after, op, ts_ms FROM authors_envelope)
        |SELECT to_json(named_struct('id', id)) AS kafka_key,
        |       to_json(named_struct(
        |         'before', CASE WHEN op = 'd'  THEN before END,
        |         'after',  CASE WHEN op <> 'd' THEN after  END,
        |         'op', op, 'ts_ms', ts_ms),
        |         map('ignoreNullFields', 'false')) AS kafka_value
        |FROM changes""".stripMargin)
    assertSameRows(viaSql,
      Conversions.upsertToChangelog(raw, "payload", rowSchema, "id"))
  }

  test("SqlOverAggJob: LAST_VALUE 30-day RANGE latch SQL == Toast.backfillRange") {
    envelopeView("authors_source")
    // the job's window body verbatim modulo Spark spelling
    // (SqlOverAggJob.java:109-135): proctime → the envelope ts, Flink
    // LAST_VALUE → last_value(..., true)
    val viaSql = spark.sql(
      s"""SELECT id, source.lsn AS lsn,
         |  CASE WHEN after IS NULL THEN CAST(NULL AS STRING)
         |       WHEN after.biography IS NULL THEN CAST(NULL AS STRING)
         |       ELSE last_value(nullif(after.biography, '$Sentinel'), true) OVER (
         |         PARTITION BY id
         |         ORDER BY timestamp_millis(ts_ms)
         |         RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
         |  END AS biography
         |FROM authors_source""".stripMargin)
    val flat = Envelope.decode(raw, "payload", rowSchema).select(
      Envelope.keyOf(col("after"), col("before"), "id").as("id"),
      col("source.lsn").as("lsn"),
      timestamp_millis(col("ts_ms")).as("ts"),
      col("after.biography").as("biography"))
    val viaLib = Toast.backfillRange(flat, "id", "ts", "biography", rangeDays = 30)
      .select("id", "lsn", "biography")
    assertSameRows(viaSql, viaLib)
    // the aged-out case actually bit: id 5's sentinel found no value in range
    viaSql.filter(col("id") === 5 && col("lsn") === 12)
      .select("biography").collect().head.isNullAt(0) shouldBe true
  }

  test("SqlPtfJob: ToastBackfill PTF state machine SQL == Toast.backfillPtf") {
    envelopeView("authors_source")
    // Spark has no `FROM Fn(TABLE t PARTITION BY id)` PTF syntax; this
    // window spelling is the exact state machine of
    // SqlPtfJob.ToastBackfillFunction.eval (SqlPtfJob.java:131-165):
    // c/r set state as-is, non-sentinel u sets state, d RESETS state to
    // null, and only a sentinel-valued u substitutes. The struct wrap
    // distinguishes "state is NULL" (a delete happened) from "no state
    // change" (ignoreNulls skips the row).
    val viaSql = spark.sql(
      s"""SELECT id, source.lsn AS lsn,
         |  CASE WHEN op = 'u' AND after.biography = '$Sentinel' THEN
         |    last_value(
         |      CASE WHEN op = 'd' THEN named_struct('v', CAST(NULL AS STRING))
         |           WHEN op IN ('c','r') THEN named_struct('v', after.biography)
         |           WHEN op = 'u' AND NOT (after.biography <=> '$Sentinel')
         |             THEN named_struct('v', after.biography) END, true) OVER (
         |      PARTITION BY id ORDER BY source.lsn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW).v
         |  ELSE after.biography END AS biography
         |FROM authors_source""".stripMargin)
    val flat = Envelope.decode(raw, "payload", rowSchema).dropDuplicates()
      .select(
        Envelope.keyOf(col("after"), col("before"), "id").as("id"),
        col("source.lsn").as("lsn"), col("op"),
        col("after.biography").as("biography"))
    val viaLib = Toast.backfillPtf(flat, "id", col("lsn"), "op", "biography")
      .select("id", "lsn", "biography")
    assertSameRows(viaSql.dropDuplicates("id", "lsn", "biography"), viaLib)

    // the PTF-only semantic, pinned: id 4's post-delete sentinel resolves
    // to NULL (state was reset), where the plain OVER-agg latch would have
    // revived the pre-delete value
    viaLib.filter(col("id") === 4 && col("lsn") === 10)
      .select("biography").collect().head.isNullAt(0) shouldBe true
    val overAgg = Toast.backfill(flat, "id", col("lsn"), "biography")
    overAgg.filter(col("id") === 4 && col("lsn") === 10)
      .select("biography").collect().head.getString(0) shouldBe "bio-4"
  }
}
