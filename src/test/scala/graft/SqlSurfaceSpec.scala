package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.Denormalize

/** The SQL text surface: the same Catalyst plans are reachable through
  * `spark.sql` — the flagship denormalization as plain SQL over temp views
  * equals the library operator row-for-row, and the injected native
  * `vec_dot` function resolves from SQL (SparkSessionExtensions
  * registration, not just the Column API).
  */
class SqlSurfaceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("flagship denormalization via spark.sql equals the library operator") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_v")
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT o.*, sort_array(collect_list(
        |  CASE WHEN l.l_orderkey IS NOT NULL THEN struct(
        |    l.l_linenumber, l.l_partkey, l.l_quantity, l.l_extendedprice) END)) AS lines
        |FROM orders_v o LEFT JOIN lineitem_v l ON o.o_orderkey = l.l_orderkey
        |GROUP BY ALL""".stripMargin)
      .withColumn("lines", to_json(col("lines")))

    val api = Denormalize.ordersWithLines(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf),
      "o_orderkey", "l_orderkey",
      Seq("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"))
      .withColumn("lines", to_json(col("lines")))

    // identical row sets (column order may differ between the two spellings)
    val cols = api.columns.sorted.toIndexedSeq
    sql.select(cols.map(col): _*).exceptAll(api.select(cols.map(col): _*))
      .isEmpty shouldBe true
    api.select(cols.map(col): _*).exceptAll(sql.select(cols.map(col): _*))
      .isEmpty shouldBe true
    api.count() should be > 0L
  }

  test("native vec_dot resolves from SQL text") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings_v")
    val row = spark.sql(
      """SELECT vec_id, round(vec_dot(embedding, embedding), 6) AS sq_norm
        |FROM embeddings_v ORDER BY vec_id LIMIT 1""".stripMargin).collect()
    row.length shouldBe 1
    row.head.getDouble(1) should be > 0.0
  }

  test("native nfc_normalize resolves from SQL text and composes marks") {
    val row = spark.sql(
      "SELECT nfc_normalize('Cafe\u0301') AS t, length('Cafe\u0301') AS raw").collect()
    row.head.getString(0) shouldBe "Caf\u00e9" // composed e-acute
    row.head.getString(0).length shouldBe 4
    row.head.getInt(1) shouldBe 5 // the input really was decomposed
  }

  test("kmv aggregate resolves from SQL text and equals the Column API") {
    Tables.events(spark, sf).createOrReplaceTempView("events_v")
    val sqlRes = spark.sql(
      """SELECT event_type,
        |  kmv(cast(conv(substr(md5(cast(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT), 64) AS kmv
        |FROM events_v WHERE user_id IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val api = graft.scale.Sketches
      .kmvDistinct(Tables.events(spark, sf), Seq("event_type"), "user_id", 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    sqlRes shouldBe api
  }

  test("sliding-window chunking via spark.sql equals the library operator") {
    Tables.documents(spark, sf).createOrReplaceTempView("documents_v")
    val sqlRes = spark.sql(
      """WITH t AS (SELECT doc_id, split(text, ' ') AS toks,
        |  size(split(text, ' ')) AS n FROM documents_v),
        |c AS (SELECT doc_id, toks, n,
        |  explode(sequence(0, CASE WHEN n <= 32 THEN 0
        |    ELSE cast(ceil((n - 32) / 16.0) AS INT) END)) AS chunk_id
        | FROM t)
        |SELECT doc_id, chunk_id, chunk_id * 16 AS tok_start,
        |  least(chunk_id * 16 + 32, n) AS tok_end,
        |  array_join(slice(toks, chunk_id * 16 + 1,
        |    least(chunk_id * 16 + 32, n) - chunk_id * 16), ' ') AS chunk
        |FROM c""".stripMargin)
    val api = graft.scale.Chunking.chunkDocuments(
      Tables.documents(spark, sf).select("doc_id", "text"),
      "doc_id", "text", window = 32, stride = 16)
    val cols = api.columns.sorted.toIndexedSeq
    import org.apache.spark.sql.functions.col
    sqlRes.select(cols.map(col): _*).exceptAll(api.select(cols.map(col): _*))
      .isEmpty shouldBe true
    api.select(cols.map(col): _*).exceptAll(sqlRes.select(cols.map(col): _*))
      .isEmpty shouldBe true
    api.count() should be > 0L
  }
}
