package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** CDC → search, end to end: the tx-aware replay's emission feeds the
  * streaming BM25 index as its downstream consumer — the reference's
  * deployment shape, where the ingest job materializes an upsert topic
  * that downstream jobs consume
  * (`debezium-kafka-flink-sql-ingest/.../KafkaUpsertJob.java:23-38`).
  * The consumer reduces each emission batch to the LATEST version per
  * key before indexing (a replay batch may carry several commits of one
  * key; the index contract is at-most-one row per id per batch), maps
  * the tombstone flag to the index's delete op, and afterward a search
  * probe must see exactly the orders a materialized upsert view holds:
  * updated text findable, superseded text not, deleted orders absent.
  */
class CdcSearchSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("replay emission indexes as an upsert consumer; search sees the materialized view") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val idxDir = Files.createTempDirectory("graft-cdc-search-idx").toString
    val input = MemoryStream[WireEv]
    val q = TxReplayStream.attach(
      input.toDF(),
      Files.createTempDirectory("graft-cdc-search-state").toString,
      Files.createTempDirectory("graft-cdc-search-ckpt").toString) { (docs, batchId) =>
      // the downstream consumer: latest emission per key this batch →
      // upsert/delete into the search index over the payload text
      val latest = docs
        .groupBy("key")
        .agg(max_by(struct(col("commit_lsn"), col("deleted"),
          col("row.shipping_address").as("addr")), col("commit_lsn")).as("w"))
        .select(col("key").as("doc_id"),
          coalesce(col("w.addr"), lit("")).as("text"),
          when(col("w.deleted"), "d").otherwise("u").as("op"))
      StreamingRetrieval.processBatch(latest, batchId, idxDir, opCol = Some("op"))
    }

    def l(key: Long, op: String, lsn: Long, tx: Long, addr: String) =
      WireEv("l", key, -1, op, lsn, tx, OrderLineRow(9, addr), -1, -1, -1)
    def r(key: Long, line: Long, op: String, lsn: Long, tx: Long) =
      WireEv("r", key, line, op, lsn, tx, OrderLineRow(-1, null), -1, -1, -1)
    def t(tx: Long, commit: Long, el: Long, er: Long) =
      WireEv("t", -1, -1, null, -1, tx, null, commit, el, er)

    def search(term: String): Set[Long] = {
      val probe = Seq((0L, term)).toDF("q_id", "term")
      StreamingRetrieval.bm25TopKLive(spark, idxDir, probe, "q_id", "term", k = 10)
        .select("doc_id").as[Long].collect().toSet
    }

    try {
      // batch 1: two orders (each with a line) commit — a NEW order must
      // carry at least one pair to emit (reference gating: emission happens
      // from processed record pairs only)
      input.addData(l(1, "c", 1, 1, "alpha street"), r(1, 10, "c", 2, 1), t(1, 100, 1, 1),
        l(2, "c", 3, 2, "gamma plaza"), r(2, 20, "c", 4, 2), t(2, 110, 1, 1))
      q.processAllAvailable()
      search("alpha") shouldBe Set(1L)
      search("gamma") shouldBe Set(2L)

      // batch 2: order 1 updated TWICE in one emission batch (two commits)
      // — the consumer's latest-per-key reduction must index only the
      // final "beta road", never the transient "delta avenue"
      input.addData(
        l(1, "u", 5, 3, "delta avenue"), t(3, 200, 1, 0),
        l(1, "u", 6, 4, "beta road"), t(4, 210, 1, 0))
      q.processAllAvailable()
      search("beta") shouldBe Set(1L)
      search("alpha") shouldBe empty // superseded version is gone
      search("delta") shouldBe empty // transient version never indexed

      // batch 3: order 2 deleted → tombstone → drops out of search
      input.addData(l(2, "d", 7, 5, null), t(5, 300, 1, 0))
      q.processAllAvailable()
      search("gamma") shouldBe empty
      search("beta") shouldBe Set(1L) // untouched order still findable
    } finally q.stop()
  }
}
