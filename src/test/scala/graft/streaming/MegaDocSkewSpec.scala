package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.scale.Chunking

/** The chunk families resolve liveness per DOCUMENT, so one pathological
  * document — the 2²⁰-chunk cap's worth of windows on a single `doc_id`
  * join key — is the natural skew worry ([[SegmentStore.liveFilter]]
  * joins every chunk row on `doc_id`). This spec plants one at 2²⁰ chunk
  * rows (the key's design maximum) next to a normal corpus, supersedes
  * it, and pins WHY the skew never materializes: both liveness
  * predicates ride churn-sized BROADCAST joins, and a broadcast hash
  * join neither shuffles nor co-locates the probe side — the mega-doc's
  * million rows stay spread across whatever partitioning the scan had,
  * each partition filtering its own slice. A SortMergeJoin in this plan
  * WOULD concentrate the key on one task; its absence is the guarantee,
  * so the plan shape is the assertion (same discipline as PlanShapeSpec).
  * Salting (the [[graft.scale.NearDup.softDedupWeights]] `skewSafe`
  * precedent) is therefore NOT needed here — measured, not assumed.
  *
  * Chunk-level rows are synthesized directly (fabricating the postings a
  * tokenizer would emit) — the stress is the liveness JOIN, not the
  * tokenizer.
  */
class MegaDocSkewSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a 2^20-chunk document superseded in one batch: broadcast liveness, no skewed shuffle") {
    val mega = 1L << Chunking.ChunkKeyShift // the key-design maximum
    val megaDoc = 424242L

    // batch-0 segment rows: the mega-doc's 2^20 chunks + 1000 normal docs
    // of 4 chunks each; every chunk carries one posting of its own token
    // plus the probe token on a 1-in-64 stripe of the mega-doc
    def seg(docRows: DataFrame, batch: Long): DataFrame =
      docRows.select(col("doc_id"),
          Chunking.chunkKey(col("doc_id"), col("chunk_id")).as("ck"),
          col("chunk_id"), lit(8.0).as("dl"))
        .select(col("doc_id"), col("ck"), col("dl"),
          explode(when(col("chunk_id") % 64 === 0 && col("doc_id") === megaDoc,
            array(lit("needle"), concat(lit("t"), col("ck"))))
            .otherwise(array(concat(lit("t"), col("ck"))))).as("token"))
        .select(col("token"), col("ck"), col("doc_id"), col("dl"),
          lit(1L).as("tf"), lit(batch).as("batch"))

    val megaChunks = spark.range(mega)
      .select(lit(megaDoc).as("doc_id"), col("id").cast("int").as("chunk_id"))
    val normalChunks = spark.range(4000)
      .select((col("id") % 1000).as("doc_id"), (col("id") / 1000).cast("int").as("chunk_id"))
    val seg0 = seg(megaChunks.unionByName(normalChunks), 0L)

    // batch 1 SUPERSEDES the mega-doc with a 2-chunk version: doc-level
    // latest-wins must drop all 2^20 old rows at probe time
    val seg1 = seg(spark.range(2)
      .select(lit(megaDoc).as("doc_id"), col("id").cast("int").as("chunk_id")), 1L)
    val dels = Seq((999L, 2L)).toDF("doc_id", "batch")

    val probes = Seq((1L, "needle")).toDF("q_id", "term")
    val hits = StreamingChunkIndex.chunkHitsLive(
      seg0.unionByName(seg1), dels, probes, "q_id", "term", kChunks = 20)

    val t0 = System.nanoTime()
    val got = hits.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"mega-doc liveness probe over ${mega + 4000 + 2} chunk rows: $secs%.2f s")

    // correctness: the superseded version's 16384 needle-striped chunks
    // are DEAD; only the 2-chunk v2 (chunk 0 carries the needle) answers
    got.map(_.getLong(1)).toSet shouldBe Set(Chunking.key(megaDoc, 0))

    // plan shape: every liveness/candidate join broadcasts — no
    // SortMergeJoin anywhere, so no task ever owns the mega key's rows
    val plan = (hits.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    plan should not include "SortMergeJoin"
    plan should include("BroadcastHashJoin")

    // and the full-resolution path (compaction's shape — liveRows touches
    // EVERY row, the worst case for the skewed key) also stays broadcast
    val liveAll = SegmentStore.liveRows(seg0.unionByName(seg1), dels, "doc_id")
    // v2 = chunk 0 (needle + own token) and chunk 1 (own token): 3 postings
    liveAll.filter(col("doc_id") === megaDoc).count() shouldBe 3L
    val planAll = (liveAll.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    planAll should not include "SortMergeJoin"
  }
}
