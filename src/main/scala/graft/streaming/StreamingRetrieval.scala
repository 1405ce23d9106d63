package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.scale.Retrieval

/** Streaming maintenance of the BM25 postings index — the retrieval-family
  * analogue of [[StreamingNearDup]]'s online candidate state: documents
  * arrive as a stream, and each micro-batch appends one delta-sized
  * postings segment ([[Retrieval.buildBm25Index]] over just the batch) to
  * a partitioned parquet artifact. Probes read the segment set as ONE
  * index via partition discovery and see the corpus as of the last
  * committed batch; document frequencies, N, and avgdl are computed at
  * probe time from the segments, so no global state is ever rewritten —
  * per-batch write cost is the batch's own vocabulary, independent of
  * corpus size.
  *
  * Exactly-once: the segment directory is named by the micro-batch id and
  * written with Overwrite, so Structured Streaming's redelivery of an
  * uncommitted batch overwrites the same segment instead of duplicating
  * postings (the same idempotence rule as [[TxReplayStream]]'s versioned
  * state dirs). The corpus contract is append-only ids — same as
  * [[graft.scale.NearDup.incrementalMinHashDedup]]'s index; updating or
  * deleting a document requires a compaction pass outside this operator.
  */
object StreamingRetrieval {

  /** Attach index maintenance to a document stream (columns `idCol`,
    * `textCol`). Returns the started query; the index at `indexDir` is
    * readable at any batch boundary with `spark.read.parquet(indexDir)`
    * and probed with [[Retrieval.bm25TopKIndexed]]. Probes hold nothing in
    * Spark's plan-keyed cache, so re-probing the same query set after new
    * segments land always reads the current segment set
    * (StreamingRetrievalSpec pins this).
    */
  def attachIndexMaintenance(docs: DataFrame, indexDir: String, checkpoint: String,
                             idCol: String = "doc_id",
                             textCol: String = "text"): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retrieval.buildBm25Index(batch, idCol, textCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/batch=$batchId")
      }
      .start()
}
