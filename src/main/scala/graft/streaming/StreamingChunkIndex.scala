package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.scale.{Chunking, Retrieval}

/** Streaming maintenance of a CHUNK-granular BM25 index — passage
  * retrieval ([[Chunking]] × [[StreamingRetrieval]]) under the
  * [[SegmentStore]] LSM lifecycle, with one structural twist that makes
  * document updates sound: segment rows are chunk-level postings
  * (token, ck, dl, tf) keyed by [[Chunking.chunkKey]], but LIVENESS is
  * resolved per DOCUMENT (`doc_id`, derived from the key). A chunk-keyed
  * upsert contract would be wrong here — a re-sent document may chunk
  * into FEWER windows than its previous version, and nothing would ever
  * supersede the tail keys (v1's chunk 7 outlives a 3-chunk v2, returning
  * text the document no longer contains). Doc-level latest-wins kills
  * every old-version chunk row at once, whatever the new chunk count;
  * delete markers are per-document for the same reason.
  *
  * Probes score chunks ([[Retrieval.bm25TopK]] arithmetic — chunk-level
  * dl, N = live chunk count, df over live candidate chunks) and roll up
  * to documents via [[Chunking.chunkHitsToDocs]]: a document ranks as its
  * best passage. Per-batch write cost is the batch's own chunk
  * vocabulary; all liveness joins ride candidate- or churn-sized rows,
  * exactly as in [[StreamingRetrieval.bm25TopKLive]].
  */
object StreamingChunkIndex {

  private val segSchema = StructType(Seq(
    StructField("token", StringType), StructField("ck", LongType),
    StructField("doc_id", LongType), StructField("dl", DoubleType),
    StructField("tf", LongType), StructField("batch", LongType)))

  /** Committed manifest of the index at `indexDir`. */
  def readManifest(indexDir: String): SegmentStore.Manifest =
    SegmentStore.readManifest(indexDir)

  /** Live chunk postings under the committed manifest — schema
    * (token, ck, doc_id, dl, tf, batch).
    */
  def readSegments(spark: SparkSession, indexDir: String): DataFrame =
    SegmentStore.readSegments(spark, indexDir, segSchema)

  /** Live delete markers — schema (doc_id, batch): documents, not chunks. */
  def readDels(spark: SparkSession, indexDir: String): DataFrame =
    SegmentStore.readDels(spark, indexDir, "doc_id")

  /** One batch of documents → one chunk-postings segment: chunk, index
    * with the chunk key as the BM25 "document", then recover `doc_id`
    * from the key for doc-level liveness. Shared by [[processBatch]] and
    * batch-composed callers.
    */
  def buildChunkSegment(docs: DataFrame, idCol: String, textCol: String,
                        window: Int, stride: Int): DataFrame = {
    val chunks = Chunking.chunkDocuments(docs.select(idCol, textCol),
        idCol, textCol, window, stride)
      .select(Chunking.chunkKey(col(idCol), col("chunk_id")).as("ck"), col("chunk"))
    Retrieval.buildBm25Index(chunks, "ck", "chunk")
      .withColumnRenamed("doc_id", "ck")
      .withColumn("doc_id", Chunking.chunkKeyDoc(col("ck")))
  }

  /** Chunk-scored, document-ranked probe over the live view: each probe
    * query retrieves its `kChunks` best live chunks, then documents rank
    * as their best chunk ([[Chunking.chunkHitsToDocs]]) — top `kDocs` per
    * query, output (q_id, doc_id, best_chunk, score, rank). Equals the
    * batch pipeline (chunk the surviving latest-version corpus →
    * [[Retrieval.bm25TopK]] over chunk keys → rollup); the spec pins it
    * through a chunk-count-shrinking update, a delete, and a compaction.
    */
  def chunkTopKLiveDocs(segs: DataFrame, dels: DataFrame, queries: DataFrame,
                        qIdCol: String, termCol: String,
                        kChunks: Int = 20, kDocs: Int = 10,
                        k1: Double = 1.2, b: Double = 0.75,
                        maxDfFrac: Double = 1.0): DataFrame = {
    require(kChunks > 0, s"kChunks must be positive, got $kChunks")
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1], got $maxDfFrac")
    val qterms = queries
      .select(col(qIdCol).as("q_id"), col(termCol).as("token")).distinct()
    val qtokens = qterms.select("token").distinct()

    // ONE column-pruned chunk-level pass feeds versions and stats; the
    // version table is per DOCUMENT (see class doc)
    val chunkLevel = segs.select("doc_id", "ck", "dl", "batch").distinct()
    val versions = chunkLevel.select("doc_id", "batch").distinct()
    val liveChunks = SegmentStore.liveFilter(chunkLevel, versions, dels, "doc_id")
    val stats = liveChunks
      .agg(count(lit(1)).cast(DoubleType).as("n_docs"), avg("dl").as("avgdl"))

    // candidate pass: broadcast token reduction FIRST, doc-level liveness
    // after — churn joins touch only candidate chunks
    val cand1 = SegmentStore.liveFilter(
      segs.join(broadcast(qtokens), Seq("token")), versions, dels, "doc_id")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    val chunkHits = cand1.crossJoin(broadcast(stats))
      .filter(col("df") <= lit(maxDfFrac) * col("n_docs"))
      .join(broadcast(qterms), Seq("token"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn",
        col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "ck")
      .agg(round(sum(col("idf") * col("tfn")), 4).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("ck"))))
      .filter(col("rank") <= kChunks)
    Chunking.chunkHitsToDocs(chunkHits.withColumnRenamed("ck", "doc_id"), kDocs)
  }

  /** [[chunkTopKLiveDocs]] reading a maintained index directory. */
  def chunkTopKLiveDocs(spark: SparkSession, indexDir: String, queries: DataFrame,
                        qIdCol: String, termCol: String,
                        kChunks: Int, kDocs: Int): DataFrame =
    chunkTopKLiveDocs(readSegments(spark, indexDir), readDels(spark, indexDir),
      queries, qIdCol, termCol, kChunks, kDocs)

  /** Apply one micro-batch of document changes to the index at `indexDir`
    * (`opCol` rows with "d" delete the DOCUMENT — all its chunks; others
    * upsert, replacing all previous chunks whatever the new chunk count).
    * Redelivered batches are skipped.
    */
  def processBatch(docs: DataFrame, batchId: Long, indexDir: String,
                   window: Int, stride: Int,
                   idCol: String = "doc_id", textCol: String = "text",
                   opCol: Option[String] = None,
                   compactSegments: Int = 8): Unit =
    SegmentStore.processBatch(docs, batchId, indexDir, idCol, "doc_id", opCol,
      compactSegments,
      upserts => buildChunkSegment(upserts, idCol, textCol, window, stride))

  /** Attach index maintenance to a document-change stream. */
  def attachIndexMaintenance(docs: DataFrame, indexDir: String, checkpoint: String,
                             window: Int, stride: Int,
                             idCol: String = "doc_id", textCol: String = "text",
                             opCol: Option[String] = None,
                             compactSegments: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexDir, window, stride, idCol, textCol,
          opCol, compactSegments)
      }
      .start()
}
