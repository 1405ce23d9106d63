package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Per-document sliding-window chunking — the unit-of-retrieval transform.
  *
  * A curation/RAG pipeline rarely retrieves or dedups whole documents: it
  * splits each one into overlapping token windows and treats the CHUNK as
  * the unit (index chunks, dedup chunks, verify chunks, then roll verdicts
  * back up to the document). This is the per-document complement of
  * [[Packing.packChunks]], which chunks the concatenated STREAM for LM
  * pretraining — there a chunk may straddle documents; here a chunk never
  * crosses a document boundary.
  *
  * Window rule (the HF/SQuAD sliding-window convention): chunk `i` covers
  * tokens `[i·stride, min(i·stride + window, n))`; a document with
  * `n <= window` tokens yields exactly one chunk; otherwise
  * `ceil((n − window) / stride) + 1` chunks, so the final window always
  * reaches the tail (and overlaps its predecessor by MORE than
  * `window − stride` when the tail is short — tokens are never dropped,
  * and no chunk start lies at or past `n`).
  *
  * Scale shape: one narrow pass — tokenize, compute the chunk count,
  * explode a `sequence`, slice. No shuffle, no window function, no state;
  * output volume is bounded by `window/stride` × the token stream (2× at
  * the standard 50% overlap). At 100 TB this runs as a map-only stage and
  * the downstream chunk-keyed groupBy/join is where the (unavoidable,
  * chunk-keyed) shuffle lives.
  *
  * Reference anchor: the reference pipelines operate on whole Kafka
  * events/documents (e.g. debezium-kafka-flink-sql-ingest); chunking is
  * part of the training-data extension surface, not a port.
  */
object Chunking {

  /** Explode `df` into one row per (document, chunk): `chunk_id` (0-based),
    * the half-open token span `[tok_start, tok_end)`, and the chunk text
    * (tokens re-joined with single spaces). All other input columns are
    * preserved. Tokenization is [[TextOps.tokens]] (single-space split),
    * so `window`/`stride` count whitespace tokens.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window > 0, s"window must be > 0, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val nChunks = when(col("_n") <= window, lit(1))
      .otherwise(ceil((col("_n") - window) / lit(stride.toDouble)).cast(IntegerType) + 1)
    df.withColumn("_toks", TextOps.tokens(col(textCol)))
      .withColumn("_n", size(col("_toks")))
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("tok_start", col("chunk_id") * stride)
      .withColumn("tok_end", least(col("tok_start") + window, col("_n")))
      .withColumn("chunk",
        array_join(slice(col("_toks"), col("tok_start") + 1,
          col("tok_end") - col("tok_start")), " "))
      .drop("_toks", "_n", textCol)
  }

  /** Stable scalar chunk key for feeding chunks through doc-keyed operators
    * ([[Retrieval.bm25TopK]], dedup): `doc_id · 2²⁰ + chunk_id`. 2²⁰ chunks
    * per document bounds documents at ~16M stride tokens — far past any
    * real document; the builder raises loudly if a chunk_id ever exceeds
    * it rather than silently colliding.
    */
  val ChunkKeyShift: Int = 20

  def chunkKey(docId: org.apache.spark.sql.Column,
               chunkId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftleft(docId, ChunkKeyShift) +
      when(chunkId < (1 << ChunkKeyShift), chunkId)
        .otherwise(raise_error(concat(lit("chunk_id overflows chunk key: "),
          chunkId.cast("string"))))

  /** Scala-side [[chunkKey]] for fixtures and driver-side constants. */
  def key(docId: Long, chunkId: Int): Long = {
    require(chunkId >= 0 && chunkId < (1 << ChunkKeyShift),
      s"chunk_id out of key range: $chunkId")
    (docId << ChunkKeyShift) + chunkId
  }

  def chunkKeyDoc(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftright(key, ChunkKeyShift)

  def chunkKeyChunk(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    key.bitwiseAND((1L << ChunkKeyShift) - 1)

  /** Roll a CHUNK-keyed retrieval ranking back up to documents: the input
    * is a [[Retrieval.bm25TopK]]-shaped frame (q_id, doc_id, score, …)
    * whose `doc_id` holds [[chunkKey]]s; each document scores as its best
    * chunk (max score, ties to the lowest chunk_id) and documents re-rank
    * by (score desc, doc_id). Output: (q_id, doc_id, best_chunk, score,
    * rank), top `k` documents per query. Everything here is
    * top-k-list-sized — two rank windows over candidate rows.
    */
  def chunkHitsToDocs(hits: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val perDoc = hits
      .select(col("q_id"), chunkKeyDoc(col("doc_id")).as("d"),
        chunkKeyChunk(col("doc_id")).as("c"), col("score"))
    val best = Window.partitionBy("q_id", "d").orderBy(col("score").desc, col("c"))
    val docs = perDoc.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("d").as("doc_id"), col("c").as("best_chunk"), col("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id"))
    docs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Hybrid retrieval fused AT CHUNK GRANULARITY — the modern RAG shape:
    * each retriever ranks CHUNKS ([[chunkKey]]s in `doc_id`: a lexical
    * chunk-BM25 list, a semantic chunk-ANN list), reciprocal-rank fusion
    * ([[Retrieval.rrfFuse]]) combines them while they are still passages,
    * and only the fused ranking rolls up to documents
    * ([[chunkHitsToDocs]] on the RRF score). Fusing after a per-system
    * doc rollup would lose exactly the signal passage retrieval exists
    * for: a document whose SAME passage both retrievers agree on must
    * beat one ranking high on two different passages' weak evidence.
    * Output: (q_id, doc_id, best_chunk, rrf, rank), top `kDocs` per query.
    *
    * Scale shape: inputs are top-k chunk lists, so everything here is
    * candidate-sized — rrfFuse's union + hash-agg + rank window, then the
    * two rollup windows.
    */
  def fuseChunkRankings(rankings: Seq[DataFrame], kDocs: Int,
                        kChunks: Int = 20, k0: Int = 60): DataFrame =
    chunkHitsToDocs(
      Retrieval.rrfFuse(rankings, k = kChunks, k0 = k0)
        .withColumnRenamed("rrf", "score"), kDocs)
      .withColumnRenamed("score", "rrf")

  /** Corpus-wide exact chunk dedup rolled back up to documents: chunk every
    * document, fingerprint each chunk ([[TextOps.fingerprint]]), keep the
    * first occurrence of each distinct chunk text (min (doc_id, chunk_id)),
    * and report per document how much of it survived — `n_chunks`,
    * `n_kept`, and `kept_frac`. A document whose chunks are mostly
    * boilerplate seen elsewhere scores low; gating on `kept_frac` is the
    * chunk-granular analogue of [[TextOps.dedupLines]]' line filter.
    *
    * Shape (r14): the per-document tallies need only COUNTS, so the former
    * fingerprint join-back (chunks ⋈ winners on fp — the operator's widest
    * shuffle, corpus-chunk-sized on BOTH sides, and a second evaluation of
    * the chunk explode + fingerprint pipeline) is gone. Each distinct
    * fingerprint elects exactly one winning (doc, chunk) instance, so
    * `n_kept(doc) = |winners with w_doc = doc|` — a doc-keyed count over
    * the winner table; `n_chunks` is a doc-keyed count of the exploded
    * rows, which column pruning serves WITHOUT the fingerprint math. Chunk
    * TEXT never shuffles — only its 128-bit fingerprint does — and the
    * fingerprint is now computed exactly once per chunk.
    */
  def chunkDedupStats(df: DataFrame, idCol: String, textCol: String,
                      window: Int, stride: Int): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, window, stride)
      .select(col(idCol), col("chunk_id"), TextOps.fingerprint(col("chunk")).as("fp"))
    // packed arg-min (HashAggregate, no sort of the chunk explosion —
    // min(struct(doc, chunk)) fell back to SortAggregate); chunk_id is an
    // int sequence index, so TextOps.packedLexLongInt's range holds.
    // Non-integral doc ids keep the struct order (the packing would
    // re-order string/decimal keys — see packedLexLongInt). Only the
    // winning doc id is needed for the tally, but the tiebreak must still
    // rank (doc, chunk) pairs lexicographically.
    val winners =
      if (TextOps.integralIdType(df.schema(idCol).dataType)) {
        val ck = TextOps.packedLexLongInt(col(idCol), col("chunk_id"))
        chunks.groupBy("fp").agg(min_by(col(idCol), ck).as("w_doc"))
      } else
        chunks.groupBy("fp")
          .agg(min(struct(col(idCol).as("i"), col("chunk_id").as("c"))).as("_w"))
          .select(col("fp"), col("_w.i").as("w_doc"))
    val kept = winners.groupBy(col("w_doc").as(idCol))
      .agg(count(lit(1)).as("n_kept"))
    chunks.groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("kept_frac", round(col("n_kept") / col("n_chunks"), 4))
  }
}
