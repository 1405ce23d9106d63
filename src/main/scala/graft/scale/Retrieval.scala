package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Sparse lexical retrieval over the corpus — BM25 ranking on an inverted
  * index. The training-data use case is retrieval-BASED curation: given a
  * set of probe queries (eval-set passages, quality exemplars, contamination
  * suspects), rank the corpus documents that match and feed the top-k to a
  * verifier (n-gram overlap, an LLM judge, a human) — the fuzzy complement
  * to [[Decontam]]'s exact n-gram membership tests.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the INDEX is the corpus-sized object: postings (token, doc_id, tf)
  *    from one explode + one hash-agg shuffle, volume bounded by distinct
  *    (doc, token) pairs — the [[TextOps.tokenFrequency]] shape. Build it
  *    once per corpus snapshot and persist it partitioned by token (the
  *    same amortization contract as [[NearDup.buildMinHashIndex]]).
  *  - the QUERY side is small by construction (probe sets are thousands,
  *    not billions) and rides broadcast joins: the only corpus-sized work
  *    per probe batch is ONE pass of the postings against the broadcast
  *    query-term set — matched postings, document frequencies, and scores
  *    are all candidate-sized from there on. No exchange ever carries a
  *    row of the index that the broadcast join hasn't first reduced to a
  *    candidate.
  *  - scoring is plain column arithmetic (codegen'd); ranking is one
  *    window over (query, candidate) rows, partition count = |queries|.
  */
object Retrieval {

  /** Inverted-index postings: one row per (doc, token) with the term
    * frequency. One explode + one hash-agg shuffle (map-side combine);
    * shuffle volume is the per-document vocabulary, not the token stream.
    * Round-robin fanout first: tokenization is CPU-dense and the local
    * fixture arrives as one input split (real corpora arrive pre-split;
    * order-independence downstream keeps the result deterministic).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs.repartition(n)
      .select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
  }

  /** BM25 top-k: for each probe query (rows of (qIdCol, termCol), one row
    * per query term), the `k` best-scoring documents under
    * `score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with the Robertson/Lucene idf `ln(1 + (N − df + ½)/(df + ½))`.
    *
    * Scores are rounded to 4 decimals BEFORE ranking so the ordering (and
    * any cross-engine comparison) never hinges on last-ulp float noise;
    * rank ties break by doc_id. Duplicate query terms are collapsed —
    * each distinct term contributes once.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, termCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val post = postings(docs, idCol, textCol)
    val qterms = queries
      .select(col(qIdCol).as("q_id"), col(termCol).as("token")).distinct()

    // the ONE corpus-sized postings pass: joined to the broadcast query
    // terms, everything downstream is candidate-sized. cache(): feeds the
    // df count and the scoring join without re-scanning the corpus.
    val cand0 = post.join(broadcast(qterms), Seq("token")).cache()
    // document frequency over the WHOLE corpus, but only for query tokens;
    // distinct first — the q_id fanout must not multiply the doc count
    val dfq = cand0.select("token", "doc_id").distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))

    // corpus stats: N and average document length (one tiny aggregate,
    // broadcast into the scoring join as a 1-row dimension)
    val dl = docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast(DoubleType).as("dl"))
    val stats = dl.agg(count(lit(1)).cast(DoubleType).as("n_docs"),
      avg("dl").as("avgdl"))

    // candidate-sized side broadcast into the doc-length scan (dl is
    // corpus-sized but narrow; the broadcast keeps it scan-only)
    val cand = cand0.join(broadcast(dfq), Seq("token"))
    val scored = dl.join(broadcast(cand), Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn",
        col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("q_id", "doc_id")
      .agg(round(sum(col("idf") * col("tfn")), 4).as("score"))

    val w = Window.partitionBy("q_id")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
