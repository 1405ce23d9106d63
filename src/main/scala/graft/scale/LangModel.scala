package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style quality
  * gate: train token statistics ON the corpus, score every document by its
  * mean negative log-likelihood, and let the caller threshold (low NLL =
  * head-like repetitive text, high NLL = rare-token noise; the middle is
  * what LLM pipelines keep).
  *
  * Scale shape: one shuffle to build the unigram table (map-side combined
  * count), join it back onto the exploded tokens, one shuffle to
  * re-aggregate per document. The vocab join carries NO broadcast hint on
  * purpose: an unconditional hint would force Spark to collect the whole
  * vocabulary to the driver even when it outgrows memory, so we let AQE
  * pick — small vocab becomes a runtime broadcast join, a 100 TB-corpus
  * vocab degrades gracefully to a shuffled join on `token` (salt via
  * [[Skew.saltedJoin]] if the Zipf head ever skews it). Only the 1-row
  * corpus-total aggregate keeps an explicit broadcast. No driver-side
  * state: the "model" is a DataFrame.
  *
  * Determinism contract (what makes this DuckDB-oracle-able): each token's
  * NLL is rounded to 6 decimals and cast to DECIMAL(18,6) BEFORE the
  * per-document sum, because decimal summation is exact integer arithmetic
  * and therefore independent of partial-aggregation order — a raw
  * double sum could differ in the last ulp between engines/plans and flip
  * the final rounding. The ln itself is bit-identical across engines
  * (same IEEE inputs; pinned by the q_tfidf oracle since round 3).
  */
object LangModel {

  /** Per-document mean unigram NLL over whitespace tokens.
    * Output: idCol, n_tokens (0 for token-less docs), nll (double rounded
    * to 4 decimals; NULL when n_tokens = 0).
    */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("n_total"))
    val perTok = toks
      .join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("_nll", round(-log(col("cnt").cast("double") / col("n_total")), 6)
        .cast("decimal(18,6)"))
    val scored = perTok.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("_nll")).cast("double") / count(lit(1)), 4).as("nll"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens"))
  }

  /** CCNet-style per-language perplexity bucketing (Wenzek et al. 2019):
    * score every document with the corpus unigram LM, then split EACH
    * language's distribution into `n` equal-frequency buckets — bucket 1 =
    * "head" (most fluent / most repetitive), bucket n = "tail" (rare-token
    * noise); CCNet keeps head+middle. Per-language bucketing is the point:
    * a global threshold would just rank languages, not documents.
    *
    * This exact-ntile form sorts each language partition — fine up to the
    * per-partition sort budget, and oracle-able. At 100 TB swap the window
    * for two passes: `approx_percentile(nll, [1/n .. (n-1)/n])` per
    * language (one shuffle to a tiny thresholds table), broadcast the
    * thresholds back, and bucket per-row — same output up to sketch error
    * at the cut points, no global sort. The window spec below (NULLS FIRST,
    * id tiebreak) is what makes the exact form deterministic.
    *
    * Output: idCol, langCol, nll, bucket (1..n), ccnet_bucket
    * (head / middle / tail labels for n=3, "b<k>" otherwise).
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, n: Int = 3): DataFrame = {
    val scored = unigramNll(docs.select(col(idCol), col(textCol)), idCol, textCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(langCol)
      .orderBy(col("nll").asc_nulls_first, col(idCol).asc)
    val labelExpr =
      if (n == 3)
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle")
          .otherwise("tail")
      else concat(lit("b"), col("bucket"))
    docs.select(col(idCol), col(langCol))
      .join(scored.select(col(idCol), col("nll")), Seq(idCol))
      .withColumn("bucket", ntile(n).over(w))
      .withColumn("ccnet_bucket", labelExpr)
  }
}
