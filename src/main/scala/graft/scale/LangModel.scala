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
  * count), broadcast it back onto the exploded tokens (the vocabulary is
  * sublinear in the corpus; at sizes where it outgrows the broadcast
  * threshold Spark falls back to a shuffled join on `token` — salt via
  * [[Skew.saltedJoin]] if the Zipf head ever skews it), one shuffle to
  * re-aggregate per document. No driver-side state: the "model" is a
  * DataFrame.
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
      .join(broadcast(counts), Seq("token"))
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
}
