package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines — the
  * north-star surface beyond the reference's own operators (BASELINE.json
  * `north_star`; SURVEY.md §7.1 step 7). Everything is built from codegen'd
  * `org.apache.spark.sql.functions` (no UDFs): tokenization via `split`,
  * higher-order array functions for per-row scoring, `explode` + hash agg for
  * corpus-level stats. All operators are embarrassingly parallel per row or
  * single-shuffle aggregations — the 100 TB plan is the same plan.
  */
object TextOps {

  /** Whitespace tokens. The synthetic corpus is single-space separated;
    * for real corpora swap in a regex (`split(col, "\\s+")`).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-document stats: char/token counts, distinct-token count, mean token
    * length. One narrow projection — no shuffle.
    */
  def textStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col("*"),
      length(col(textCol)).as("n_chars_calc"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      (length(regexp_replace(col(textCol), " ", "")).cast(DoubleType) / size(toks))
        .as("avg_token_len"))
  }

  /** Function words used by the language-ID / quality heuristics. */
  val EnglishMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Language-ID heuristic: fraction of tokens that are English function
    * words; `predicted` = 'en' above the threshold, else 'und'. A real system
    * swaps the marker list for per-language n-gram tables — the dataflow
    * (per-row scoring, no shuffle) is identical.
    */
  def languageId(df: DataFrame, textCol: String, threshold: Double = 0.08): DataFrame = {
    val toks = tokens(col(textCol))
    val markers = array(EnglishMarkers.map(lit): _*)
    val score = size(filter(toks, t => array_contains(markers, t))).cast(DoubleType) / size(toks)
    df.select(col("*"), score.as("en_ratio"),
      when(score >= threshold, "en").otherwise("und").as("predicted"))
  }

  /** Quality score in [0,1]: mix of token diversity, function-word presence,
    * and length saturation. Weights are illustrative; the shape (pure per-row
    * arithmetic over array aggregates) is what matters at scale.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val markers = array(EnglishMarkers.map(lit): _*)
    val nTok = size(toks).cast(DoubleType)
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / nTok
    val stopRatio = size(filter(toks, t => array_contains(markers, t))).cast(DoubleType) / nTok
    val lenScore = least(length(col(textCol)).cast(DoubleType) / lit(500.0), lit(1.0))
    df.select(col("*"),
      uniqRatio.as("uniq_ratio"), stopRatio.as("stop_ratio"), lenScore.as("len_score"),
      (uniqRatio * 0.4 + stopRatio * 0.3 + lenScore * 0.3).as("quality"))
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace). Content-addressed identity for exact dedup — 128-bit, so
    * collisions are negligible at any corpus size.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact near-zero-cost dedup: group by fingerprint, canonical = min id.
    * Map-side combine bounds shuffle volume by |distinct fingerprints|; at
    * 100 TB this is the standard first pass before any fuzzy method.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = df.withColumn("fingerprint", fingerprint(col(textCol)))
    val canon = withFp.groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))
    withFp.join(canon, Seq("fingerprint"))
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
  }

  /** Corpus token frequency: explode + hash agg (map-side partial combine →
    * shuffle bounded by vocabulary size, not corpus size).
    */
  def tokenFrequency(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
}
