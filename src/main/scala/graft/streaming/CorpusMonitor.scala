package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DoubleType

import graft.scale.TextOps

/** CONTENT-level observability for a document ingest stream — the
  * data-drift complement to [[GraftMetricsListener]]'s query-level
  * counters (events seen, lag, state size). A 100 TB pipeline's silent
  * failure mode is not a crashed query but a crawl batch whose CONTENT
  * shifted — a parser regression flooding boilerplate, a source switching
  * language, an extractor truncating documents — which poisons training
  * data while every query-level metric stays green. The monitor profiles
  * each micro-batch (volume, token-length and quality moments) and flags
  * batches whose means move more than `z` baseline standard deviations.
  *
  * Scale shape: the profile is one partial-aggregated pass over the batch
  * (per-row arithmetic + one 1-row aggregate — no shuffle of document
  * rows); the baseline is a 1-row broadcast dimension. The drift rule is
  * deliberately moment-based (mean shift in units of baseline sd), not
  * distributional (KS/χ²): a mean-of-millions moves only on real shifts,
  * and the rule stays reproducible in plain SQL — [[graft.ScaleQueries]]
  * oracles the identical arithmetic per source. Per-batch log rows are
  * written to `dir/batch=<id>` with Overwrite, so a redelivered batch
  * rewrites its own row idempotently (the [[SegmentStore]] rule).
  */
object CorpusMonitor {

  /** Quality profile: n_docs, mean/sd of per-doc token count and quality
    * score ([[TextOps.qualityScore]]), rounded to 6 decimals so profiles
    * compare across engines — one row (the batch/corpus baseline shape)
    * or one row per `groupBy` key (per-source auditing). Sample sd (n−1),
    * mirrored by the oracle's `stddev_samp`; sd coalesces to 0 so a 1-doc
    * group still profiles.
    */
  def profile(docs: DataFrame, textCol: String,
              groupBy: Seq[String] = Nil): DataFrame =
    TextOps.qualityScore(docs, textCol)
      .select((groupBy.map(col) :+
        size(TextOps.tokens(col(textCol))).cast(DoubleType).as("n_tokens") :+
        col("quality")): _*)
      .groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_tokens"), 6).as("mean_tokens"),
        round(coalesce(stddev("n_tokens"), lit(0.0)), 6).as("sd_tokens"),
        round(avg("quality"), 6).as("mean_quality"),
        round(coalesce(stddev("quality"), lit(0.0)), 6).as("sd_quality"))

  /** Drift verdicts of profile rows against a 1-row baseline profile:
    * per-metric z = |mean − baseline mean| / baseline sd (Infinity when
    * the baseline sd is 0 and the mean moved), `drift` = any z > `z`.
    * Both sides are profile-shaped, so this composes over a streaming
    * batch profile, a per-source profile, or a read-back monitor log.
    */
  def drift(profiles: DataFrame, baseline: DataFrame, z: Double): DataFrame = {
    require(z > 0.0, s"z must be positive, got $z")
    val base = baseline.select(col("mean_tokens").as("b_mean_tokens"),
      col("sd_tokens").as("b_sd_tokens"),
      col("mean_quality").as("b_mean_quality"),
      col("sd_quality").as("b_sd_quality"))
    def score(mean: String, bMean: String, bSd: String) = {
      val diff = abs(col(mean) - col(bMean))
      round(when(col(bSd) > 0.0, diff / col(bSd))
        .when(diff > 0.0, lit(Double.PositiveInfinity))
        .otherwise(lit(0.0)), 4)
    }
    profiles.crossJoin(broadcast(base))
      .withColumn("z_tokens", score("mean_tokens", "b_mean_tokens", "b_sd_tokens"))
      .withColumn("z_quality", score("mean_quality", "b_mean_quality", "b_sd_quality"))
      .withColumn("drift", col("z_tokens") > z || col("z_quality") > z)
      .drop("b_mean_tokens", "b_sd_tokens", "b_mean_quality", "b_sd_quality")
  }

  /** Profile one micro-batch, judge it against the baseline, and append
    * the verdict row to the monitor log at `dir` (idempotent per batch).
    * A batch with no documents is skipped — zero docs has no moments to
    * judge (a delete-only CDC batch reaches a text monitor empty), and a
    * null-profile row would poison every later log read.
    */
  def processBatch(docs: DataFrame, batchId: Long, dir: String,
                   baseline: DataFrame, textCol: String, z: Double): Unit =
    if (docs.limit(1).count() > 0)
      drift(profile(docs, textCol), baseline, z)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchId")

  /** The monitor log: one verdict row per profiled batch, `batch` read
    * back from the partition dir name (cast to LONG — partition-value
    * inference would otherwise pick the narrowest type that fits the ids
    * seen so far, changing the schema as the stream ages).
    */
  def readLog(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("batch", col("batch").cast(org.apache.spark.sql.types.LongType))

  /** Attach content monitoring to a document stream. `baseline` is the
    * corpus profile the stream is judged against — compute it once from a
    * trusted snapshot (`profile(corpus, textCol)`) and refresh it on the
    * cadence the corpus legitimately evolves; a self-updating baseline
    * would absorb slow poisoning.
    */
  def attachMonitor(docs: DataFrame, dir: String, checkpoint: String,
                    baseline: DataFrame, textCol: String = "text",
                    z: Double = 3.0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, baseline, textCol, z)
      }
      .start()
}
