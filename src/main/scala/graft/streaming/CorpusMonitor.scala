package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType, StructField, StructType}

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
  * oracles the identical arithmetic per source.
  *
  * The monitor LOG lives under the [[SegmentStore]] lifecycle — verdict
  * rows are append-only facts keyed by their batch id, so the store's
  * manifest/compaction machinery bounds the artifact for free: one tiny
  * segment per batch until `compactBatches`, then everything folds into
  * one segment. Without the roll-up a one-dir-per-batch log costs 10⁵
  * file listings/footers per read at 10⁵ micro-batches of stream age (the
  * same unbounded-artifact shape the BM25 segments had before their LSM
  * rework); with it, `readLog` touches at most `compactBatches` + grace
  * dirs regardless of age. Idempotence is the store's: a redelivered
  * batch id at or below the committed high-water mark is skipped — the
  * committed verdict stands (foreachBatch redelivers the same source
  * data, so re-judging it is pure waste).
  */
object CorpusMonitor {

  private val logSchema = StructType(Seq(
    StructField("b", LongType), StructField("n_docs", LongType),
    StructField("mean_tokens", DoubleType), StructField("sd_tokens", DoubleType),
    StructField("mean_quality", DoubleType), StructField("sd_quality", DoubleType),
    StructField("z_tokens", DoubleType), StructField("z_quality", DoubleType),
    StructField("drift", BooleanType), StructField("batch", LongType)))

  /** Quality profile: n_docs, mean/sd of per-doc token count and quality
    * score ([[TextOps.qualityScore]]), at the shared moment grain
    * ([[DriftRule.mean6]]/[[DriftRule.sd6]] — 6 decimals, sample sd with
    * the NaN→0 1-row rule, mirrored by the oracle's `stddev_samp`) so
    * profiles compare across engines — one row (the batch/corpus baseline
    * shape) or one row per `groupBy` key (per-source auditing).
    */
  def profile(docs: DataFrame, textCol: String,
              groupBy: Seq[String] = Nil): DataFrame =
    TextOps.qualityScore(docs, textCol)
      .select((groupBy.map(col) :+
        size(TextOps.tokens(col(textCol))).cast(DoubleType).as("n_tokens") :+
        col("quality")): _*)
      .groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        DriftRule.mean6(col("n_tokens")).as("mean_tokens"),
        DriftRule.sd6(col("n_tokens")).as("sd_tokens"),
        DriftRule.mean6(col("quality")).as("mean_quality"),
        DriftRule.sd6(col("quality")).as("sd_quality"))

  /** Drift verdicts of profile rows against a 1-row baseline profile:
    * per-metric z = [[DriftRule.zScore]] of |mean − baseline mean| —
    * shift in baseline sds, Infinity when a zero-sd baseline moved past
    * the shared noise floor ([[DriftRule.MinShiftAtZeroSd]]: pure
    * 6-decimal rounding noise on a degenerate baseline must not flag) —
    * and `drift` = any z > `z`. Two-sided BY DESIGN (unlike the index
    * judges' one-sided sag): content that shifts in either direction is
    * worth a look. Both sides are profile-shaped, so this composes over a
    * streaming batch profile, a per-source profile, or a read-back
    * monitor log.
    *
    * The 1-row contract is ENFORCED lazily: a multi-row baseline (e.g. a
    * per-source profile passed by mistake) would silently multiply every
    * verdict row, so the baseline column read raises instead — checked
    * with a window count inside the plan, no extra action. An EMPTY
    * baseline yields an empty verdict frame (nothing to judge against).
    */
  def drift(profiles: DataFrame, baseline: DataFrame, z: Double): DataFrame = {
    require(z > 0.0, s"z must be positive, got $z")
    val nb = count(lit(1)).over(Window.partitionBy(lit(1)))
    val base = baseline.select(
      when(nb === 1, col("mean_tokens"))
        .otherwise(raise_error(concat(
          lit("drift: baseline must be exactly 1 row, got "), nb.cast("string"))))
        .as("b_mean_tokens"),
      col("sd_tokens").as("b_sd_tokens"),
      col("mean_quality").as("b_mean_quality"),
      col("sd_quality").as("b_sd_quality"))
    def score(mean: String, bMean: String, bSd: String) =
      round(DriftRule.zScore(abs(col(mean) - col(bMean)), col(bSd)), 4)
    profiles.crossJoin(broadcast(base))
      .withColumn("z_tokens", score("mean_tokens", "b_mean_tokens", "b_sd_tokens"))
      .withColumn("z_quality", score("mean_quality", "b_mean_quality", "b_sd_quality"))
      .withColumn("drift", col("z_tokens") > z || col("z_quality") > z)
      .drop("b_mean_tokens", "b_sd_tokens", "b_mean_quality", "b_sd_quality")
  }

  /** A pre-round-10 monitor log (the `batch=<id>` partition layout, no
    * manifest) is REJECTED loudly on BOTH paths. The read path's guard
    * alone would not be enough: a writer pointed at a legacy dir commits
    * a manifest next to the legacy dirs, and from that first commit on
    * the read guard (keyed on lastBatch < 0) is bypassed — the historical
    * verdict rows would silently vanish, exactly the failure this message
    * exists to prevent.
    */
  private def requireNotLegacyLog(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (SegmentStore.readManifest(dir).lastBatch < 0L &&
        java.nio.file.Files.exists(p)) {
      val ls = java.nio.file.Files.list(p)
      val legacy = try ls.anyMatch(_.getFileName.toString.startsWith("batch="))
        finally ls.close()
      require(!legacy,
        s"$dir holds a pre-SegmentStore monitor log (batch=<id> layout); " +
          "point the monitor at a fresh dir — verdict rows are derived " +
          "observability data, the stream itself needs no migration")
    }
  }

  /** Profile one micro-batch, judge it against the baseline, and commit
    * the verdict row to the monitor log at `dir` under the
    * [[SegmentStore]] contract (redelivered batch ids are skipped; at
    * `compactBatches` live dirs the log folds into one segment, so dir
    * count — and `readLog` cost — stays bounded at any stream age).
    * A batch with no documents is skipped — zero docs has no moments to
    * judge (a delete-only CDC batch reaches a text monitor empty), and a
    * null-profile row would poison every later log read. A legacy-layout
    * `dir` is rejected BEFORE the first commit ([[requireNotLegacyLog]]).
    */
  def processBatch(docs: DataFrame, batchId: Long, dir: String,
                   baseline: DataFrame, textCol: String, z: Double,
                   compactBatches: Int = 16): Unit = {
    requireNotLegacyLog(dir)
    if (docs.limit(1).count() > 0) {
      val verdict = drift(profile(docs, textCol), baseline, z)
        .withColumn("b", lit(batchId))
      SegmentStore.processBatch(verdict, batchId, dir, "b", "b",
        opCol = None, compactSegments = compactBatches, identity)
    }
  }

  /** The monitor log: one verdict row per profiled batch with its `batch`
    * id, read through the committed manifest — at most `compactBatches` +
    * grace-window dirs are touched however old the stream is. A
    * pre-round-10 log (the `batch=<id>` partition layout, no manifest) is
    * REJECTED loudly rather than read as empty — silently vanishing
    * historical verdicts would be worse than the migration message.
    */
  def readLog(spark: SparkSession, dir: String): DataFrame = {
    requireNotLegacyLog(dir)
    SegmentStore.readSegments(spark, dir, logSchema)
      .drop("batch").withColumnRenamed("b", "batch")
      .select("batch", "n_docs", "mean_tokens", "sd_tokens",
        "mean_quality", "sd_quality", "z_tokens", "z_quality", "drift")
  }

  /** Attach content monitoring to a document stream. `baseline` is the
    * corpus profile the stream is judged against — compute it once from a
    * trusted snapshot (`profile(corpus, textCol)`) and refresh it on the
    * cadence the corpus legitimately evolves; a self-updating baseline
    * would absorb slow poisoning.
    */
  def attachMonitor(docs: DataFrame, dir: String, checkpoint: String,
                    baseline: DataFrame, textCol: String = "text",
                    z: Double = 3.0, compactBatches: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, dir, baseline, textCol, z, compactBatches)
      }
      .start()
}
