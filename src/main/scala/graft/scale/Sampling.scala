package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Splits are HASH-based, not random: a row's assignment is a pure function
  * of its id, so the split is (a) reproducible across runs, engines, and
  * cluster layouts, (b) stable under re-partitioning and incremental
  * appends (new rows never move old rows between splits), and (c) joinable
  * — two tables split on the same key land on the same side. That is the
  * property `df.randomSplit` (seeded per-partition RNG) does NOT give you
  * at scale: its assignment changes with partitioning.
  *
  * The hash is the md5-derived 60-bit value used across this repo for
  * engine-reproducible fingerprints — any system (or SQL oracle) can
  * recompute the exact assignment.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the row id ([[Hashing.md5Long60]],
    * portable). NULL id → NULL bucket.
    */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(Hashing.md5Long60(id.cast(StringType)), lit(buckets.toLong))

  /** Train/validation/test assignment by cumulative percentage. E.g.
    * `splits = Seq("train" -> 80, "valid" -> 10, "test" -> 10)`.
    * The bucket is computed ONCE and the CASE branches on the column (same
    * shape as the SQL oracle); pass `bucketOut` to also keep it.
    *
    * NULL-id policy: a NULL id hashes to a NULL bucket → NULL split (the
    * row belongs to no split) — enforce non-null keys upstream if the
    * splits must partition the table. [[hashSample]] likewise drops
    * NULL-id rows (a NULL bucket fails the filter).
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)] = Seq("train" -> 80, "valid" -> 10, "test" -> 10),
                out: String = "split", bucketOut: Option[String] = None): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val bucketCol = bucketOut.getOrElse("_bucket")
    val bucket = col(bucketCol)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assignment = splits.zip(cum).tail.foldLeft(
      when(bucket < cum.head, splits.head._1)) {
      case (acc, ((name, _), hi)) => acc.when(bucket < hi, name)
    }.otherwise(lit(null).cast(StringType))
    val result = df.withColumn(bucketCol, hashBucket(col(idCol)))
      .withColumn(out, assignment)
    if (bucketOut.isEmpty) result.drop(bucketCol) else result
  }

  /** Deterministic p-percent sample: the rows whose bucket falls below p.
    * Append-stable — a row's membership never changes as the table grows.
    */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Stratified deterministic sample: per-stratum keep rates (percent),
    * e.g. downsample the dominant language while keeping rare ones whole —
    * the standard rebalancing pass over a crawl corpus. Same hash-bucket
    * mechanics as [[hashSample]] (reproducible, append-stable, engine-
    * portable), with the rate chosen per stratum; strata not in `rates` use
    * `defaultPct`. Keeps `bucket` and `rate_pct` columns for auditability.
    * Per-row filter — no shuffle; the 100 TB plan is the same plan.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           rates: Seq[(String, Int)], defaultPct: Int): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    require((defaultPct +: rates.map(_._2)).forall(p => p >= 0 && p <= 100),
      "rates are percentages in [0, 100]")
    val rate = rates.tail.foldLeft(
      when(col(strataCol) === rates.head._1, rates.head._2)) {
      case (acc, (stratum, pct)) => acc.when(col(strataCol) === stratum, pct)
    }.otherwise(lit(defaultPct))
    df.withColumn("bucket", hashBucket(col(idCol)))
      .withColumn("rate_pct", rate)
      .filter(col("bucket") < col("rate_pct"))
  }

  /** Per-row-WEIGHTED deterministic sample — the sampling consumer of
    * [[NearDup.softDedupWeights]]: keep a row with probability
    * `weightCol` ∈ [0,1] via the hash-threshold rule
    * `md5bucket(id) mod resolution < weight·resolution`. Same md5-derived
    * mechanics as [[hashSample]] (reproducible, append-stable, engine-
    * portable), but the rate comes from a COLUMN instead of a constant —
    * per-row filter, no shuffle. With weights 1/cluster_size the expected
    * kept mass per duplicate cluster is one document: hard dedup in
    * expectation while every member keeps a nonzero chance to represent
    * its cluster. weight ≥ 1 always keeps; weight ≤ 0 or NULL never.
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
                         resolution: Long = 1000000L): DataFrame = {
    require(resolution > 0, s"resolution must be positive, got $resolution")
    df.filter(
      pmod(Hashing.md5Long60(col(idCol).cast(StringType)), lit(resolution)) <
        col(weightCol) * resolution)
  }

  /** Token-budget mixture sampling — the domain-rebalancing pass of a
    * training run: given per-source mixture WEIGHTS and a total token
    * budget, allocate `budget · wₛ / Σw` tokens to source s and keep each
    * source's documents at the acceptance rate that hits its allocation
    * (capped at keep-everything for under-represented sources; real runs
    * epoch small domains instead of upsampling rows).
    *
    * All arithmetic is integer (permille rates, integral division), so the
    * sample is exactly reproducible by any engine; acceptance reuses the
    * append-stable hash bucket. The intermediate products run in
    * DECIMAL(38,0) — `budget · w · 1000` exceeds 2^63 as soon as the corpus
    * is grand-token scale and the caller's relative weights are large, and
    * in non-ANSI mode a BIGINT product would wrap silently into negative
    * permille rates that drop whole sources; 38 digits cover every
    * realistic (budget, weight) pair and overflow beyond that yields NULL
    * (row filtered out, never a wrapped rate). The rate table is one row
    * per source —
    * broadcast back onto the corpus; the corpus itself is touched by one
    * aggregate (map-side combined) and one per-row filter. No corpus
    * shuffle.
    *
    * @param weights    (strataCol, "w": LONG) — relative mixture weights.
    *   EXPLICIT allowlist: sources absent from `weights` are excluded from
    *   the sample entirely (inner join ≡ weight 0) — list every source you
    *   want kept.
    * @param budgetNum/budgetDen budget = total_tokens · num / den
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    nTokensCol: String, weights: DataFrame,
                    budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction must be >= 0")
    val totals = df.groupBy(strataCol).agg(sum(col(nTokensCol)).as("toks"))
    val sumW = weights.agg(sum(col("w")).as("sum_w"))
    val grand = df.agg(sum(col(nTokensCol)).as("grand"))
    val rates = totals.join(weights, Seq(strataCol))
      .crossJoin(sumW).crossJoin(grand)
      .withColumn("budget",
        expr(s"cast(grand as decimal(38,0)) * ${budgetNum}L div ${budgetDen}L"))
      .withColumn("p_permille",
        least(lit(1000L), expr(
          "cast(budget as decimal(38,0)) * w * 1000 div (cast(sum_w as decimal(38,0)) * toks)")))
      .select(col(strataCol), col("w"), col("p_permille"))
    df.join(broadcast(rates), Seq(strataCol))
      .withColumn("bucket_pm", hashBucket(col(idCol), 1000))
      .filter(col("bucket_pm") < col("p_permille"))
  }

  /** Deterministic sharded epoch shuffle — the training-order operator: a
    * pretraining run wants a DIFFERENT pseudorandom document permutation
    * each epoch, reproducible under retries and resumable mid-epoch. The
    * permutation is (shard, pos): shard = portable hash of (epoch, id)
    * modulo `nShards` (each shard ≈ one output file a reader consumes
    * sequentially), pos = rank of that hash within the shard. Changing
    * `epoch` re-keys every hash, producing an unrelated permutation from
    * the same corpus — no stored state, no RNG.
    *
    * Scale: ONE hash-partitioned window per shard (parallelism = nShards;
    * no global sort). The per-shard sort is the shuffle's external sort,
    * so shard size is bounded by disk, not memory; size nShards to the
    * reader fleet, not the corpus.
    *
    * Output: input columns + shard (0-based) + pos (1-based within shard,
    * ordered by (hash, id) — the id tiebreak makes the order total even
    * in the measure-zero case of colliding 60-bit hashes).
    *
    * NULL-id rows are dropped (package NULL policy, like [[hashSample]]):
    * concat_ws would otherwise collapse every NULL id onto one hash and
    * the id tiebreak would no longer be total.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val hv = Hashing.md5Long60(
      concat_ws("\u0001", lit(epoch).cast(StringType), col(idCol).cast(StringType)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_hv"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("_hv", hv)
      .withColumn("shard", pmod(col("_hv"), lit(nShards.toLong)).cast(IntegerType))
      .withColumn("pos", row_number().over(w))
      .drop("_hv")
  }

  /** Per-domain document cap — the anti-domination rule web-scale corpora
    * apply so no single source (domain/site/dump) floods the mixture: rank
    * each domain's docs by the caller's preference order (id appended as
    * the deterministic final tiebreak) and keep the first `cap`. Returns
    * every input row with (domain_rank, kept) so the caller can audit what
    * the cap removed, not just the survivors.
    *
    * One shuffle: a window keyed by the domain. Heavy-hitter domains make
    * that window's partition large, but row_number is a streaming frame
    * (no buffering) — the same skew profile as any per-key top-N;
    * salt-and-merge ([[graft.ops.Skew]]) applies if one domain is a
    * double-digit fraction of the corpus.
    */
  def domainCap(df: DataFrame, idCol: String, domainCol: String, cap: Int,
                rankBy: Seq[Column] = Seq.empty): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(rankBy :+ col(idCol).asc: _*)
    df.withColumn("domain_rank", row_number().over(w))
      .withColumn("kept", col("domain_rank") <= cap)
  }
}
