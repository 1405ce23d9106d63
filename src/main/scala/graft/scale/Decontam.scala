package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination — the training-data pass that removes (or
  * flags) training documents overlapping an evaluation set, so benchmark
  * answers don't leak into the corpus. Standard method: word n-gram overlap
  * (GPT-3 used 13-grams; the n is a parameter).
  *
  * Dataflow: distinct n-grams of the eval set (bounded by eval size — eval
  * benchmarks are thousands of docs, so the distinct-gram set broadcasts),
  * then ONE pass over the train side: tokenize → shingle → explode →
  * broadcast left-join the eval grams → per-doc count. The explicit
  * repartition on the doc id both parallelizes the CPU-dense shingle math
  * (corpus files often arrive as one input split) and pre-clusters for the
  * final per-doc aggregate, which therefore reuses the exchange — the train
  * side is shuffled exactly once regardless of corpus size.
  *
  * The join key is the gram STRING, which is exact. At cluster scale you'd
  * xxhash64 the grams first (8-byte keys, ~1e-9 collision odds at benchmark
  * sizes) — same plan, smaller broadcast; string keys keep the correctness
  * gate collision-free.
  */
object Decontam {

  /** Per-train-doc overlap report against `eval`'s n-gram set:
    * (id, n_grams, n_overlap, contaminated). `n_overlap` counts DISTINCT
    * shared grams; `contaminated` flags any overlap at/above `minOverlap`.
    * Documents with fewer than n tokens have no n-grams and pass clean.
    */
  // Tokens staged as their own projection — NOT inlined into the shingle
  // lambda, where Catalyst would re-run split once per get() (n re-splits
  // per gram; measured 15 s instead of ~1 s on the sf0.1 corpus).
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val fanout = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(fanout, col(idCol))
      .withColumn("_toks", split(col(textCol), " "))
      .select(col(idCol), NearDup.shinglesFromTokens(col("_toks"), n).as("grams"))
  }

  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5, minOverlap: Int = 1): DataFrame = {
    def grams(df: DataFrame) = this.grams(df, idCol, textCol, n)

    // cache(): materialization fence — without it, the explode's implicit
    // isnotnull/size constraints are pushed into the pre-shuffle scan filter
    // with the whole shingle pipeline inlined per conjunct (the
    // NearDup.verifyPairs pathology).
    val evalGrams = grams(eval)
      .select(explode(col("grams")).as("gram")).distinct()
      .withColumn("_hit", lit(1))
      .cache()

    // explode_outer keeps sub-n-token docs (empty gram set) as a null-gram
    // row, so they emerge with n_grams = 0, n_overlap = 0 — no second pass
    // over the train side to re-attach them. A null gram never equals an
    // eval gram, so it contributes nothing to the count.
    grams(train)
      .select(col(idCol), size(col("grams")).as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(max(col("n_grams")).as("n_grams"),
        count(col("_hit")).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** [[decontaminate]] with a Bloom prefilter — the shape for eval sets whose
    * n-gram dictionary is too large to broadcast as a join hash table (a
    * multi-benchmark eval suite runs to 1e8+ distinct grams ≈ tens of GB of
    * strings, vs ~`bitsPerGram`/8 bytes per gram of Bloom bits).
    *
    * Same exact output contract as [[decontaminate]] — the Bloom filter has
    * NO false negatives, so filtering train grams through it loses no true
    * overlap, and the surviving candidates (true hits + ~0.05% false
    * positives at 16 bits/gram) are re-checked with an exact equi-join on the
    * gram string. The win at scale: the gram-keyed shuffle moves only the
    * candidate grams (≈ the contamination volume) instead of EVERY train
    * gram, and what ships to executors is a few MB of Bloom bits.
    *
    * Built on Spark's own sketch machinery ([[BloomFilterAggregate]] /
    * [[BloomFilterMightContain]] — what AQE's runtime row-group filtering
    * injects): the filter is built DISTRIBUTED (partial aggregation over the
    * eval grams, XXH64-keyed), and only the final serialized bits return to
    * the driver, which re-ships them to executors as a literal — the same
    * driver-roundtrip shape as `df.stat.bloomFilter` and broadcast hashing.
    * `might_contain` requires a constant/scalar-subquery filter side, so the
    * build is EAGER (two jobs at construction: gram count for sizing, then
    * the aggregate).
    *
    * The train side is scanned twice (per-doc gram counts; exploded
    * candidate filtering) — at corpus scale both scans prune to (id, text)
    * and the second's post-Bloom output is near-empty, which beats caching
    * 100 TB of shingle arrays.
    */
  def bloomDecontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 5, minOverlap: Int = 1,
                         bitsPerGram: Int = 16): DataFrame = {
    require(bitsPerGram >= 2 && bitsPerGram <= 64, s"bitsPerGram out of range: $bitsPerGram")
    // Distinct eval grams: reused by the Bloom build and the exact verify
    // join — cached (eval sets are benchmark-sized, not corpus-sized).
    val evalGrams = grams(eval, idCol, textCol, n)
      .select(explode(col("grams")).as("gram")).distinct().cache()
    val est = math.max(evalGrams.count(), 1L)
    // Cap below spark.sql.optimizer.runtime.bloomFilter.maxNumBits' default
    // (64 Mbit); past the cap the fpp degrades gracefully and the exact
    // verify join still guarantees the output.
    val numBits = math.min(est * bitsPerGram, 1L << 26)
    val bloomBits = evalGrams
      .agg(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("gram"))),
        Literal(est), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

    val trainGrams = grams(train, idCol, textCol, n)
    val base = trainGrams.select(col(idCol), size(col("grams")).as("n_grams"))
    // explode_outer, NOT explode: explode's implicit isnotnull/size>0
    // constraints get pushed into the scan with the whole shingle pipeline
    // inlined per conjunct (the decontaminate() pathology — measured 9.8 s
    // vs 0.4 s on the sf0.1 corpus for this one generator choice). The
    // null-gram row a sub-n-token doc produces fails might_contain (null
    // hash) and drops in the filter; the doc itself survives via `base`.
    val verified = trainGrams
      .select(col(idCol), explode_outer(col("grams")).as("gram"))
      .where(ColumnBridge.column(BloomFilterMightContain(
        Literal(bloomBits, BinaryType),
        ColumnBridge.expression(xxhash64(col("gram"))))))
      // exact verify kills the Bloom false positives; deliberately NOT a
      // broadcast — not fitting in a broadcast hash table is this variant's
      // premise (Catalyst may still pick BHJ at test scale, harmlessly).
      .join(evalGrams, Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap"))
    base.join(verified, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }
}
