package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 5, minOverlap: Int = 1): DataFrame = {
    val fanout = train.sparkSession.sessionState.conf.numShufflePartitions
    // Tokens staged as their own projection — NOT inlined into the shingle
    // lambda, where Catalyst would re-run split once per get() (n re-splits
    // per gram; measured 15 s instead of ~1 s on the sf0.1 corpus).
    def grams(df: DataFrame) = df.repartition(fanout, col(idCol))
      .withColumn("_toks", split(col(textCol), " "))
      .select(col(idCol), NearDup.shinglesFromTokens(col("_toks"), n).as("grams"))

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
}
