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
  * then a broadcast join against each train doc's distinct n-grams, counting
  * matches per doc. Zero shuffles of the 100 TB train side: tokenize, join
  * against the broadcast, and aggregate by doc id arrive map-side because the
  * gram explode preserves the scan's partitioning — the per-doc count is a
  * partial aggregate over rows that never left their partition.
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
    def grams(df: DataFrame) = df.select(col(idCol),
      NearDup.shinglesFromTokens(split(col(textCol), " "), n).as("grams"))

    val evalGrams = grams(eval)
      .select(explode(col("grams")).as("gram")).distinct()

    val trainGrams = grams(train).cache() // feeds the overlap join AND the per-doc gram counts
    val overlap = trainGrams
      .select(col(idCol), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))

    trainGrams.select(col(idCol), size(col("grams")).as("n_grams"))
      .join(overlap, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }
}
