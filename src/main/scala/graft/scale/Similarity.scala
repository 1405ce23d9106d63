package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`):
  *
  *  - `bruteForceTopK` — exact cosine top-k: query set × corpus with a
  *    per-query rank window. The correctness baseline; cost |Q|·|C|, so the
  *    query side must be small (or use the IVF path).
  *  - `ivfTopK` — IVF-flat: a small centroid set partitions the corpus into
  *    buckets (broadcast join, |C|·|centroids| comparisons done ONCE and
  *    reusable); queries probe only their own bucket. At 100 TB: centroids
  *    broadcast to every executor, bucket assignment is a narrow map, and the
  *    probe is an equi-join on bucket id — no all-pairs anywhere.
  *
  * All arithmetic is double (`zip_with` product + sequential `aggregate`
  * fold), rounded to 6 decimals before ranking so results are reproducible
  * across engines (ties broken by id, never by float noise).
  */
object Similarity {

  /** Sequential-fold dot product in double precision (codegen'd, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity, computed as dot / sqrt(|a|²·|b|²). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  private def asDouble(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Exact top-k neighbors for each query vector. Output: q_id, neighbor_id,
    * cos (rounded, 6 dp), ranked per query by (cos desc, neighbor_id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // repartition the streamed (query) side: the non-equi join plans as a
    // broadcast nested-loop whose parallelism is the streamed side's
    // partition count — a single input split would serialize all the math
    val q = queries.repartition(col(idCol))
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("c_vec"))
    val scored = q.join(c, col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }

  /** Assign every vector to its nearest centroid (max rounded cosine, ties →
    * smallest centroid id). Centroids are broadcast; assignment is one
    * narrow pass over the corpus.
    */
  def assignBuckets(corpus: DataFrame, centroids: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.repartition(col(idCol))
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("vec"))
    val cent = centroids.select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cent_vec"))
    c.join(broadcast(cent))
      .withColumn("ccos", round(cosine(col("vec"), col("cent_vec")), 6))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"), struct(col("ccos"), -col("centroid_id"))).as("bucket"),
        first(col("vec")).as("vec"))
  }

  /** IVF-flat probe: top-k within the query's own bucket (nprobe = 1).
    * Approximate by construction — the recall/cost trade-off is the bucket
    * count; exactness is what `bruteForceTopK` is for.
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queryIds: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assignBuckets(corpus, centroids, idCol, vecCol)
    val queries = assigned.join(queryIds.select(col(idCol).as("vec_id")), Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("bucket"), col("vec").as("q_vec"))
    val bucketed = assigned
      .select(col("vec_id").as("neighbor_id"), col("bucket"), col("vec").as("c_vec"))
    val scored = queries.join(bucketed, Seq("bucket"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "neighbor_id", "cos", "rank")
  }
}
