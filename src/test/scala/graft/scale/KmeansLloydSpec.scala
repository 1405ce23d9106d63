package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Pins the full Lloyd's loop ([[Similarity.kmeansIterate]]) on the
  * deterministic sf0.001 embeddings: convergence under the stopping rule,
  * determinism (same inputs → identical trained centroids), the
  * empty-cluster rule (K preserved), and that training IMPROVES the index —
  * mean assignment similarity over the corpus is at least the seed
  * centroids', and IVF recall through the trained centroids does not
  * degrade.
  */
class KmeansLloydSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val seeds = e.filter(col("vec_id") % 10 === 3)

  /** Mean (rounded) cosine of every corpus vector to its assigned centroid
    * — the objective Lloyd's ascends under cosine assignment.
    */
  private def objective(centroids: org.apache.spark.sql.DataFrame): Double = {
    val assigned = Similarity.assignBuckets(e, centroids, "vec_id", "embedding")
    val cent = centroids.select(col("vec_id").cast("long").as("bucket"),
      col("embedding").cast("array<double>").as("cvec"))
    assigned.join(cent, Seq("bucket"))
      .select(Similarity.cosine(col("vec"), col("cvec")).as("c"))
      .agg(avg("c")).collect()(0).getDouble(0)
  }

  test("Lloyd's loop converges deterministically and preserves K") {
    val trained = Similarity.kmeansIterate(e, seeds, maxIters = 25, tol = 1e-6)
      .cache()
    val k = seeds.count()
    trained.count() shouldBe k // empty-cluster rule preserves K

    val iters = trained.select("iters").head().getInt(0)
    val moved = trained.select("moved").head().getDouble(0)
    info(f"converged after $iters iters, final max movement $moved%.2e")
    // the stopping rule actually fired (not the iteration cap)
    assert(moved <= 1e-6 || iters == 25)
    moved should be < 0.5 // and movement genuinely collapsed

    // determinism: the whole loop is rounded arithmetic + id tie-breaks
    val again = Similarity.kmeansIterate(e, seeds, maxIters = 25, tol = 1e-6)
    trained.select("centroid_id", "embedding")
      .exceptAll(again.select("centroid_id", "embedding")).isEmpty shouldBe true
    trained.unpersist()
  }

  test("training improves the assignment objective and IVF recall does not degrade") {
    val trained = Similarity.kmeansIterate(e, seeds, maxIters = 25, tol = 1e-6)
      .select(col("centroid_id").as("vec_id"), col("embedding"))
      .cache()
    val objSeed = objective(seeds.select("vec_id", "embedding"))
    val objTrained = objective(trained)
    info(f"mean assignment cosine: seeds $objSeed%.4f → trained $objTrained%.4f")
    objTrained should be >= objSeed

    // recall@3 through the trained index vs the seed index (nprobe=2, the
    // shipped setting) — training must not lose recall
    val queries = e.filter(col("label") === 0)
    val K = 3
    val exact = Similarity.bruteForceTopK(e, queries, K).cache()
    def recall(cent: org.apache.spark.sql.DataFrame): Double = {
      val ann = Similarity.ivfTopKProbe(e, cent, queries, K, nprobe = 2)
      val hits = exact.select("q_id", "neighbor_id")
        .join(ann.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      val perQuery = exact.select("q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .select(coalesce(col("n_hit"), lit(0L)).cast("double") / K)
      perQuery.agg(avg(perQuery.columns.head)).collect()(0).getDouble(0)
    }
    val rSeed = recall(seeds.select("vec_id", "embedding"))
    val rTrained = recall(trained)
    info(f"IVF recall@3 nprobe=2: seeds $rSeed%.4f → trained $rTrained%.4f")
    rTrained should be >= rSeed - 0.02 // no degradation beyond tie noise
    exact.unpersist(); trained.unpersist()
  }
}
