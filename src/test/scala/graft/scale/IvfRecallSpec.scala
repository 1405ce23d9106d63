package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Recall harness for the IVF probe family: measures recall@k of the
  * approximate searches against [[Similarity.bruteForceTopK]] ground truth
  * on the deterministic sf0.001 embeddings, and pins (a) nprobe=1 ≡ the
  * single-bucket `ivfTopK`, (b) recall is monotone in nprobe, (c) a fixed
  * floor for the shipped nprobe=2 setting (deterministic data → exact
  * threshold is safe), (d) nprobe = |centroids| recovers exact search.
  */
class IvfRecallSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val K = 3

  private lazy val e = Tables.embeddings(spark, sf)
  private lazy val centroids = e.filter(col("vec_id") % 10 === 3)
  private lazy val queries = e.filter(col("label") === 0)

  /** Mean per-query recall@K of `ann` against the exact top-K. */
  private def recallAtK(ann: DataFrame, exact: DataFrame): Double = {
    val hits = exact.select("q_id", "neighbor_id")
      .join(ann.select("q_id", "neighbor_id"), Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    val perQuery = exact.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select(coalesce(col("n_hit"), lit(0L)).cast("double") / K)
    perQuery.agg(avg(perQuery.columns.head)).collect()(0).getDouble(0)
  }

  test("the indexed probe over a prebuilt assignment equals the inline probe") {
    // same queries, sourced as external vectors instead of corpus ids —
    // the persisted-artifact path must route and rank identically
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val index = Similarity.assignBuckets(e, centroids)
    for (np <- Seq(1, 2)) {
      val inline = key(Similarity.ivfTopKProbe(e, centroids, queries, K, nprobe = np))
      val indexed = key(Similarity.ivfTopKIndexed(index, centroids,
        queries.select("vec_id", "embedding"), K, nprobe = np))
      withClue(s"nprobe=$np: ") { indexed shouldBe inline }
    }
  }

  test("nprobe=1 is exactly the single-bucket ivfTopK") {
    val a = Similarity.ivfTopK(e, centroids, queries, K)
    val b = Similarity.ivfTopKProbe(e, centroids, queries, K, nprobe = 1)
    a.exceptAll(b).isEmpty shouldBe true
    b.exceptAll(a).isEmpty shouldBe true
    a.count() should be > 0L
  }

  test("recall@3 grows with nprobe and clears the floor; full probe is exact") {
    val exact = Similarity.bruteForceTopK(e, queries, K).cache()
    val r1 = recallAtK(Similarity.ivfTopKProbe(e, centroids, queries, K, 1), exact)
    val r2 = recallAtK(Similarity.ivfTopKProbe(e, centroids, queries, K, 2), exact)
    val r4 = recallAtK(Similarity.ivfTopKProbe(e, centroids, queries, K, 4), exact)
    info(f"recall@3: nprobe=1 $r1%.4f, nprobe=2 $r2%.4f, nprobe=4 $r4%.4f")

    r2 should be >= r1
    r4 should be >= r2
    // Floor for the shipped nprobe=2 configuration. Measured on this
    // deterministic corpus: 0.2024 / 0.2857 / 0.4226 for nprobe 1/2/4 —
    // absolute recall is LOW BY CONSTRUCTION here (centroids are 10% of
    // the corpus, so a bucket holds ~10 vectors out of 1000; the global
    // top-3 usually lives elsewhere). The harness's job is the recall
    // MEASUREMENT and its monotone growth with nprobe, with this floor
    // pinning against silent probe-selection regressions.
    r2 should be >= 0.28

    // probing EVERY bucket is a full scan — recall must be exactly 1
    val nCent = centroids.count().toInt
    val rAll = recallAtK(Similarity.ivfTopKProbe(e, centroids, queries, K, nCent), exact)
    rAll shouldBe 1.0 +- 1e-12
  }
}
