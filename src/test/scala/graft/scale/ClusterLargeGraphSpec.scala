package graft.scale

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Property test for the large-star/small-star connected components
  * ([[NearDup.clusterPairsLargeGraph]]): on random graphs the labels must
  * equal ground-truth components (union-find), and on the adversarial
  * long-chain shape it must converge in O(log n) contractions where
  * min-label propagation would need diameter rounds.
  */
class ClusterLargeGraphSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ground truth: plain union-find over the edge list. */
  private def components(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def run(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = (0L until n.toLong).toDF("id")
    val pairs =
      if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a_id", "b_id")
      else edges.toDF("a_id", "b_id")
    NearDup.clusterPairsLargeGraph(ids, pairs)
      .select("id", "cluster_root").as[(Long, Long)].collect().toMap
  }

  test("labels equal union-find components on random graphs (scalacheck)") {
    val graphGen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(1, 40)
      nEdges <- Gen.choose(0, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong)) // self-loops and duplicates included on purpose
    } yield (n, edges)

    val prop = Prop.forAllNoShrink(graphGen) { case (n, edges) =>
      run(n, edges) == components(n, edges)
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(Seed(42L))
    val result = SCTest.check(params, prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  test("adversarial chain: 200-node path collapses to one component in O(log n) rounds") {
    val n = 200
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    // maxRounds 12 ≈ log-round budget — diameter-bound propagation (199
    // rounds) cannot finish in this many; contraction must
    val out = NearDup.clusterPairsLargeGraph(
      (0L until n.toLong).toDF("id"), chain.toDF("a_id", "b_id"), maxRounds = 12)
      .select("id", "cluster_root").as[(Long, Long)].collect()
    out.length shouldBe n
    all(out.map(_._2)) shouldBe 0L
    out.count(p => p._1 == p._2) shouldBe 1 // exactly one canonical
  }

  test("output contract matches clusterPairs on a clique + chain + singleton mix") {
    val ids = (0L to 10L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (0L, 2L), // clique 0-1-2
      (4L, 5L), (5L, 6L), (6L, 7L),               // chain 4-5-6-7
      (9L, 10L)).toDF("a_id", "b_id")             // pair; 3 and 8 singletons
    val a = NearDup.clusterPairs(ids, pairs)
      .select("id", "cluster_root", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    val b = NearDup.clusterPairsLargeGraph(ids, pairs)
      .select("id", "cluster_root", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    b shouldBe a
  }
}
