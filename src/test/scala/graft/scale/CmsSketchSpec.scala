package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Count-min sketch properties ([[Sketches.cmsBuild]]/cmsMerge/cmsLookup):
  * never undercounts, total mass conservation per depth, and exact
  * linearity of shard merges — the contract that lets per-shard sketches
  * be summed instead of re-scanning the corpus.
  */
class CmsSketchSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 4
  private val w = 256

  test("cms never undercounts and is near-exact at low load") {
    // 40 distinct values with known multiplicities 1..40 — load factor
    // 40/256 per depth, so min-over-4-depths is exact w.h.p.; the
    // guaranteed direction (n_est >= n_exact) must hold for every value.
    val rows = (1 to 40).flatMap(v => Seq.fill(v)(s"val$v")).toDF("v")
    val sketch = Sketches.cmsBuild(rows, "v", d, w)
    val items = (1 to 40).map(v => s"val$v").toDF("v")
    val est = Sketches.cmsLookup(sketch, items, "v", d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 40).foreach { v =>
      withClue(s"val$v: ") { est(s"val$v") should be >= v.toLong }
    }
    // with 40 keys in 4x256 buckets, at most a few collide — the estimate
    // total can exceed the true total only by collision inflation
    est.values.sum.toDouble should be <= (1 to 40).sum * 1.25
  }

  test("each depth row of the sketch conserves total mass") {
    val rows = (1 to 40).flatMap(v => Seq.fill(v)(s"val$v")).toDF("v")
    val perDepth = Sketches.cmsBuild(rows, "v", d, w)
      .groupBy("depth").agg(sum("cnt").as("mass"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    perDepth.keySet shouldBe (0 until d).toSet
    perDepth.values.foreach(_ shouldBe (1 to 40).sum.toLong)
  }

  test("cmsMerge of shard sketches equals the sketch of the union, exactly") {
    val a = (1 to 500).map(i => s"k${i % 37}").toDF("v")
    val b = (1 to 300).map(i => s"k${i % 53}").toDF("v")
    val merged = Sketches.cmsMerge(
      Sketches.cmsBuild(a, "v", d, w).unionByName(Sketches.cmsBuild(b, "v", d, w)))
    val direct = Sketches.cmsBuild(a.unionByName(b), "v", d, w)
    merged.exceptAll(direct).count() shouldBe 0L
    direct.exceptAll(merged).count() shouldBe 0L
  }
}
