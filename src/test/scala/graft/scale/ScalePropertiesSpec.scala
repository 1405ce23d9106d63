package graft.scale

import org.apache.spark.sql.functions.{col, flatten, transform}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Randomized properties for the round-5 operators — each checked against
  * an independent in-memory model (exact counts, the array-fold BPE form,
  * a plain Scala argmin), seeded for reproducibility.
  */
class ScalePropertiesSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, samples: Int = 10): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(samples)
      .withInitialSeed(Seed(42L))
    val result = SCTest.check(params, prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }

  test("cms: estimates never undercount on random multisets; depth mass = N") {
    val gen: Gen[List[(String, Int)]] = Gen.listOfN(25, for {
      key <- Gen.oneOf((1 to 60).map(i => s"k$i"))
      mult <- Gen.choose(1, 9)
    } yield (key, mult))
    check(Prop.forAllNoShrink(gen) { items =>
      val exact = items.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum.toLong }
      val rows = items.flatMap { case (k, m) => Seq.fill(m)(k) }.toDF("v")
      val sketch = Sketches.cmsBuild(rows, "v", 4, 64)
      val est = Sketches.cmsLookup(sketch, exact.keys.toSeq.toDF("v"), "v", 4, 64)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = items.map(_._2).sum.toLong
      val mass = sketch.groupBy("depth").agg(
        org.apache.spark.sql.functions.sum("cnt").as("m"))
        .collect().map(_.getLong(1))
      exact.forall { case (k, c) => est(k) >= c } &&
        mass.length == 4 && mass.forall(_ == n)
    })
  }

  test("bpe: string-replace segmentation == array-fold on random words + overlapping merges") {
    // merges chosen to chain and overlap: (a,a) then (aa,b) then (b,c)
    val merges = Seq("a" -> "a", "aa" -> "b", "b" -> "c")
    val gen: Gen[List[String]] = Gen.listOfN(12,
      Gen.choose(1, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString)))
    check(Prop.forAllNoShrink(gen) { words =>
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val df = docs.toDF("doc_id", "text")
      val viaString = Bpe.segment(df, "doc_id", "text", merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val viaFold = df.select(col("doc_id"),
        flatten(transform(TextOps.tokens(col("text")),
          w => Bpe.applyMerges(w, merges))).as("subwords"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      viaString == viaFold
    }, samples = 8)
  }

  test("nextFitPack: assignment equals the sequential model, incl. oversized docs") {
    val gen: Gen[List[(Long, String, Long)]] = Gen.listOfN(30, for {
      id <- Gen.choose(0L, 999L)
      grp <- Gen.oneOf("a", "b", "c")
      n <- Gen.choose(1L, 80L) // capacity 64 → some docs are oversized
    } yield (id, grp, n)).map(_.distinctBy(_._1))
    check(Prop.forAllNoShrink(gen) { rows =>
      val out = Packing.nextFitPack(rows.toDF("doc_id", "source", "n_tokens"),
        "doc_id", "n_tokens", "source", capacity = 64L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
        .toMap
      val model = rows.groupBy(_._2).flatMap { case (g, ms) =>
        var bin = 0L; var fill = 0L
        ms.sortBy(_._1).map { case (id, _, n) =>
          if (fill > 0 && fill + n > 64L) { bin += 1; fill = n } else fill += n
          (g, id) -> ((bin, fill))
        }
      }
      out == model
    })
  }

  test("resolveCanonical: winner == scala argmin by (prio, -sz, id); all ids kept") {
    val gen: Gen[List[(Long, Long, Int, Long)]] = Gen.listOfN(20, for {
      id <- Gen.choose(0L, 99L)
      root <- Gen.choose(0L, 4L)
      prio <- Gen.choose(0, 3)
      sz <- Gen.choose(1L, 50L)
    } yield (id, root, prio, sz)).map(_.distinctBy(_._1))
    check(Prop.forAllNoShrink(gen) { rows =>
      val labels = rows.map(r => (r._1, r._2)).toDF("id", "cluster_root")
      val attrs = rows.map(r => (r._1, r._3, r._4)).toDF("id", "prio", "sz")
      val out = NearDup.resolveCanonical(labels, attrs, "id", "prio", "sz")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val model = rows.groupBy(_._2).map { case (root, members) =>
        root -> members.minBy(m => (m._3, -m._4, m._1))._1
      }
      out.size == rows.size &&
        rows.forall { r => out(r._1) == ((r._2, model(r._2))) }
    })
  }
}
