package graft.scale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Behavior tests for the round-4 pipeline-prep operators: sequence packing,
  * stratified sampling, text cleaning, embedding normalize/quantize. The
  * DuckDB oracle pins cross-engine value equality; these pin the operator
  * INVARIANTS (span contiguity, rate semantics, idempotence, reconstruction
  * error) on hand-built edge inputs.
  */
class PipelinePrepSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packChunks: spans tile each group contiguously and chunk math is exact") {
    // group g1: 60+100+130 tokens at C=128 → doc 20 straddles the boundary
    val docs = Seq(
      (1L, "g1", 60L), (2L, "g1", 100L), (3L, "g1", 130L),
      (10L, "g2", 128L), (11L, "g2", 1L),
      (20L, "g3", 0L) // zero-width: excluded
    ).toDF("doc_id", "grp", "n_tokens")
    val packed = Packing.packChunks(docs, "doc_id", "n_tokens", "grp", 128)
      .orderBy("doc_id").collect()

    packed.map(_.getLong(0)) shouldBe Array(1L, 2L, 10L, 11L, 3L)
      .sorted // zero-width doc 20 dropped
    val byId = packed.map(r => r.getLong(0) ->
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // (tok_end, tok_start, first_chunk, last_chunk, n_chunks)
    byId(1L) shouldBe (60L, 0L, 0L, 0L, 1L)
    byId(2L) shouldBe (160L, 60L, 0L, 1L, 2L) // straddles chunk 0→1
    byId(3L) shouldBe (290L, 160L, 1L, 2L, 2L)
    byId(10L) shouldBe (128L, 0L, 0L, 0L, 1L) // exactly one full chunk
    byId(11L) shouldBe (129L, 128L, 1L, 1L, 1L) // starts the next chunk

    // invariant: within a group, spans tile with no gap/overlap
    byId(2L)._2 shouldBe byId(1L)._1
    byId(3L)._2 shouldBe byId(2L)._1
  }

  test("packChunks property: random corpora tile exactly, any context length") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val contextLen = 1 + rnd.nextInt(300)
      val rows = (0 until 200).map { i =>
        (i.toLong, s"g${rnd.nextInt(7)}", rnd.nextInt(400).toLong) // some zero-width
      }
      val packed = Packing.packChunks(rows.toDF("doc_id", "grp", "n_tokens"),
        "doc_id", "n_tokens", "grp", contextLen)
        .select("doc_id", "grp", "n_tokens", "tok_start", "tok_end",
          "first_chunk", "last_chunk", "n_chunks")
        .as[(Long, String, Long, Long, Long, Long, Long, Long)]
        .collect()

      withClue(s"trial $trial contextLen $contextLen: ") {
        packed.length shouldBe rows.count(_._3 > 0)
        packed.groupBy(_._2).values.foreach { group =>
          val sorted = group.sortBy(_._1)
          // spans tile the group's stream: start at 0, no gaps, no overlap
          sorted.head._4 shouldBe 0L
          sorted.sliding(2).foreach {
            case Array(a, b) => b._4 shouldBe a._5
            case _ =>
          }
          // chunk math is a pure function of the span
          sorted.foreach { case (_, _, n, start, end, first, last, nc) =>
            end - start shouldBe n
            first shouldBe start / contextLen
            last shouldBe (end - 1) / contextLen
            nc shouldBe last - first + 1
          }
        }
      }
    }
  }

  test("nextFitPack: docs stay whole, bins respect capacity, oversize is alone") {
    val docs = Seq(
      (1L, "g1", 100L), (2L, "g1", 100L), (3L, "g1", 60L), // 200+60 > 256 → doc 3 opens bin 1
      (4L, "g1", 50L),                                     // 60+50 fits bin 1
      (10L, "g2", 300L),                                   // oversize: bin alone
      (11L, "g2", 10L),
      (20L, "g3", 0L)                                      // zero-width: excluded
    ).toDF("doc_id", "grp", "n_tokens")
    val out = Packing.nextFitPack(docs, "doc_id", "n_tokens", "grp", 256L)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap

    out.keySet shouldBe Set(1L, 2L, 3L, 4L, 10L, 11L)
    out(1L) shouldBe (0L, 100L)
    out(2L) shouldBe (0L, 200L)
    out(3L) shouldBe (1L, 60L)
    out(4L) shouldBe (1L, 110L)
    out(10L) shouldBe (0L, 300L) // oversize occupies bin 0 alone
    out(11L) shouldBe (1L, 10L)  // next doc overflows → new bin
  }

  test("nextFitPack property: random groups — bins contiguous, fill ≤ cap unless singleton") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 400L).map(i =>
      (i, s"g${i % 7}", 1L + rnd.nextInt(120).toLong)).toDF("doc_id", "grp", "n_tokens")
    val cap = 256L
    val out = Packing.nextFitPack(docs, "doc_id", "n_tokens", "grp", cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // bin ids start at 0 and never skip
      sorted.map(_._4).distinct shouldBe (0L to sorted.map(_._4).max)
      // replaying the fold gives identical assignments; fills stay ≤ cap
      var bin = 0L; var fill = 0L
      sorted.foreach { case (_, _, n, b) =>
        if (fill > 0 && fill + n > cap) { bin += 1; fill = n } else fill += n
        b shouldBe bin
        fill should be <= cap // every n ≤ 121 < cap, so no oversize bins here
      }
    }
  }

  test("stratifiedHashSample: rate 100 keeps all, rate 0 keeps none, assignment is stable") {
    val rows = (0L until 400L).map(i => (i, if (i % 4 == 0) "rare" else "common"))
      .toDF("id", "stratum")
    val kept = Sampling.stratifiedHashSample(rows, "id", "stratum",
      Seq("rare" -> 100, "common" -> 0), defaultPct = 50)
    val byStratum = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    byStratum.getOrElse("rare", 0L) shouldBe 100L
    byStratum.getOrElse("common", 0L) shouldBe 0L

    // default rate applies to unlisted strata, roughly proportionally
    val other = Sampling.stratifiedHashSample(rows, "id", "stratum",
      Seq("nonexistent" -> 0), defaultPct = 50).count()
    other.toDouble should (be > 400 * 0.35 and be < 400 * 0.65)

    // determinism: same input → identical kept set (no RNG anywhere)
    val again = Sampling.stratifiedHashSample(rows, "id", "stratum",
      Seq("rare" -> 100, "common" -> 0), defaultPct = 50)
    again.select("id").as[Long].collect().sorted shouldBe
      kept.select("id").as[Long].collect().sorted
  }

  test("cleanText: normalizes noise and is idempotent") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! 42\tx  "),
      (2L, "already clean text"),
      (3L, "!!!"), // nothing survives
      (4L, "")
    ).toDF("id", "text")
    val cleaned = TextOps.cleanText(df, "text").orderBy("id")
      .select("clean").as[String].collect()
    cleaned shouldBe Array("hello world 42 x", "already clean text", "", "")

    // idempotence: cleaning the cleaned column changes nothing
    val once = TextOps.cleanText(df, "text", "c1")
    val twice = TextOps.cleanText(once.select(col("id"), col("c1").as("text")), "text", "c2")
    twice.filter(col("c2") =!= col("text")).count() shouldBe 0L
  }

  test("quantization reconstructs within half a step; unit vectors have norm 1") {
    val vecs = Seq(
      (1L, Array(3.0, -4.0, 0.0)),
      (2L, Array(0.0, 0.0, 0.0)), // zero vector: no direction, scale 0
      (3L, Array(1e-3, -2e-3, 5e-4))
    ).toDF("id", "v")
    val unit = Embeddings.withL2Normalized(vecs, "v")
    val normed = unit.select(col("id"), col("norm"),
      sqrt(graft.functions.VectorFunctions.vecDot(col("unit"), col("unit"))).as("ulen"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    normed(1L)._1 shouldBe 5.0 +- 1e-12
    normed(1L)._2 shouldBe 1.0 +- 1e-12
    normed(3L)._2 shouldBe 1.0 +- 1e-12
    normed(2L)._1 shouldBe 0.0 // zero vector: norm 0, stays zero
    normed(2L)._2 shouldBe 0.0

    val quant = Embeddings.withInt8Quantized(unit, "unit")
      .select(col("id"), col("unit"), col("q"), col("scale"))
      .as[(Long, Seq[Double], Seq[Int], Double)].collect()
    quant.foreach { case (id, u, q, scale) =>
      all(q.map(math.abs)) should be <= 127
      if (id == 2L) {
        scale shouldBe 0.0
        all(q) shouldBe 0
      } else {
        // reconstruction error bound of round-half-up: |x - q·scale| ≤ scale/2
        u.zip(q).foreach { case (x, qi) =>
          math.abs(x - qi * scale) should be <= scale / 2 + 1e-12
        }
        // the max-magnitude element hits ±127 exactly
        q.map(math.abs).max shouldBe 127
      }
    }
  }
}
