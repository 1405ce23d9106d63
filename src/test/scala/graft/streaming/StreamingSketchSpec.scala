package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}
import graft.scale.{Sketches, TextOps}

/** The streamed sketch state must be BIT-IDENTICAL to a batch build over
  * everything seen — both sketches are deterministic functions of the
  * input multiset over the portable md5 hash, so this is exact equality,
  * not approximate agreement. Plus: redelivery is a no-op fold, and the
  * version chain prunes to {current, previous}.
  */
class StreamingSketchSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"
  private val cfg = StreamingSketch.Config(kmvK = 32, cmsDepth = 3, cmsWidth = 64)

  test("streamed fold ≡ batch-built sketches, exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val dir = Files.createTempDirectory("graft-sketch").toString

    // three arbitrary slices, streamed in
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 3 === 0), 0L, dir, cfg)
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L, dir, cfg)
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 3 === 2), 2L, dir, cfg)

    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    val batchKmv = Sketches.kmvDistinct(toks, Nil, "token", cfg.kmvK)
      .select("kmv", "n_est").as[(Seq[Long], Long)].head()
    val streamedKmv = StreamingSketch.readKmv(spark, dir, cfg)
      .select("kmv", "n_est").as[(Seq[Long], Long)].head()
    streamedKmv shouldBe batchKmv

    val batchCms = Sketches.cmsBuild(toks, "token", cfg.cmsDepth, cfg.cmsWidth)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamedCms = StreamingSketch.readCms(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    streamedCms shouldBe batchCms

    // frequency probe answers from the state alone and never undercounts
    val trueFreq = toks.groupBy("token").count()
    val est = StreamingSketch.tokenFrequency(spark, dir,
      trueFreq.select("token"), "token", cfg)
    est.join(trueFreq, Seq("token"))
      .filter(col("n_est") < col("count")).count() shouldBe 0L

    // redelivery: folding batch 2 again must change nothing (it would
    // double-count CMS if it weren't skipped)
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 3 === 2), 2L, dir, cfg)
    StreamingSketch.readCms(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap shouldBe batchCms

    // version chain pruned to {current, previous}
    val vs = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .map(p => p.substring(p.lastIndexOf('/') + 1)).filter(_.startsWith("v")).sorted
    vs.toSeq shouldBe Seq("v1", "v2")
  }

  test("per-group config: one independent sketch per source, streamed ≡ batch") {
    val gcfg = StreamingSketch.Config(kmvK = 16, cmsDepth = 3, cmsWidth = 64,
      groupCols = Seq("source"))
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
    val dir = Files.createTempDirectory("graft-sketch-grp").toString
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 2 === 0), 0L, dir, gcfg)
    StreamingSketch.processBatch(docs.filter(col("doc_id") % 2 === 1), 1L, dir, gcfg)

    val toks = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val batchKmv = Sketches.kmvDistinct(toks, Seq("source"), "token", gcfg.kmvK)
      .select("source", "kmv").as[(String, Seq[Long])].collect().toMap
    val streamedKmv = StreamingSketch.readKmv(spark, dir, gcfg)
      .select("source", "kmv").as[(String, Seq[Long])].collect().toMap
    streamedKmv shouldBe batchKmv
    streamedKmv.size should be > 1 // genuinely per-group

    // per-group CMS: a token hot in one source must not inflate another
    // source's estimate (independent sketches, not one global table)
    val batchCms = Sketches.cmsBuild(toks, "token", gcfg.cmsDepth, gcfg.cmsWidth,
      Seq("source"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    StreamingSketch.readCms(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap shouldBe batchCms
    val perSrc = StreamingSketch.tokenFrequency(spark, dir,
      toks.select("source", "token").distinct(), "token", gcfg)
    perSrc.columns.toSet shouldBe Set("source", "token", "n_est")
    // estimates never undercount within their own group
    perSrc.join(toks.groupBy("source", "token").count(), Seq("source", "token"))
      .filter(col("n_est") < col("count")).count() shouldBe 0L
  }
}
