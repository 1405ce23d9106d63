package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Behavior tests for the scale operators that the DuckDB oracle can't
  * grade: the multimodal batch-decode seam and IVF recall vs brute force.
  */
class ScaleSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("multimodal decodeFrames: partition-batched stub decode with real schema") {
    val docs = Tables.documents(spark, sf).limit(20)
    val frames = docs
      .select(col("doc_id"),
        posexplode(Multimodal.sampleFrames(encode(col("text"), "UTF-8"), 32, 64)))
      .as[(Long, Int, Array[Byte])]

    val decoded = Multimodal.decodeFrames(frames).collect()
    decoded.length shouldBe frames.count()
    // stub decoder is deterministic byte statistics
    all(decoded.map(_.width)) shouldBe 32
    all(decoded.map(_.mean_byte)) should (be >= 32.0 and be <= 127.0) // printable ascii
    // schema survives the seam (typed Dataset out)
    decoded.map(f => (f.doc_id, f.frame_no)).distinct.length shouldBe decoded.length
  }

  test("BMP codec: encode → decode round-trips dimensions and exact channel means") {
    // 3x2 image with hand-computed channel sums; width 3 forces row padding
    // (9 pixel bytes → 12-byte rows), the layout detail a naive reader gets
    // wrong. Pixels (x,y): r = 10x + y, g = 100 + x, b = 250 - 10y.
    val bytes = Multimodal.encodeBmp(3, 2, (x, y) => (10 * x + y, 100 + x, 250 - 10 * y))
    val f = Multimodal.decodeBmp(7L, 0, bytes)
    f.doc_id shouldBe 7L
    f.width shouldBe 3
    f.height shouldBe 2
    // r: {0,10,20, 1,11,21} → 63/6; g: {100,101,102}×2 → 606/6; b: {250×3, 240×3}
    f.mean_r shouldBe 63.0 / 6 +- 1e-12
    f.mean_g shouldBe 606.0 / 6 +- 1e-12
    f.mean_b shouldBe (750.0 + 720.0) / 6 +- 1e-12

    // the distributed seam with the real codec
    val frames = Seq((1L, 0), (2L, 0), (10L, 1)).toDS()
      .map { case (id, no) => (id, no, Multimodal.syntheticBmp(id)) }
    val out = Multimodal.decodeImages(frames).collect().sortBy(_.doc_id)
    out.map(f => (f.doc_id, f.width, f.height)).toSeq shouldBe
      Seq((1L, 5, 4), (2L, 6, 5), (10L, 4, 5))

    // malformed payloads fail loudly, not as garbage statistics
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeBmp(0L, 0, Array[Byte](1, 2, 3))
  }

  test("WAV codec: encode → decode round-trips format and exact amplitude stats") {
    // stereo, 3 frames: samples {100,-100, 200,-200, 300,-300}
    val bytes = Multimodal.encodeWavPcm16(16000, 2,
      Array[Short](100, -100, 200, -200, 300, -300))
    val f = Multimodal.decodeWavPcm16(9L, 0, bytes)
    f.doc_id shouldBe 9L
    f.sample_rate shouldBe 16000
    f.channels shouldBe 2
    f.n_samples shouldBe 6L
    f.mean_abs shouldBe 200.0 +- 1e-12
    f.rms shouldBe math.sqrt((2.0 * (100 * 100 + 200 * 200 + 300 * 300)) / 6) +- 1e-12

    // chunk walk: an unknown chunk between fmt and data is skipped per RIFF
    val withJunk = {
      val base = Multimodal.encodeWavPcm16(8000, 1, Array[Short](5, -5))
      val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0) // padded
      // splice between the fmt chunk (ends at 36) and the data chunk
      val out = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
      // fix the RIFF size field
      val total = out.length - 8
      (0 until 4).foreach(i => out(4 + i) = ((total >> (8 * i)) & 0xff).toByte)
      out
    }
    val g = Multimodal.decodeWavPcm16(1L, 0, withJunk)
    g.n_samples shouldBe 2L
    g.mean_abs shouldBe 5.0 +- 1e-12

    // the distributed seam with the real codec
    val frames = Seq((1L, 0), (2L, 0), (10L, 1)).toDS()
      .map { case (id, no) => (id, no, Multimodal.syntheticWav(id)) }
    val out = Multimodal.decodeAudio(frames).collect().sortBy(_.doc_id)
    out.map(f => (f.doc_id, f.sample_rate, f.channels, f.n_samples)).toSeq shouldBe
      Seq((1L, 12000, 2, 34L), (2L, 16000, 1, 18L), (10L, 16000, 1, 26L))

    // malformed payloads fail loudly
    an[IllegalArgumentException] should be thrownBy
      Multimodal.decodeWavPcm16(0L, 0, Array[Byte](1, 2, 3))
  }

  test("public cosine is total: zero-norm operands yield the sentinel, not DIVIDE_BY_ZERO") {
    // ANSI mode (Spark 4 default) turns the unguarded dot/sqrt(n2) form
    // into a batch-killing DIVIDE_BY_ZERO on the first garbage embedding;
    // the guarded form pins the below-range sentinel on EITHER side's
    // zero-norm while leaving well-formed pairs bit-identical.
    val rows = Seq(
      (1L, Array(1.0, 0.0), Array(1.0, 0.0)),   // identical → 1.0
      (2L, Array(1.0, 0.0), Array(-1.0, 0.0)),  // antipodal → −1.0
      (3L, Array(0.0, 0.0), Array(1.0, 2.0)),   // zero-norm left
      (4L, Array(3.0, 4.0), Array(0.0, 0.0)),   // zero-norm right
      (5L, Array(0.0, 0.0), Array(0.0, 0.0)))   // both
      .toDF("id", "a", "b")
    val got = rows.select(col("id"), round(Similarity.cosine(col("a"), col("b")), 6).as("cos"))
      .as[(Long, Double)].collect().toMap
    got(1L) shouldBe 1.0
    got(2L) shouldBe -1.0
    got(3L) shouldBe Similarity.UndefinedCos
    got(4L) shouldBe Similarity.UndefinedCos
    got(5L) shouldBe Similarity.UndefinedCos
    // the sentinel sorts strictly under every attainable cosine
    Similarity.UndefinedCos should be < -1.0
  }

  test("IVF top-k recalls most brute-force neighbors on its own bucket") {
    val e = Tables.embeddings(spark, sf)
    val queries = e.filter(col("label") === 0)
    val exact = Similarity.bruteForceTopK(e, queries, k = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, e.filter(col("vec_id") % 10 === 3), queries, k = 3)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet

    // nprobe=1 IVF on weakly-clustered synthetic vectors: this grades the
    // DATAFLOW (bucketing + probe produce sane neighbors), not ANN quality —
    // observed recall ≈ 0.20 here; a real corpus with cluster structure (and
    // nprobe > 1) is where recall climbs.
    val recall = (exact & ivf).size.toDouble / exact.size
    withClue(s"recall=$recall exact=${exact.size} ivf=${ivf.size}: ") {
      recall should be >= 0.1
      ivf.size shouldBe exact.size // same k per query, every query answered
    }
  }

  test("hash split: partitioning-invariant, append-stable, percentages respected") {
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, sf).select("doc_id")
    def splits(df: DataFrame): Map[Long, String] =
      Sampling.hashSplit(df, "doc_id").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    val base = splits(docs)
    // partitioning must not move rows between splits (randomSplit fails this)
    splits(docs.repartition(17)) shouldBe base
    // appending new rows must not reassign existing ones
    val appended = splits(docs.union(docs.select((col("doc_id") + 100000).as("doc_id"))))
    base.foreach { case (id, s) => appended(id) shouldBe s }
    // rough proportions (loose at this corpus size; exactness lives in the
    // q_hash_split oracle): train ≈ 80%
    val trainFrac = base.values.count(_ == "train").toDouble / base.size
    trainFrac should (be >= 0.65 and be <= 0.95)
  }

  test("cosine-LSH dedup is partitioning-invariant and finds planted scaled copies") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val scaled = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5)).as("embedding"))
    val corpus = e.unionByName(scaled)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Similarity.cosineLshDedup(df, "vec_id", "embedding", threshold = 0.99)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val base = pairs(corpus)
    // every planted (v, 1.5v) pair found — sign signatures are identical
    base should contain allElementsOf
      e.filter(col("vec_id") % 10 === 0).select("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(0) + 10000))
    // layout must not change the result
    pairs(corpus.repartition(13)) shouldBe base
  }

  test("sub-k-token documents have no shingles and never pair as near-dups") {
    import org.apache.spark.sql.types._
    // a 1-token doc must NOT claim shingle set ["tok"]: sequence(0, size-k)
    // with a negative end counts DOWN and would manufacture partial shingles
    // from negative indices without the guard
    val toksDf = Seq(
      (1L, Seq("tok")), (2L, Seq("tok", "two")), (3L, Seq("a", "b", "c"))
    ).toDF("id", "toks")
    val sh = toksDf.select(col("id"),
      NearDup.shinglesFromTokens(col("toks")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    sh(1L) shouldBe empty
    sh(2L) shouldBe empty
    sh(3L) shouldBe Seq("a b c")

    // end-to-end: two short docs sharing a token are NOT near-dups, in any
    // of the three dedup joins
    val docs = Seq(
      (1L, "tok"), (2L, "tok"), (3L, "tok extra"),
      (10L, "a full length document with enough tokens to shingle"),
      (11L, "a full length document with enough tokens to shingle")
    ).toDF("doc_id", "text")
    val minhash = NearDup.minHashDedup(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    minhash shouldBe Set((10L, 11L))
    val exact = NearDup.ngramJaccardJoin(docs, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact shouldBe Set((10L, 11L))
    val sim = NearDup.simHashDedup(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sim shouldBe Set((10L, 11L))
  }

  test("clusterPairs: chains collapse to one component, singletons stay canonical") {
    // 0-1-2-3-4-5 chain (diameter 5 — forces multiple propagation rounds),
    // a 2-clique {10, 11}, and singleton 20
    val ids = (Seq(0L, 1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L)).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val labels = NearDup.clusterPairs(ids, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    (0L to 5L).foreach { id => labels(id)._1 shouldBe 0L }
    labels(10L)._1 shouldBe 10L
    labels(11L)._1 shouldBe 10L
    labels(20L) shouldBe (20L, true)
    labels.count(_._2._2) shouldBe 3 // exactly one canonical per component
    // labels flow AGAINST the a<b orientation too (symmetric edges)
    val rev = NearDup.clusterPairs(ids,
      pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rev shouldBe labels.map { case (k, v) => k -> v._1 }
  }

  test("resolveCanonical: priority beats min-id; ties fall to size then id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("id", "cluster_root")
    // cluster 1: id 3 has the best (lowest) priority → wins despite max id
    // and smallest size; cluster 10: equal priority → larger sz wins;
    // singleton 20 keeps itself.
    val attrs = Seq(
      (1L, 1, 100L), (2L, 1, 500L), (3L, 0, 10L),
      (10L, 2, 50L), (11L, 2, 80L),
      (20L, 5, 1L)).toDF("id", "prio", "sz")
    val out = NearDup.resolveCanonical(labels, attrs, "id", "prio", "sz")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out(1L) shouldBe ((3L, false))
    out(2L) shouldBe ((3L, false))
    out(3L) shouldBe ((3L, true))
    out(10L) shouldBe ((11L, false))
    out(11L) shouldBe ((11L, true))
    out(20L) shouldBe ((20L, true))
  }

  test("resolveCanonical: ids missing from attrs stay in the output, ranked last") {
    val labels = Seq((1L, 1L), (2L, 1L), (30L, 30L)).toDF("id", "cluster_root")
    val attrs = Seq((2L, 5, 10L)).toDF("id", "prio", "sz") // 1 and 30 missing
    val out = NearDup.resolveCanonical(labels, attrs, "id", "prio", "sz")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    out.keySet shouldBe Set(1L, 2L, 30L)    // nothing vanishes
    out(2L) shouldBe ((2L, true))           // attributed member beats the bare one
    out(1L) shouldBe ((2L, false))
    out(30L) shouldBe ((30L, true))         // attr-less singleton keeps itself
  }

  test("minhash signatures are partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
    val once = NearDup.minHashDedup(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val repart = NearDup.minHashDedup(docs.repartition(13), "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    once shouldBe repart
  }
}
