package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Behavior tests for the corpus-curation operators added in round 4:
  * decontamination, repetition filters, PII redaction, TF-IDF. The oracle
  * queries exercise them at corpus scale; these pin the edge semantics on
  * hand-built documents where the expected values are computed by hand.
  */
class CurationSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("classifier: hashed linear scoring — known model, empty text, gate sign") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "good good text"),   // unigrams: good x2, text; bigrams: "good good", "good text"
      (2L, ""),                 // no features: scores exactly the bias
      (3L, "bad")               // one unigram
    ).toDF("doc_id", "text")
    // model that only knows two features: the hash buckets of "good" and "bad"
    val nF = 1 << 20
    val bucket = (g: String) => spark.range(1)
      .select(pmod(Hashing.md5Long60(lit(g)), lit(nF.toLong))).head().getLong(0)
    val weights = Seq(
      (bucket("good"), 0.5),
      (bucket("bad"), -0.25)
    ).toDF("feature", "weight")

    val out = Classifier.linearScore(docs, weights, "doc_id", "text", nF, bias = 0.1)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    out(1L) shouldBe ((1.1, true))   // 2 x 0.5 + 0.1
    out(2L) shouldBe ((0.1, true))   // bias only — doc must not vanish
    out(3L) shouldBe ((-0.15, false))

    // feature table: counts are per (doc, feature); bigrams hash distinctly
    val f = Classifier.hashedFeatures(docs, "doc_id", "text", nF)
    f.filter(col("doc_id") === 1L && col("feature") === bucket("good"))
      .head().getLong(2) shouldBe 2L
    f.filter(col("doc_id") === 2L).count() shouldBe 0L
  }

  test("domainCap: per-domain rank, audit columns, deterministic tiebreak") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 300L), (4L, "a", 50L),
      (5L, "b", 10L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Sampling.domainCap(docs, "doc_id", "source", cap = 2,
        rankBy = Seq(org.apache.spark.sql.functions.col("n_chars").desc))
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getBoolean(4)))).toMap
    // domain a: 300-ties broken by doc_id (2 before 3), then 100, then 50
    out(2L) shouldBe ((1, true))
    out(3L) shouldBe ((2, true))
    out(1L) shouldBe ((3, false))
    out(4L) shouldBe ((4, false))
    out(5L) shouldBe ((1, true)) // singleton domain unaffected
  }

  test("decontaminate: overlap counts, clean docs, and sub-n docs") {
    val train = Seq(
      (1L, "a b c d e f g"),        // shares the eval doc's grams
      (2L, "x y z w v u t"),        // disjoint
      (3L, "a b c"),                // < n tokens: no grams, clean by definition
      (4L, "a b c d e a b c d e")   // duplicated gram counted ONCE (distinct)
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    // eval 5-grams: {a b c d e, b c d e f}

    val out = Decontam.decontaminate(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()

    out.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L, 4L)
    out.map(_.getLong(2)) shouldBe Array(2L, 0L, 0L, 1L) // n_overlap
    out.map(_.getBoolean(3)) shouldBe Array(true, false, false, true)
    // n_grams is the DISTINCT gram count: doc 4's repetition wraps around
    // ("e a b c d" etc.), so 6 positions yield 5 distinct grams
    out.map(_.getInt(1)) shouldBe Array(3, 3, 0, 5)
  }

  test("bloomDecontaminate: exact-equivalent to decontaminate") {
    val train = Seq(
      (1L, "a b c d e f g"),
      (2L, "x y z w v u t"),
      (3L, "a b c"),
      (4L, "a b c d e a b c d e")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e f")).toDF("doc_id", "text")

    val out = Decontam.bloomDecontaminate(train, eval, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
    out.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L, 4L)
    out.map(_.getLong(2)) shouldBe Array(2L, 0L, 0L, 1L)
    out.map(_.getBoolean(3)) shouldBe Array(true, false, false, true)
    out.map(_.getInt(1)) shouldBe Array(3, 3, 0, 5)

    // Equivalence on a wider corpus, including at an aggressive (tiny) Bloom
    // sizing where false positives are LIKELY — the verify join must erase
    // them. 200 synthetic docs over a 30-word vocabulary.
    val words = ('a' to 'z').map(_.toString) ++ Seq("aa", "bb", "cc", "dd")
    val docs = (1L to 200L).map { i =>
      val toks = (0 until 12).map(j => words(((i * 7 + j * j + 3) % 30).toInt))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val tr = docs.filter(col("doc_id") % 10 =!= 0)
    val ev = docs.filter(col("doc_id") % 10 === 0)
    val exact = Decontam.decontaminate(tr, ev, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect().map(_.toSeq)
    for (bits <- Seq(2, 16)) { // 2 bits/gram ≈ 40% fpp: FP-heavy path
      val bloom = Decontam.bloomDecontaminate(tr, ev, "doc_id", "text", n = 5,
        bitsPerGram = bits).orderBy("doc_id").collect().map(_.toSeq)
      bloom shouldBe exact
    }
  }

  test("repetitionStats: fractions match hand computation") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // top token 4/4; 2-grams: 3 total, 1 distinct
      (2L, "a b c d"),             // all unique
      (3L, "a")                    // sub-2-token: dup fracs are 0 by definition
    ).toDF("doc_id", "text")

    val rows = TextOps.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("top_token_frac", "dup_2gram_frac", "dup_3gram_frac", "flagged")
      .collect()

    rows(0).getDouble(0) shouldBe 1.0
    rows(0).getDouble(1) shouldBe (1.0 - 1.0 / 3.0) +- 1e-12
    rows(0).getDouble(2) shouldBe (1.0 - 1.0 / 2.0) +- 1e-12
    rows(0).getBoolean(3) shouldBe true

    rows(1).getDouble(0) shouldBe 0.25
    rows(1).getDouble(1) shouldBe 0.0
    rows(1).getBoolean(3) shouldBe true // 1/4 > 0.20 top-token gate

    rows(2).getDouble(0) shouldBe 1.0 // single token dominates
    rows(2).getDouble(1) shouldBe 0.0
    rows(2).getDouble(2) shouldBe 0.0
  }

  test("redactPii: all three pattern families, counts + replacement") {
    val docs = Seq(
      (1L, "mail bob.smith@corp.example.com and 555-867-5309 via 192.168.0.1"),
      (2L, "no pii here")
    ).toDF("doc_id", "text")

    val out = TextOps.redactPii(docs, "text").orderBy("doc_id").collect()
    out(0).getAs[Int]("n_emails") shouldBe 1
    out(0).getAs[Int]("n_phones") shouldBe 1
    out(0).getAs[Int]("n_ips") shouldBe 1
    out(0).getAs[String]("redacted") shouldBe "mail <EMAIL> and <PHONE> via <IP>"
    out(1).getAs[String]("redacted") shouldBe "no pii here"
  }

  test("tfIdfTopTerms: corpus-wide terms score 0, rare terms rank first") {
    // 'common' appears in all 3 docs -> idf = ln(1) = 0
    val docs = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common rare2"),
      (3L, "common common")
    ).toDF("doc_id", "text")

    val out = TextOps.tfIdfTopTerms(docs, "doc_id", "text", topK = 2)
      .orderBy("doc_id", "rank").collect()

    // doc 1: rare1 (tf=2, df=1, score 2*ln3) beats common (0)
    val d1 = out.filter(_.getLong(0) == 1L)
    d1(0).getAs[String]("token") shouldBe "rare1"
    d1(0).getAs[Double]("tfidf") shouldBe (2.0 * math.log(3.0) +- 1e-4)
    d1(1).getAs[String]("token") shouldBe "common"
    d1(1).getAs[Double]("tfidf") shouldBe 0.0
    // doc 3 has only 'common': a single rank-1 row at score 0
    out.filter(_.getLong(0) == 3L).map(_.getAs[String]("token")) shouldBe Array("common")
  }

  test("ccnetBuckets: equal-frequency per-language terciles, head more fluent than tail") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val out = LangModel.ccnetBuckets(docs, "doc_id", "text", "lang").cache()
    out.count() shouldBe docs.count() // every doc gets a bucket

    val sizes = out.groupBy("lang", "ccnet_bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = sizes.keys.map(_._1).toSet
    langs.foreach { l =>
      val s = Seq("head", "middle", "tail").map(b => sizes.getOrElse((l, b), 0L))
      withClue(s"lang=$l sizes=$s: ") { s.min should be >= (s.max - 1) }
    }
    // within each language the head tercile is strictly more likely under
    // the corpus LM (lower mean NLL) than the tail
    val means = out.groupBy("lang", "ccnet_bucket").agg(avg("nll").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    langs.foreach { l =>
      withClue(s"lang=$l: ") { means((l, "head")) should be < means((l, "tail")) }
    }
    out.unpersist()
  }

  test("mixtureSample: rates hit the per-source allocation, capped at keep-all") {
    // source A: 100 docs x 10 tokens = 1000; source B: 10 docs x 10 = 100.
    // equal weights, budget = half the corpus (550): A's allocation is 275
    // of 1000 -> 275 permille; B's is 275 of 100 -> capped at 1000.
    val docs = ((1L to 100L).map(i => (i, "A", 10L)) ++
      (101L to 110L).map(i => (i, "B", 10L))).toDF("doc_id", "source", "n_tokens")
    val weights = Seq(("A", 1L), ("B", 1L)).toDF("source", "w")

    val out = Sampling.mixtureSample(docs, "doc_id", "source", "n_tokens",
      weights, budgetNum = 1, budgetDen = 2)

    val rates = out.select("source", "p_permille").distinct()
      .as[(String, Long)].collect().toMap
    rates("A") shouldBe 275L
    rates("B") shouldBe 1000L
    // capped source keeps every document
    out.filter(col("source") === "B").count() shouldBe 10
    // sampled tokens of A land near its allocation (hash-uniformity, not exact)
    val aTokens = out.filter(col("source") === "A")
      .agg(sum("n_tokens")).as[Long].collect().head
    aTokens should (be >= 180L and be <= 370L)
  }
}
