package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** Incremental (delta-vs-persisted-index) near-dedup. The gates:
  *
  *  1. EQUIVALENCE — probing the corpus index with a delta yields exactly
  *     the batch [[NearDup.minHashDedup]] verdicts over corpus ∪ delta,
  *     restricted to the incremental matching rule (a delta doc matches any
  *     corpus doc, but only smaller-id delta docs). Band keys and shingle
  *     hashes are the same functions on both paths, so this holds exactly,
  *     not just in expectation.
  *  2. The ingest LOOP — survivors' index rows appended via
  *     `unionByName(buildMinHashIndex(...))` make a later delta's copy of a
  *     day-1 survivor a duplicate OF that survivor.
  *  3. The VERSION GUARD — an index stamped by a different signature
  *     version fails loudly instead of silently losing LSH recall.
  */
class IncrementalDedupSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val docs = Tables.documents(spark, sf).select("doc_id", "text").cache()
  private lazy val corpus = docs.filter(col("doc_id") % 3 =!= 0)
  private lazy val delta = docs.filter(col("doc_id") % 3 === 0)
    .unionByName(docs.filter(col("doc_id") % 7 === 1)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))

  test("incremental verdicts == batch minHashDedup restricted to the delta rule") {
    val index = NearDup.buildMinHashIndex(corpus, "doc_id", "text")
    val inc = NearDup.incrementalMinHashDedup(index, delta, "doc_id", "text", threshold = 0.7)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    val corpusIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val batchPairs = NearDup.minHashDedup(corpus.unionByName(delta), "doc_id", "text",
      threshold = 0.7).collect().map(r => (r.getLong(0), r.getLong(1)))

    // expected: per delta doc, the smallest batch-pair partner that is
    // either a corpus doc or an earlier delta doc
    val matched = batchPairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)).collect {
        case (d, o) if deltaIds(d) && (corpusIds(o) || o < d) => (d, o)
      }
    }.groupBy(_._1).map { case (d, os) => d -> os.map(_._2).min }

    inc.size shouldBe deltaIds.size
    deltaIds.foreach { d =>
      withClue(s"delta doc $d: ") { inc(d) shouldBe matched.get(d) }
    }
    // the fixture exercises both match kinds and survival
    matched.values.exists(corpusIds) shouldBe true
    matched.exists { case (d, o) => deltaIds(o) && o < d } shouldBe true
    inc.values.count(_.isEmpty) should be > 0
  }

  test("index append loop: day-2 copy of a day-1 survivor dedups against it") {
    val index = NearDup.buildMinHashIndex(corpus, "doc_id", "text").cache()
    val verdict = NearDup.incrementalMinHashDedup(index, delta, "doc_id", "text",
      threshold = 0.7)
    val survivors = delta.join(verdict.filter(col("is_new")).select("id"),
      delta("doc_id") === col("id")).select("doc_id", "text")
    val day1Id = survivors.agg(min("doc_id")).head.getLong(0)

    val updated = index.unionByName(NearDup.buildMinHashIndex(survivors, "doc_id", "text"))
    val day2 = survivors.filter(col("doc_id") === day1Id)
      .select((col("doc_id") + 50000).as("doc_id"), col("text"))
    val v2 = NearDup.incrementalMinHashDedup(updated, day2, "doc_id", "text",
      threshold = 0.7).collect()
    v2.length shouldBe 1
    v2.head.getBoolean(3) shouldBe false // is_new
    v2.head.getLong(1) shouldBe day1Id   // dup_of the day-1 survivor
  }

  test("version guard: a foreign-version index fails loudly") {
    val stale = NearDup.buildMinHashIndex(corpus.limit(20), "doc_id", "text")
      .withColumn("sig_v", lit(1))
    val ex = intercept[Exception] {
      NearDup.incrementalMinHashDedup(stale, delta.limit(5), "doc_id", "text").collect()
    }
    ex.getMessage should include("signature version")
  }
}
