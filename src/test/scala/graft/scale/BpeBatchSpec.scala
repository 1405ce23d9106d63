package graft.scale

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The batched BPE trainer ([[Bpe.learnMerges]] with maxBatch > 1) must
  * learn EXACTLY the sequential trainer's merge sequence — the selection
  * rule (prefix of the ranking, pairwise symbol-disjoint, fresh merged
  * strings, strict count drop at the boundary) is designed to make batching
  * invisible, not approximately right. maxBatch = 1 IS the sequential
  * trainer, so equality across maxBatch settings is the whole property.
  */
class BpeBatchSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merges(wc: org.apache.spark.sql.DataFrame, n: Int, batch: Int) =
    Bpe.learnMerges(wc, numMerges = n, maxBatch = batch)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq

  test("batched trainer reproduces the Sennrich example exactly") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    merges(wc, 5, 16) shouldBe merges(wc, 5, 1)
  }

  test("batched == sequential on the sf0.001 corpus, 32 merges") {
    val wc = Bpe.wordCounts(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "text")
      .localCheckpoint(true)
    val seq16 = merges(wc, 32, 16)
    val seq1 = merges(wc, 32, 1)
    seq16 shouldBe seq1
    seq16.size shouldBe 32
  }

  test("batched == sequential on adversarial random corpora (tiny alphabet)") {
    // 2-letter alphabet + short words = maximal pair interaction, constant
    // ties, and merged-string collisions ("ab" re-appearing as a symbol) —
    // every guard in the selection rule gets exercised.
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val words = Seq.fill(60) {
        val len = 1 + rnd.nextInt(6)
        (Seq.fill(len)(('a' + rnd.nextInt(2)).toChar).mkString,
          1L + rnd.nextInt(9))
      }
      val wc = words.toDF("word", "cnt")
        .groupBy("word").agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      withClue(s"trial $trial: ") {
        merges(wc, 12, 8) shouldBe merges(wc, 12, 1)
      }
    }
  }

  test("batching actually cuts the job count") {
    // a symbol-diverse vocabulary lets every prefix pair into one batch;
    // natural text shares 'e'/'t' across its top pairs and batches stay
    // small — correct behavior, just not a job-count demonstration. Each
    // 3-letter group XYZ contributes "XY" and "XYZ" so pair (X,Y) counts
    // 1000-i, strictly above every (Y,</w>)/(Y,Z)/(Z,</w>) tier (<= 600)
    // and strictly decreasing across groups -> one batch takes all 16.
    val letters = (('a' to 'z') ++ ('A' to 'Z')).grouped(3).take(17).toSeq
    val wc = letters.zipWithIndex.flatMap { case (cs, i) =>
      Seq((cs.take(2).mkString, 600L - i), (cs.mkString, 400L))
    }.toDF("word", "cnt").localCheckpoint(true)
    def countJobs(body: => Unit): Int = {
      var n = 0
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = n += 1
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(500) } // let the listener bus drain
      finally spark.sparkContext.removeSparkListener(l)
      n
    }
    val jobsSequential = countJobs(merges(wc, 16, 1))
    val jobsBatched = countJobs(merges(wc, 16, 16))
    withClue(s"sequential=$jobsSequential batched=$jobsBatched: ") {
      jobsBatched should be < (jobsSequential / 2)
    }
  }
}
