package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd, TxReplay}

/** THE invariant of the micro-batch design: slicing a history into
  * micro-batches must not change WHAT is emitted — the union of all batch
  * emissions equals the one-shot batch replay of the full history, for any
  * slicing, including ENDs separated from their events and interleaved
  * commits. (The reference gets this from watermark plumbing; we get it from
  * the watermark filter + state compaction, so it needs direct evidence.)
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docKey(r: org.apache.spark.sql.Row): (Long, Long, String, Seq[(Long, Int)], Boolean) = (
    r.getAs[Long]("key"),
    r.getAs[Long]("commit_lsn"),
    r.getStruct(r.fieldIndex("row")).toString,
    r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("lines"))
      .map(l => (l.getLong(0), l.getStruct(1).getInt(0))),
    r.getAs[Boolean]("deleted"))

  // GRAFT_FUZZ_SEEDS widens the randomized sweep (default 5) for one-off
  // deep fuzz runs; CI stays fast
  private val fuzzSeeds = sys.env.get("GRAFT_FUZZ_SEEDS").map(_.toInt).getOrElse(5)

  test("any batch slicing of a random history emits exactly the one-shot replay") {
    for (seed <- 1 to fuzzSeeds) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(3)
      val nTx = 3 + rnd.nextInt(4)
      var lsn = 0L
      val left = Seq.newBuilder[LeftEv]
      val right = Seq.newBuilder[RightEv]
      val ends = Seq.newBuilder[TxEnd]
      val inserted = scala.collection.mutable.Set[Long]()
      for (tx <- 1 to nTx) {
        var nl = 0L; var nr = 0L
        for (key <- 1L to nKeys) {
          if (rnd.nextBoolean()) {
            lsn += 1
            if (!inserted(key)) { left += LeftEv(key, "c", lsn, tx, OrderRow(key.toInt, s"a$tx")); inserted += key }
            else if (rnd.nextInt(5) == 0) {
              // delete (tombstone) — a later tx may re-insert
              left += LeftEv(key, "d", lsn, tx, OrderRow(-1, null)); inserted -= key
            }
            else left += LeftEv(key, "u", lsn, tx, OrderRow(key.toInt, s"a$tx"))
            nl += 1
          }
          if (inserted(key)) for (_ <- 1 to rnd.nextInt(3)) {
            lsn += 1
            val lid = rnd.nextInt(4) + 1
            right += RightEv(key, lid, if (rnd.nextInt(4) == 0) "d" else "c", lsn, tx,
              LineRow(lid, tx, tx * 1.0))
            nr += 1
          }
        }
        // commit order shuffled vs tx order (interleaved commits)
        ends += TxEnd(tx, 1000L + ((tx * 7) % nTx) * 10 + tx, nl, nr)
      }
      val (l, r, e) = (left.result(), right.result(), ends.result())

      val oneShot = TxReplay.replay(l.toDF(), r.toDF(), e.toDF())
        .collect().map(docKey).toSet

      // random slicing. Data events land anywhere; ENDs respect the
      // transport guarantee (commit-LSN order → non-decreasing batch index),
      // like the reference's single-partition transaction topic.
      val engine = new TxReplayStream(spark,
        Files.createTempDirectory(s"graft-eq-$seed").toString)
      val lSlices = l.groupBy(_ => rnd.nextInt(3))
      val rSlices = r.groupBy(_ => rnd.nextInt(3))
      var endBatch = 0
      val eSlices = e.sortBy(_.commit_lsn).map { end =>
        endBatch = math.max(endBatch, rnd.nextInt(3))
        end -> endBatch
      }.groupMap(_._2)(_._1)
      val streamed = (0 until 3).flatMap { b =>
        engine.processBatch(
          lSlices.getOrElse(b, Seq.empty).toDF(),
          rSlices.getOrElse(b, Seq.empty).toDF(),
          eSlices.getOrElse(b, Seq.empty).toDF())
          .collect().map(docKey)
      }

      withClue(s"seed=$seed: streamed emissions must be duplicate-free: ") {
        streamed.distinct.size shouldBe streamed.size
      }
      withClue(s"seed=$seed: streamed == one-shot replay: ") {
        streamed.toSet shouldBe oneShot
      }
    }
  }
}
