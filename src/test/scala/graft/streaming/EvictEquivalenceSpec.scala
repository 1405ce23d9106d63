package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd, TxReplay}

/** THE invariant of stall eviction: an evicted transaction behaves exactly
  * as if it had never existed. For random histories with one transaction
  * crippled (an event dropped in transit, END still announcing the full
  * counts), the replay engine with eviction enabled must emit precisely
  * the one-shot replay of the SAME history with the crippled transaction
  * removed outright — same documents, same as-of content, no partial
  * application, no duplicates.
  */
class EvictEquivalenceSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docKey(r: org.apache.spark.sql.Row): (Long, Long, String, Seq[(Long, Int)], Boolean) = (
    r.getAs[Long]("key"),
    r.getAs[Long]("commit_lsn"),
    r.getStruct(r.fieldIndex("row")).toString,
    r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("lines"))
      .map(l => (l.getLong(0), l.getStruct(1).getInt(0))),
    r.getAs[Boolean]("deleted"))

  private val fuzzSeeds = sys.env.get("GRAFT_FUZZ_SEEDS").map(_.toInt).getOrElse(5)

  test("eviction of a crippled tx == replay of a history it never entered") {
    for (seed <- 11 until 11 + fuzzSeeds) {
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
        ends += TxEnd(tx, 1000L + ((tx * 7) % nTx) * 10 + tx, nl, nr)
      }
      val (l0, r0, e) = (left.result(), right.result(), ends.result())

      // cripple one tx that has events: one of its events is lost in
      // transit, but its END still announces the full counts
      val withEvents = (l0.map(_.tx_id) ++ r0.map(_.tx_id)).distinct
      if (withEvents.isEmpty) () // degenerate all-empty history: nothing to cripple
      else {
      val crippled = withEvents(rnd.nextInt(withEvents.size))
      val cl = l0.filter(_.tx_id == crippled)
      val (l, r) =
        if (cl.nonEmpty && (r0.forall(_.tx_id != crippled) || rnd.nextBoolean()))
          (l0.filterNot(ev => ev.tx_id == crippled && ev == cl.head), r0)
        else {
          val cr = r0.filter(_.tx_id == crippled)
          (l0, r0.filterNot(ev => ev.tx_id == crippled && ev == cr.head))
        }

      // reference: the crippled tx never existed at all
      val oneShot = TxReplay.replay(
        l0.filterNot(_.tx_id == crippled).toDF(),
        r0.filterNot(_.tx_id == crippled).toDF(),
        e.filterNot(_.tx_id == crippled).toDF())
        .collect().map(docKey).toSet

      // window 3 > the 0-2 slicing spread: a legitimate tx's END always
      // arrives within the window; only the crippled tx (whose counts can
      // never match) ages out — the contract evictAfterBatches documents
      val engine = new TxReplayStream(spark,
        Files.createTempDirectory(s"graft-evicteq-$seed").toString,
        evictAfterBatches = Some(3))
      val lSlices = l.groupBy(_ => rnd.nextInt(3))
      val rSlices = r.groupBy(_ => rnd.nextInt(3))
      var endBatch = 0
      val eSlices = e.sortBy(_.commit_lsn).map { end =>
        endBatch = math.max(endBatch, rnd.nextInt(3))
        end -> endBatch
      }.groupMap(_._2)(_._1)
      // the trailing empty batches age the crippled tx past the window
      // and flush everything it stalled
      val streamed = (0 until 7).flatMap { b =>
        engine.processBatch(
          lSlices.getOrElse(b, Seq.empty).toDF(),
          rSlices.getOrElse(b, Seq.empty).toDF(),
          eSlices.getOrElse(b, Seq.empty).toDF())
          .collect().map(docKey)
      }

      withClue(s"seed=$seed crippled=$crippled: no duplicates: ") {
        streamed.distinct.size shouldBe streamed.size
      }
      withClue(s"seed=$seed crippled=$crippled: evicted == never-existed: ") {
        streamed.toSet shouldBe oneShot
      }
      }
    }
  }
}
