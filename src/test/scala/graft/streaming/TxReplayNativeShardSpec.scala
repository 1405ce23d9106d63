package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.tx.{LeftEv, LineRow, OrderRow, RightEv, TxEnd, TxReplay}

/** The sharded key fan-out (`keyShards`) must change NOTHING about the
  * emission sequence — same docs, same per-key commit order, same stall
  * behavior — while key memory lives in the (txId, shard)-keyed
  * ShardFanout state instead of riding the complete signal through the
  * parallelism-1 sequencer. Includes the bulk-transaction fixture the
  * sharding exists for: one tx touching tens of thousands of keys, where
  * the unsharded fold would put the whole key set in one signal row and
  * one sequencer state entry.
  */
class TxReplayNativeShardSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRocksDb[T](f: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def toNative(l: Seq[LeftEv], r: Seq[RightEv], e: Seq[TxEnd]): Seq[NativeEv] =
    l.map(x => NativeEv("l", x.key, -1L, x.op, x.lsn, x.tx_id, x.row, null, -1L, -1L, -1L)) ++
    r.map(x => NativeEv("r", x.key, x.line_id, x.op, x.lsn, x.tx_id, null, x.row, -1L, -1L, -1L)) ++
    e.map(x => NativeEv("t", -1L, -1L, null, -1L, x.tx_id, null, null,
      x.commit_lsn, x.expected_left, x.expected_right))

  private def runSharded(name: String, batches: Seq[Seq[NativeEv]],
                         shards: Int,
                         doneTtlMs: Option[Long] = None): Seq[Seq[Row]] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[NativeEv]
    val df = in.toDF()
    val left = df.filter(col("stream") === "l")
      .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
    val right = df.filter(col("stream") === "r")
      .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
        col("lrow").as("row"))
    val ends = df.filter(col("stream") === "t")
      .select(col("tx_id"), col("commit_lsn"), col("expected_left"), col("expected_right"))
    val q = TxReplayNative.docs(left, right, ends, keyShards = Some(shards),
        shardDoneTtlMs = doneTtlMs)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(s"graft-$name").toString)
      .start()
    try {
      var seen = 0
      batches.map { b =>
        if (b.nonEmpty) in.addData(b)
        q.processAllAvailable()
        val all = spark.table(name).collect().toSeq
        val fresh = all.drop(seen)
        seen = all.size
        fresh
      }
    } finally q.stop()
  }

  private def docKey(r: Row): (Long, Long, String, Seq[(Long, Int)], Boolean) = (
    r.getAs[Long]("key"),
    r.getAs[Long]("commit_lsn"),
    r.getStruct(r.fieldIndex("row")).toString,
    Option(r.getSeq[Row](r.fieldIndex("lines")))
      .map(_.map(l => (l.getLong(0), l.getStruct(1).getInt(0))))
      .getOrElse(Seq.empty),
    r.getAs[Boolean]("deleted"))

  test("sharded fan-out preserves the contiguity stall and commit order") {
    val b1 = toNative(
      Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a")),
          LeftEv(2, "c", 10, 2, OrderRow(2, "b"))),
      Seq(RightEv(2, 1, "c", 11, 2, LineRow(1, 1, 1.0))),
      // tx1 announces 1+1 but its right event is missing: complete tx2
      // (commit 200 > 100) must NOT emit yet
      Seq(TxEnd(1, 100, 1, 1), TxEnd(2, 200, 1, 1)))
    val b2 = toNative(
      Seq.empty, Seq(RightEv(1, 1, "c", 2, 1, LineRow(9, 9, 9.0))), Seq.empty)
    val out = runSharded("shard_stall", Seq(b1, b2), shards = 4)
    out(0) shouldBe empty
    out(1).map(_.getAs[Long]("commit_lsn")).sorted shouldBe Seq(100L, 200L)
  }

  test("random histories: sharded == unsharded == one-shot batch replay") {
    for (seed <- 11 to 12) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 2 + rnd.nextInt(3)
      val nTx = 3 + rnd.nextInt(3)
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
      val (l, r, e) = (left.result(), right.result(), ends.result())
      val oneShot = TxReplay.replay(l.toDF(), r.toDF(), e.toDF())
        .collect().map(docKey).toSet
      val lS = l.groupBy(_ => rnd.nextInt(3))
      val rS = r.groupBy(_ => rnd.nextInt(3))
      var endBatch = 0
      val eS = e.sortBy(_.commit_lsn).map { end =>
        endBatch = math.max(endBatch, rnd.nextInt(3))
        end -> endBatch
      }.groupMap(_._2)(_._1)
      val batches = (0 until 3).map(b => toNative(
        lS.getOrElse(b, Seq.empty), rS.getOrElse(b, Seq.empty),
        eS.getOrElse(b, Seq.empty)))
      val streamed = runSharded(s"shard_eq_$seed", batches, shards = 3)
        .flatten.map(docKey)
      withClue(s"seed=$seed duplicate-free: ") {
        streamed.distinct.size shouldBe streamed.size
      }
      withClue(s"seed=$seed sharded == one-shot replay: ") {
        streamed.toSet shouldBe oneShot
      }
    }
  }

  test("bulk transaction: tens of thousands of keys flush once each and state drains") {
    val nKeys = 50000
    // tx 1: bulk insert touching every key (one header + one line each —
    // INNER semantics need a line for a doc); tx 2: a small follow-up
    // update proving post-release shard state cleared (no key re-flushes
    // from tx 1)
    val b1 = toNative(
      (1L to nKeys).map(k => LeftEv(k, "c", k, 1, OrderRow(k.toInt, "bulk"))),
      (1L to nKeys).map(k => RightEv(k, 1, "c", nKeys + k, 1, LineRow(1, 1, 1.0))),
      Seq(TxEnd(1, 1000000, nKeys.toLong, nKeys.toLong)))
    val b2 = toNative(
      Seq(LeftEv(7, "u", 2L * nKeys + 1L, 2, OrderRow(7, "after"))),
      Seq.empty,
      Seq(TxEnd(2, 1000100, 1, 0)))
    val out = runSharded("shard_bulk", Seq(b1, b2), shards = 8)
    out(0).size shouldBe nKeys // one doc per key for the bulk tx
    out(0).map(_.getAs[Long]("key")).distinct.size shouldBe nKeys
    out(0).foreach(_.getAs[Long]("commit_lsn") shouldBe 1000000L)
    // the follow-up releases exactly its own key — nothing replays from tx 1
    out(1).map(r => (r.getAs[Long]("key"), r.getAs[Long]("commit_lsn"))) shouldBe
      Seq((7L, 1000100L))
  }

  test("a straggler sighting after a normal release is absorbed by the tombstone") {
    // tx 1 completes and releases in batch 1; batch 2 redelivers one of
    // its event rows (an at-least-once transport duplicate). The shard
    // tombstone — set on EVERY release, not just purge — must absorb it:
    // no re-emission, no re-created shard state a release would never
    // drain, and a later transaction is unaffected.
    val b1 = toNative(
      Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a"))),
      Seq(RightEv(1, 1, "c", 2, 1, LineRow(1, 1, 1.0))),
      Seq(TxEnd(1, 100, 1, 1)))
    val b2 = toNative( // duplicate of tx 1's left event, after release
      Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a"))), Seq.empty, Seq.empty)
    val b3 = toNative(
      Seq(LeftEv(1, "u", 10, 2, OrderRow(1, "b"))), Seq.empty,
      Seq(TxEnd(2, 200, 1, 0)))
    val out = runSharded("shard_straggler", Seq(b1, b2, b3), shards = 4)
    out(0).map(_.getAs[Long]("commit_lsn")) shouldBe Seq(100L)
    out(1) shouldBe empty // straggler absorbed, nothing re-emitted
    out(2).map(r => (r.getAs[Long]("key"), r.getAs[Long]("commit_lsn"))) shouldBe
      Seq((1L, 200L))
  }

  test("the done TTL must outlive the stall window (open-tx key sightings must not expire)") {
    // the key set shares the tombstone TTL, so a TTL at or below the
    // stall-eviction bound could expire a still-open transaction's key
    // sightings before its release — rejected at wiring time
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[NativeEv]
    val df = in.toDF()
    val left = df.filter(col("stream") === "l")
      .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
    val right = df.filter(col("stream") === "r")
      .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
        col("lrow").as("row"))
    val ends = df.filter(col("stream") === "t")
      .select(col("tx_id"), col("commit_lsn"), col("expected_left"),
        col("expected_right"))
    val ex = intercept[IllegalArgumentException] {
      TxReplayNative.docs(left, right, ends, stallTimeoutMs = Some(60000L),
        keyShards = Some(4), shardDoneTtlMs = Some(60000L))
    }
    ex.getMessage should include("must exceed stallTimeoutMs")
  }

  test("state-growth tripwire: unbounded tombstones warn, a TTL'd stream stays silent") {
    // shardDoneTtlMs unset = absorb-forever (deliberate back-compat): a
    // done-tombstone per (tx, shard) accumulates for every transaction the
    // stream ever settles. That must be LOUD, not a silent slope — the
    // listener's stateRowsWarnAt tripwire fires once when total state rows
    // cross the bound. The same workload under a short TTL expires its
    // tombstones as it goes and never crosses.
    // Workload and threshold derive from one set of constants so their
    // relationship is ENFORCED, not re-tuned per host (r13 moved a literal
    // 120→150 after a loaded host starved the 100 ms expiry trigger for
    // three waves): the unbounded arm crosses deterministically — and only
    // at the final wave — because warnAt ∈ (total − wave, total]; the TTL
    // arm stays silent even if EVERY wave but the last sits unexpired
    // because warnAt > (waves−1) waves of tombstones.
    val shards = 4
    val waves = 4
    val txsPerWave = 10
    val keys = 4 // distinct doc keys the events cycle through
    val tombstonesPerWave = txsPerWave * shards // one done-tombstone per (tx, shard)
    val totalTombstones = waves * tombstonesPerWave
    val warnAt = totalTombstones - tombstonesPerWave / 4
    assert(warnAt <= totalTombstones && warnAt > totalTombstones - tombstonesPerWave,
      "unbounded arm must cross exactly at the final wave")
    assert(warnAt > (waves - 1) * tombstonesPerWave,
      "TTL arm must tolerate all but the last wave sitting unexpired")
    def wave(t0: Int, n: Int): Seq[NativeEv] = toNative(
      (t0 until t0 + n).map(t =>
        LeftEv((t % keys).toLong + 1, "c", 2L * t, t, OrderRow(t % keys + 1, s"a$t"))),
      (t0 until t0 + n).map(t =>
        RightEv((t % keys).toLong + 1, 1, "c", 2L * t + 1, t, LineRow(1, t, 1.0))),
      (t0 until t0 + n).map(t => TxEnd(t, 1000L + t, 1, 1)))

    def run(name: String, doneTtl: Option[Long]): Map[String, Long] = withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val listener = new GraftMetricsListener(stateRowsWarnAt = Some(warnAt.toLong))
      spark.streams.addListener(listener)
      val in = MemoryStream[NativeEv]
      val df = in.toDF()
      val left = df.filter(col("stream") === "l")
        .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
      val right = df.filter(col("stream") === "r")
        .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
          col("lrow").as("row"))
      val ends = df.filter(col("stream") === "t")
        .select(col("tx_id"), col("commit_lsn"), col("expected_left"),
          col("expected_right"))
      val writer = TxReplayNative.docs(left, right, ends, keyShards = Some(shards),
          shardDoneTtlMs = doneTtl)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory(s"graft-$name").toString)
      val q = doneTtl.fold(writer) { _ =>
        writer.trigger(
          org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      }.start()
      try {
        // waves of txs; under the TTL each wave's tombstones expire
        // before the next finishes, so live state never nears the total
        (0 until waves).foreach { w =>
          in.addData(wave(1 + w * txsPerWave, txsPerWave))
          if (doneTtl.isEmpty) q.processAllAvailable()
          else Thread.sleep(1500) // > TTL: the wave's tombstones expire
        }
        val expectedDocs = (waves * txsPerWave).toLong
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table(name).count() < expectedDocs &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
        spark.table(name).count() shouldBe expectedDocs // semantics identical either way
        // listener delivery is async; give the final progress events time
        val warnDeadline = System.currentTimeMillis() + 10000
        while (doneTtl.isEmpty && listener.stateRowsWarnings.isEmpty &&
               System.currentTimeMillis() < warnDeadline) Thread.sleep(100)
        listener.stateRowsWarnings
      } finally { q.stop(); spark.streams.removeListener(listener) }
    }

    val unbounded = run("shard_warn_unbounded", None)
    unbounded.keySet shouldBe Set("shard_warn_unbounded")
    unbounded("shard_warn_unbounded") should be >= warnAt.toLong

    run("shard_warn_ttl", Some(700L)) shouldBe empty
  }

  test("activity restarts the seen TTL clock: early sightings survive a release past one window") {
    // the hazard: each seen entry's TTL clock would start at its own
    // write, so a release arriving later than the window after a key's
    // FIRST sightings (a stalled chain ahead of it in the sequencer)
    // would find them expired and silently lose those flushes. With
    // refresh-on-touch (throttled to twice per window), a sighting batch
    // past the half-window re-stamps the whole shard key set.
    // Timeline (TTL 30 s): keys 1-2 at t0; key 3 at ~t0+20 s — the 5 s
    // margin over TTL/2=15 s absorbs cold-start batch latency (so the
    // throttle measures the gap as >15 s and re-stamps 1-2) and the 10 s
    // headroom under the TTL tolerates a loaded host delaying the touch
    // batch without letting keys 1-2 legitimately expire first; END at
    // ~t0+40 s — past t0+TTL (the old per-write clock WOULD have expired
    // keys 1-2), inside restamp+TTL. All three keys must flush.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[NativeEv]
      val df = in.toDF()
      val left = df.filter(col("stream") === "l")
        .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
      val right = df.filter(col("stream") === "r")
        .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
          col("lrow").as("row"))
      val ends = df.filter(col("stream") === "t")
        .select(col("tx_id"), col("commit_lsn"), col("expected_left"),
          col("expected_right"))
      // keyShards = 1 so every sighting touches the one (tx, shard) key
      val q = TxReplayNative.docs(left, right, ends, keyShards = Some(1),
          shardDoneTtlMs = Some(30000L))
        .writeStream.format("memory").queryName("shard_ttl_refresh")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation",
          Files.createTempDirectory("graft-shard-ttl-refresh").toString)
        .start()
      try {
        in.addData(toNative(
          Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a")),
              LeftEv(2, "c", 2, 1, OrderRow(2, "b"))),
          Seq(RightEv(1, 1, "c", 3, 1, LineRow(1, 1, 1.0)),
              RightEv(2, 1, "c", 4, 1, LineRow(1, 1, 2.0))),
          Seq.empty))
        Thread.sleep(20000) // > TTL/2 with margin, well under TTL, tx still open
        in.addData(toNative(
          Seq(LeftEv(3, "c", 5, 1, OrderRow(3, "c"))),
          Seq(RightEv(3, 1, "c", 6, 1, LineRow(1, 1, 3.0))),
          Seq.empty)) // touch refreshes keys 1-2's clock
        Thread.sleep(20000) // now > TTL since keys 1-2 were written
        in.addData(toNative(Seq.empty, Seq.empty, Seq(TxEnd(1, 100, 3, 3))))
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("shard_ttl_refresh").count() < 3 &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
        spark.table("shard_ttl_refresh").collect()
          .map(_.getAs[Long]("key")).sorted.toSeq shouldBe Seq(1L, 2L, 3L)
      } finally q.stop()
    }
  }

  test("bulk transaction under a TTL: spread sightings flush once each (throttled re-stamp path)") {
    // the throttle's scale case: a bulk tx's sightings arrive over several
    // batches with the TTL on. Every batch hits the re-stamp logic (the
    // first stamps, later ones skip inside the half-window), and the
    // release must still flush EVERY key exactly once — the whole set, not
    // just the last batch's. 9k keys across 3 batches, 4 shards.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[NativeEv]
      val df = in.toDF()
      val left = df.filter(col("stream") === "l")
        .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
      val right = df.filter(col("stream") === "r")
        .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
          col("lrow").as("row"))
      val ends = df.filter(col("stream") === "t")
        .select(col("tx_id"), col("commit_lsn"), col("expected_left"),
          col("expected_right"))
      val n = 9000
      val q = TxReplayNative.docs(left, right, ends, keyShards = Some(4),
          shardDoneTtlMs = Some(600000L))
        .writeStream.format("memory").queryName("shard_bulk_ttl")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .option("checkpointLocation",
          Files.createTempDirectory("graft-shard-bulk-ttl").toString)
        .start()
      try {
        (0 until 3).foreach { w =>
          val keys = (1L + w * n / 3) to ((w + 1).toLong * n / 3)
          in.addData(toNative(
            keys.map(k => LeftEv(k, "c", k, 1, OrderRow(k.toInt, "bulk"))),
            keys.map(k => RightEv(k, 1, "c", n + k, 1, LineRow(1, 1, 1.0))),
            Seq.empty))
          Thread.sleep(400) // separate micro-batches; well inside the TTL
        }
        in.addData(toNative(Seq.empty, Seq.empty,
          Seq(TxEnd(1, 1000000, n.toLong, n.toLong))))
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("shard_bulk_ttl").count() < n &&
               System.currentTimeMillis() < deadline) Thread.sleep(200)
        val out = spark.table("shard_bulk_ttl").collect()
        out.length shouldBe n
        out.map(_.getAs[Long]("key")).distinct.length shouldBe n
      } finally q.stop()
    }
  }

  test("bounded done-tombstone TTL: identical semantics inside the window") {
    // shardDoneTtlMs bounds the per-(tx, shard) tombstone so a long-running
    // stream's state stops growing with total transaction count; within the
    // window (any realistic redelivery lag) behavior is unchanged — the
    // straggler scenario must play out exactly as with unbounded tombstones.
    // TTL puts the stage in TimeMode.ProcessingTime, where a query never
    // quiesces (processAllAvailable would spin) — set a trigger and poll
    // the sink, the TxReplayNativeStallSpec discipline.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[NativeEv]
      val df = in.toDF()
      val left = df.filter(col("stream") === "l")
        .select(col("key"), col("op"), col("lsn"), col("tx_id"), col("orow").as("row"))
      val right = df.filter(col("stream") === "r")
        .select(col("key"), col("line_id"), col("op"), col("lsn"), col("tx_id"),
          col("lrow").as("row"))
      val ends = df.filter(col("stream") === "t")
        .select(col("tx_id"), col("commit_lsn"), col("expected_left"),
          col("expected_right"))
      val q = TxReplayNative.docs(left, right, ends, keyShards = Some(4),
          shardDoneTtlMs = Some(600000L))
        .writeStream.format("memory").queryName("shard_done_ttl")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .option("checkpointLocation",
          Files.createTempDirectory("graft-shard-done-ttl").toString)
        .start()
      def awaitRows(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("shard_done_ttl").count() < n &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
      }
      try {
        in.addData(toNative(
          Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a"))),
          Seq(RightEv(1, 1, "c", 2, 1, LineRow(1, 1, 1.0))),
          Seq(TxEnd(1, 100, 1, 1))))
        awaitRows(1)
        spark.table("shard_done_ttl").collect()
          .map(_.getAs[Long]("commit_lsn")).toSeq shouldBe Seq(100L)

        // duplicate of tx 1's left event after release: the tombstone —
        // alive for the whole 10-min window — absorbs it; give the
        // continuous triggers time to mis-emit before asserting nothing did
        in.addData(toNative(
          Seq(LeftEv(1, "c", 1, 1, OrderRow(1, "a"))), Seq.empty, Seq.empty))
        Thread.sleep(1500)
        spark.table("shard_done_ttl").count() shouldBe 1L

        // a later transaction is unaffected
        in.addData(toNative(
          Seq(LeftEv(1, "u", 10, 2, OrderRow(1, "b"))), Seq.empty,
          Seq(TxEnd(2, 200, 1, 0))))
        awaitRows(2)
        spark.table("shard_done_ttl").collect()
          .map(r => (r.getAs[Long]("key"), r.getAs[Long]("commit_lsn")))
          .sortBy(_._2).toSeq shouldBe Seq((1L, 100L), (1L, 200L))
      } finally q.stop()
    }
  }
}
