package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tx.TxReplay

/** Streaming execution of the transactionally consistent join+aggregation:
  * the micro-batch LSN-ordered replay design (SURVEY §7.3 path (a)).
  *
  * Each micro-batch contributes new left/right change events and tx END
  * events. The engine buffers them (bucketed parquet state dirs — the
  * operator-state analogue of the reference's checkpointed ListState,
  * `TxAware…Operator.java:100-160`), replays the full buffer with
  * [[TxReplay.replay]], emits only documents for transactions whose commit
  * LSN is above the previous watermark (exactly-once per (key, tx) across
  * batches), advances the watermark to the largest reachable commit LSN, and
  * compacts state exactly like the reference's `cleanupState`
  * (`TxAware…Operator.java:357-430`): latest record per key (left) / per
  * (key, line) (right) among emitted transactions, plus all future and
  * still-unfinished (no END yet) events.
  *
  * INCREMENTAL STATE (write amplification): event state is hash-bucketed by
  * key — `pmod(hash(key), numBuckets)` — and a micro-batch rewrites ONLY the
  * buckets it touches: buckets holding this batch's new events, plus buckets
  * holding the keys of documents emitted this batch (whose history the
  * compaction shrinks — the set the reference's per-key `cleanupState`
  * visits on watermark advance). Untouched buckets keep their existing
  * files, so bytes written per batch scale with the batch's DELTA, not the
  * buffer — the parquet analogue of ListState's O(delta) updates
  * (`TxAware…Operator.java:432-444`), where the previous design rewrote the
  * entire compacted state every batch. The bucket function must be stable
  * across restarts (state outlives the JVM): Spark's `hash()` is murmur3
  * with a fixed seed, stable across sessions and cluster layouts. Replay
  * still READS the full compacted buffer each batch — that is the
  * micro-batch replay design itself, a parallel column-pruned scan — only
  * the write side is delta-sized. Completeness never reads the buffer: a
  * small `counts` state table ((tx_id, n_left, n_right), one row per live
  * tx, settled rows dropped) is merged with each batch's delta counts — the
  * analogue of the reference's running per-tx counters
  * (`WatermarkInjector.java:74-144`, O(delta) per event, never a rescan).
  *
  * RESTART/RECOVERY: scalar progress (state version, watermark, last
  * committed batch id, bucket count) plus the per-bucket live-version table
  * is persisted in `stateRoot/MANIFEST`, written via tmp-file + atomic
  * rename AFTER the batch's state and emitted docs are durable — the
  * parquet-state analogue of the reference's checkpointed operator state. A
  * fresh instance over the same `stateRoot` resumes from the manifest;
  * [[TxReplayStream.attach]] skips micro-batches at-or-below the committed
  * batch id and REDELIVERS the committed batch's persisted output
  * (Structured Streaming re-runs the last batch whose sink didn't commit),
  * so a restart neither loses nor double-emits documents. Superseded bucket
  * versions are pruned once the manifest points past them; a crash mid-batch
  * leaves the old manifest naming only fully-written old dirs, and the
  * half-written next version is overwritten on redelivery.
  *
  * Scale: state lives in parquet partitions, all operations are the same
  * keyed shuffles as the batch replay; the driver holds only the watermark
  * scalar, batch counter, and the numBuckets-sized version table
  * (orchestration state, like any streaming engine's). Per-batch replay
  * cost is bounded by the compacted buffer, per-batch WRITE cost by the
  * batch's delta.
  *
  * WHY MICRO-BATCH REPLAY AND NOT A `transformWithState` OPERATOR (the
  * "streaming-native" design (b) floated in SURVEY §7.3): the contiguous
  * commit-LSN watermark is a GLOBAL property — tx L may only emit when every
  * tx with a smaller commit LSN is complete, and completeness itself compares
  * global per-(tx, table) event counts against the END event's announcement.
  * A keyed `StatefulProcessor` sees one key's slice of the world: a processor
  * keyed by order id cannot know whether some other key's straggler keeps an
  * earlier tx incomplete, and a processor keyed by tx id cannot see across
  * transactions to apply the contiguity stall. The reference solves this with
  * machinery Spark deliberately lacks — a custom watermark TYPE carrying the
  * commit LSN, injected by an operator that is effectively parallelism-1 per
  * table (`WatermarkInjector`; the whole PoC pipeline runs at parallelism 1,
  * poc.md:264-266) and broadcast in-band to all partitions. Spark's
  * equivalent of "centralized sequencing + broadcast" is the micro-batch
  * boundary itself: within a batch, completeness and the stall point are
  * plain global aggregates over the buffered state, and the per-LSN ordered
  * flush is a deterministic bounded replay — full data parallelism inside
  * the batch, with the same per-key and cross-key ordering guarantees the
  * reference gets from its single-parallelism watermark plumbing. The
  * per-key halves that ARE expressible as keyed processors (commit-LSN
  * fixing, keep-latest, TOAST latching) live in [[Stateful]].
  *
  * TRANSPORT ASSUMPTION (same as the reference): transaction END events
  * arrive in commit-LSN order — Debezium's transaction topic is a single
  * Kafka partition, so an END for commit L arriving implies every END with
  * commit < L has arrived. An END is the only evidence a transaction exists;
  * if ENDs could arrive out of commit order, a not-yet-announced tx could
  * not stall the watermark and its late emissions would be filtered (and
  * state compaction would have discarded the history its as-of resolution
  * needs). DATA events may arrive in any order and any batch.
  */
class TxReplayStream(spark: SparkSession, stateRoot: String, numBuckets: Int = 16) {
  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")

  // GRAFT_TXSTREAM_PROFILE=1 prints per-phase wall times per batch
  private val profile = sys.env.get("GRAFT_TXSTREAM_PROFILE").exists(_ == "1")
  private def phased[T](label: String)(f: => T): T =
    if (!profile) f else {
      val t0 = System.nanoTime(); val r = f
      println(f"TXPHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

  private val manifestPath = Paths.get(stateRoot, "MANIFEST")

  @volatile private var version: Long = -1
  @volatile private var watermark: Long = Long.MinValue
  @volatile private var committedBatch: Long = -1
  // Adopted from the manifest on resume — the on-disk layout wins over the
  // constructor argument (re-bucketing existing state would orphan files).
  @volatile private var buckets: Int = numBuckets
  // live state version per bucket, -1 = bucket holds no data
  private var leftVer: Array[Long] = Array.fill(numBuckets)(-1L)
  private var rightVer: Array[Long] = Array.fill(numBuckets)(-1L)

  // Recover progress from the manifest (crash/restart path): the manifest is
  // only ever moved into place after its version's state dirs are fully
  // written, so whatever it names is safe to resume from.
  if (Files.exists(manifestPath)) {
    val lines = Files.readAllLines(manifestPath)
    require(lines.size >= 3, s"corrupt state manifest at $manifestPath")
    val Array(v, w, b, nb) = lines.get(0).trim.split(" ")
    version = v.toLong
    watermark = w.toLong
    committedBatch = b.toLong
    buckets = nb.toInt
    leftVer = lines.get(1).trim.split(" ").map(_.toLong)
    rightVer = lines.get(2).trim.split(" ").map(_.toLong)
    require(leftVer.length == buckets && rightVer.length == buckets,
      s"manifest bucket table does not match its bucket count $buckets")
  }

  private def bucketDir(name: String, b: Int, v: Long) = s"$stateRoot/$name/b$b/v$v"
  private def scalarDir(name: String, v: Long) = s"$stateRoot/$name/v$v"

  private def bucketOf(c: Column): Column = pmod(hash(c), lit(buckets))

  /** Membership predicate on the row's key bucket; empty set → constant
    * false (Spark's `In` with an empty list is not a plan we want to rely
    * on), so `!inBuckets(empty)` is the everything-matches filter.
    */
  private def inBuckets(dirty: Set[Int]): Column =
    if (dirty.isEmpty) lit(false) else bucketOf(col("key")).isInCollection(dirty)

  private def readBuckets(name: String, vers: Array[Long]): Option[DataFrame] = {
    val paths = vers.zipWithIndex.collect { case (v, b) if v >= 0 => bucketDir(name, b, v) }
    if (paths.isEmpty) None else Some(spark.read.parquet(paths.toIndexedSeq: _*))
  }

  private def readScalar(name: String): Option[DataFrame] = {
    val p = scalarDir(name, version)
    if (version >= 0 && Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }

  private def unionWith(state: Option[DataFrame], fresh: DataFrame): DataFrame =
    state.map(_.unionByName(fresh)).getOrElse(fresh)

  private def commitManifest(v: Long, w: Long, b: Long,
                             lv: Array[Long], rv: Array[Long]): Unit = {
    val tmp = Paths.get(stateRoot, ".MANIFEST.tmp")
    Files.createDirectories(Paths.get(stateRoot))
    Files.writeString(tmp,
      s"$v $w $b $buckets\n${lv.mkString(" ")}\n${rv.mkString(" ")}")
    Files.move(tmp, manifestPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** Write the compacted keep-state of the dirty buckets: ONE partitioned
    * write job into a staging dir, then a per-bucket atomic-ish move into
    * `name/b<i>/v<next>` (a rename on every real filesystem — no second
    * data pass). A dirty bucket that compacted to zero rows produces no
    * staged dir and its version drops to -1 (empty). Returns the updated
    * per-bucket version table; untouched buckets keep their entries.
    */
  private def writeBuckets(name: String, keep: DataFrame, dirty: Set[Int],
                           vers: Array[Long], next: Long): Array[Long] = {
    if (dirty.isEmpty) return vers
    val stage = Paths.get(s"$stateRoot/$name/.stage-v$next")
    deleteRecursively(stage)
    // repartition on the bucket id first: each bucket lands in exactly one
    // task → ONE file per bucket dir. Without it every shuffle task writes
    // its own sliver of every bucket (32 tasks × |dirty| dirs ≈ hundreds of
    // KB-sized files per batch), and each later batch's state read pays the
    // per-file scan overhead — measured as the dominant compaction variance
    // at sf0.1 (SCALING.md r6).
    keep.withColumn("_b", bucketOf(col("key")))
      .repartition(math.max(dirty.size, 1), col("_b"))
      .write.partitionBy("_b").mode(SaveMode.Overwrite).parquet(stage.toString)
    val out = vers.clone()
    dirty.foreach { b =>
      val staged = stage.resolve(s"_b=$b")
      val target = Paths.get(bucketDir(name, b, next))
      deleteRecursively(target) // leftovers from a crashed attempt at `next`
      if (Files.exists(staged)) {
        Files.createDirectories(target.getParent)
        Files.move(staged, target)
        out(b) = next
      } else out(b) = -1L
    }
    deleteRecursively(stage)
    out
  }

  /** Drop state files unreachable from the committed manifest: bucket
    * versions other than each bucket's live one, leftover staging dirs, and
    * scalar (ends/emitted) versions below the current.
    */
  private def prune(lv: Array[Long], rv: Array[Long], keep: Long): Unit = {
    def pruneBuckets(name: String, vers: Array[Long]): Unit = {
      val base = Paths.get(stateRoot, name)
      if (!Files.exists(base)) return
      val ls = Files.list(base)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".stage")) deleteRecursively(p)
        else if (n.startsWith("b")) n.drop(1).toIntOption.foreach { b =>
          val live = if (b < vers.length) vers(b) else -1L
          val vls = Files.list(p)
          try vls.forEach { vp =>
            val vn = vp.getFileName.toString
            // toLongOption: a stray non-state entry must not kill the query
            if (vn.startsWith("v"))
              vn.drop(1).toLongOption.filter(_ != live).foreach(_ => deleteRecursively(vp))
          } finally vls.close()
        }
      } finally ls.close()
    }
    def pruneScalar(name: String): Unit = {
      val base = Paths.get(stateRoot, name)
      if (!Files.exists(base)) return
      val ls = Files.list(base)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v"))
          n.drop(1).toLongOption.filter(_ < keep).foreach(_ => deleteRecursively(p))
      } finally ls.close()
    }
    pruneBuckets("left", lv)
    pruneBuckets("right", rv)
    pruneScalar("ends")
    pruneScalar("emitted")
    pruneScalar("counts")
  }

  /** Process one micro-batch of new events; returns the emitted documents
    * (TxReplay.replay output schema), read back from their durable copy so
    * the result stays valid after state pruning. Call from `foreachBatch` —
    * or directly for deterministic batch-at-a-time testing (batchId then
    * defaults to the next sequential id).
    *
    * PER-BATCH COST SHAPE (round-6 rework): the only full-buffer work left
    * is the replay itself — which IS the micro-batch replay design. The
    * other per-batch jobs are delta- or dimension-sized:
    *  - completeness comes from the incremental `counts` state table
    *    ((tx_id, n_left, n_right), merged with the batch's delta counts —
    *    the reference's running per-tx counters,
    *    `WatermarkInjector.java:74-144`), not a re-aggregation of the
    *    buffered events;
    *  - dirty buckets come from the batch's new-event keys plus the keys of
    *    the documents just emitted (read back from the durable emitted
    *    output's key column), not from a full-buffer join against the
    *    reachable-tx set;
    *  - compaction reads ONLY the dirty buckets' state dirs (file-level
    *    pruning by construction), not a filter over the full union.
    * Keys that belong to an emitting tx but emit no document themselves
    * (right-only keys, empty-pair probes) are no longer compacted that
    * batch — their compaction defers to the next batch that dirties their
    * bucket, which is semantically free: replay's as-of max_by tolerates
    * superseded versions, and completeness no longer reads the buffer at
    * all. The buffers stay cache()d even though the replay is now their
    * only full-buffer consumer: the replay plan alone reads the union ~4×
    * (probes, header, lines), and every uncached read re-runs the upstream
    * micro-batch source too — measured same-boot at sf0.1/5 batches, the
    * uncached variant ran 3.1× SLOWER (687.6 s vs 218.9 s; SCALING.md r6).
    */
  def processBatch(newLeft: DataFrame, newRight: DataFrame,
                   newEnds: DataFrame, batchId: Long = -1L): DataFrame = {
    val left = unionWith(readBuckets("left", leftVer), newLeft).cache()
    val right = unionWith(readBuckets("right", rightVer), newRight).cache()
    val ends = unionWith(readScalar("ends"), newEnds).cache()

    // Incremental per-tx counts: previous counts state ⊎ this batch's delta.
    // A state root written before the counts table existed (version >= 0,
    // no counts dir) falls back to one full-buffer aggregation to seed it.
    val deltaCounts = newLeft.groupBy("tx_id").agg(count(lit(1)).as("n_left"))
      .join(newRight.groupBy("tx_id").agg(count(lit(1)).as("n_right")),
        Seq("tx_id"), "full")
      .na.fill(0L, Seq("n_left", "n_right"))
    val counts = (readScalar("counts") match {
      case Some(prev) => prev.unionByName(deltaCounts)
        .groupBy("tx_id")
        .agg(sum("n_left").as("n_left"), sum("n_right").as("n_right"))
      case None if version >= 0 => // migration: seed from the buffer once
        left.groupBy("tx_id").agg(count(lit(1)).as("n_left"))
          .join(right.groupBy("tx_id").agg(count(lit(1)).as("n_right")),
            Seq("tx_id"), "full")
          .na.fill(0L, Seq("n_left", "n_right"))
      case None => deltaCounts
    }).cache()

    // reachable txs from the counts state, with settled (already-emitted and
    // compacted) txs floored out — their shrunken buffers must not read as
    // "incomplete" and stall the watermark. cache(): consumed by the
    // watermark aggregate and the replay probes.
    val reach = TxReplay.txCompletenessFromCounts(counts, ends, watermark)
      .filter(col("reachable")).select("tx_id", "commit_lsn")
      .cache()
    try {
      val newWm = phased("watermark")(reach.agg(max("commit_lsn")).collect()(0)) match {
        case r if r.isNullAt(0) => watermark
        case r => math.max(r.getLong(0), watermark)
      }

      // one doc per (key, tx) not yet emitted in an earlier batch
      val emitted = TxReplay.replay(left, right, ends, watermark, Some(reach))

      val next = version + 1
      val thisBatch = if (batchId >= 0) batchId else committedBatch + 1
      // durability order: emitted docs + bucket state + ends first, manifest
      // (atomic move) last — a crash in between leaves the manifest at the
      // old version naming only old, fully-written dirs, and any half-written
      // v(next) output is overwritten on redelivery.
      phased("replay+emit")(
        emitted.write.mode(SaveMode.Overwrite).parquet(scalarDir("emitted", next)))

      // Dirty buckets = buckets of this batch's new events (delta-sized
      // scans) + buckets of the keys that just emitted (their history
      // shrinks under compaction — the set the reference's cleanupState
      // visits), read from the just-written durable output's key column.
      // ≤ 3·numBuckets ints collected in ONE job.
      val emittedKeys = spark.read.parquet(scalarDir("emitted", next))
        .select(bucketOf(col("key")).as("_b"), lit(2).as("_side"))
      val dirtyDf = newLeft.select(bucketOf(col("key")).as("_b"), lit(0).as("_side"))
        .union(newRight.select(bucketOf(col("key")).as("_b"), lit(1).as("_side")))
        .union(emittedKeys)
        .distinct()
      val dirtyRows = phased("dirty-scan")(dirtyDf.collect())
      val emittedB = dirtyRows.collect { case r if r.getInt(1) == 2 => r.getInt(0) }.toSet
      val dirtyLeft = dirtyRows.collect { case r if r.getInt(1) == 0 => r.getInt(0) }.toSet ++ emittedB
      val dirtyRight = dirtyRows.collect { case r if r.getInt(1) == 1 => r.getInt(0) }.toSet ++ emittedB

      // compaction (cleanupState), over the dirty buckets only — reading
      // exactly those buckets' state dirs plus the batch's own events (every
      // new event's bucket is dirty by construction): enrich to learn each
      // event's commit LSN; unfinished events (no END yet) stay raw in the
      // buffer. Untouched buckets keep their existing files — their events'
      // compaction is deferred to the batch that next dirties their bucket,
      // which changes nothing semantically: replay's as-of max_by tolerates
      // superseded versions, and settled txs are floored out of completeness
      // by the watermark.
      val endsKeyed = ends.select("tx_id", "commit_lsn")
      def split(ev: DataFrame, latestKeys: Seq[String]): DataFrame = {
        val enriched = ev.join(broadcast(endsKeyed), Seq("tx_id"))
        val unfinished = ev.join(broadcast(endsKeyed.select("tx_id")), Seq("tx_id"), "left_anti")
        val past = enriched.filter(col("commit_lsn") <= newWm)
        val latestPast = past
          .groupBy(latestKeys.map(col): _*)
          .agg(max_by(struct(ev.columns.map(col).toIndexedSeq: _*),
            struct(col("commit_lsn"), col("lsn"))).as("_keep"))
          .select(col("_keep.*"))
        val future = enriched.filter(col("commit_lsn") > newWm).select(ev.columns.map(col).toIndexedSeq: _*)
        latestPast.unionByName(future).unionByName(unfinished)
      }
      def dirtySlice(name: String, vers: Array[Long], dirtySet: Set[Int],
                     fresh: DataFrame): DataFrame = {
        val pruned = vers.zipWithIndex.map { case (v, b) =>
          if (dirtySet.contains(b)) v else -1L
        }
        unionWith(readBuckets(name, pruned), fresh)
      }
      val keepLeft = split(dirtySlice("left", leftVer, dirtyLeft, newLeft), Seq("key"))
      val keepRight = split(dirtySlice("right", rightVer, dirtyRight, newRight),
        Seq("key", "line_id"))

      val newLeftVer = phased("compact-left")(
        writeBuckets("left", keepLeft, dirtyLeft, leftVer, next))
      val newRightVer = phased("compact-right")(
        writeBuckets("right", keepRight, dirtyRight, rightVer, next))

      // Retain END rows referenced by ANY kept event — read the tx_id column
      // back from the NEW state table (the just-written dirty buckets plus
      // the untouched buckets' live files, a file-pruned single-column scan)
      // rather than recomputing both compaction plans. Untouched buckets'
      // deferred compaction needs its ENDs to learn commit LSNs; dropping
      // one would reclassify its events as unfinished and stall the
      // watermark. Plus ENDs not yet emitted.
      val referenced = (readBuckets("left", newLeftVer) ++ readBuckets("right", newRightVer))
        .map(_.select("tx_id"))
        .reduceOption(_ union _)
      val keepEnds = referenced
        .map(ref => ends.join(ref.distinct(), Seq("tx_id"), "left_semi"))
        .getOrElse(ends.filter(lit(false)))
        .unionByName(ends.filter(col("commit_lsn") > newWm))
        .dropDuplicates("tx_id")
      phased("keep-ends")(
        keepEnds.write.mode(SaveMode.Overwrite).parquet(scalarDir("ends", next)))
      // Persist the per-tx counts for the next batch's completeness, minus
      // settled txs (their counts can never be consulted again: the floor
      // excludes them from both the stall rule and reachability).
      phased("keep-counts")(
        counts.join(ends.filter(col("commit_lsn") <= newWm).select("tx_id"),
            Seq("tx_id"), "left_anti")
          .write.mode(SaveMode.Overwrite).parquet(scalarDir("counts", next)))
      commitManifest(next, newWm, thisBatch, newLeftVer, newRightVer)
      version = next
      watermark = newWm
      committedBatch = thisBatch
      leftVer = newLeftVer
      rightVer = newRightVer
      prune(newLeftVer, newRightVer, next)
      spark.read.parquet(scalarDir("emitted", next))
    } finally {
      reach.unpersist()
      counts.unpersist()
      left.unpersist()
      right.unpersist()
      ends.unpersist()
    }
  }

  /** Current watermark (largest emitted commit LSN; MinValue before any). */
  def currentWatermark: Long = watermark

  /** Last micro-batch id whose state+output are durably committed. */
  def lastCommittedBatch: Long = committedBatch

  /** Number of state buckets in effect (manifest's on resume). */
  def bucketCount: Int = buckets

  /** The committed output of the newest processed batch — what a restarted
    * query must redeliver when Structured Streaming re-runs a batch the
    * engine already committed but the sink did not.
    */
  def lastEmitted: DataFrame = {
    require(version >= 0, "no batch committed yet")
    spark.read.parquet(scalarDir("emitted", version))
  }
}

object TxReplayStream {

  /** Wire the replay engine into a Structured Streaming query: one unioned
    * input stream (left/right/END events discriminated by `stream` ∈
    * {"l","r","t"} over the TxReplay column contracts, unused columns null),
    * split per micro-batch, replayed, and emitted docs handed to `onEmit`
    * (a Kafka writer in production; a sink table in tests). Returns the
    * started query.
    *
    * Restart semantics: on a redelivered batch (id == the engine's committed
    * batch) the engine is NOT re-run — the durably persisted output of that
    * batch is handed to `onEmit` again, so the sink sees the batch's docs
    * exactly as first produced (at-least-once delivery to the sink; combined
    * with an idempotent/upsert sink this is end-to-end exactly-once). Batches
    * below the committed id were already delivered AND committed downstream
    * (foreachBatch only replays the newest uncommitted batch) and are
    * ignored.
    */
  def attach(unioned: DataFrame, stateRoot: String, checkpoint: String)
            (onEmit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val engine = new TxReplayStream(unioned.sparkSession, stateRoot)
    unioned.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Continuity check: batch ids must line up with the manifest. A
        // mismatch beyond committed+1 means the CHECKPOINT and the engine's
        // STATE ROOT belong to different query incarnations (one was wiped
        // or swapped) — skipping or substituting batches there would
        // silently drop new data, so fail loudly instead.
        require(batchId <= engine.lastCommittedBatch + 1,
          s"batch $batchId arrived but the state manifest committed only up to " +
            s"${engine.lastCommittedBatch}: checkpoint ($checkpoint) and state " +
            s"root ($stateRoot) are from different query incarnations")
        if (batchId < engine.lastCommittedBatch) {
          // already processed and delivered in a previous incarnation
        } else if (batchId == engine.lastCommittedBatch) {
          onEmit(engine.lastEmitted, batchId) // redeliver committed output
        } else {
          val left = batch.filter(col("stream") === "l")
            .select("key", "op", "lsn", "tx_id", "row")
          val right = batch.filter(col("stream") === "r")
            .select("key", "line_id", "op", "lsn", "tx_id", "row")
          val ends = batch.filter(col("stream") === "t")
            .select("tx_id", "commit_lsn", "expected_left", "expected_right")
          onEmit(engine.processBatch(left, right, ends, batchId), batchId)
        }
      }
      .start()
  }
}
