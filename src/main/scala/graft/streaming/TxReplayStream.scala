package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tx.TxReplay

/** Streaming execution of the transactionally consistent join+aggregation:
  * the micro-batch LSN-ordered replay design (SURVEY §7.3 path (a)).
  *
  * Each micro-batch contributes new left/right change events and tx END
  * events. The engine buffers them (versioned parquet state dirs — the
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
  * RESTART/RECOVERY: scalar progress (state version, watermark, last
  * committed batch id) is persisted in `stateRoot/MANIFEST`, written via
  * tmp-file + atomic rename AFTER the batch's state and emitted docs are
  * durable — the parquet-state analogue of the reference's checkpointed
  * operator state. A fresh instance over the same `stateRoot` resumes from
  * the manifest; [[attach]] skips micro-batches at-or-below the committed
  * batch id and REDELIVERS the committed batch's persisted output (Structured
  * Streaming re-runs the last batch whose sink didn't commit), so a restart
  * neither loses nor double-emits documents. Superseded `v*` state dirs are
  * pruned once the manifest points past them.
  *
  * Scale: state lives in parquet partitions, all operations are the same
  * keyed shuffles as the batch replay; the driver holds only the watermark
  * scalar and batch counter (orchestration state, like any streaming
  * engine's). Per-batch replay cost is bounded by the compacted buffer, not
  * the full history.
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
class TxReplayStream(spark: SparkSession, stateRoot: String) {

  private def dir(version: Long, name: String) = s"$stateRoot/v$version/$name"
  private val manifestPath = Paths.get(stateRoot, "MANIFEST")

  private def readState(version: Long, name: String): Option[DataFrame] = {
    val p = dir(version, name)
    if (Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }

  private def unionWith(state: Option[DataFrame], fresh: DataFrame): DataFrame =
    state.map(_.unionByName(fresh)).getOrElse(fresh)

  @volatile private var version: Long = -1
  @volatile private var watermark: Long = Long.MinValue
  @volatile private var committedBatch: Long = -1

  // Recover scalar progress from the manifest (crash/restart path): the
  // manifest is only ever moved into place after its version's state dirs
  // are fully written, so whatever it names is safe to resume from.
  if (Files.exists(manifestPath)) {
    val Array(v, w, b) = Files.readString(manifestPath).trim.split(" ")
    version = v.toLong
    watermark = w.toLong
    committedBatch = b.toLong
  }

  private def commitManifest(v: Long, w: Long, b: Long): Unit = {
    val tmp = Paths.get(stateRoot, ".MANIFEST.tmp")
    Files.createDirectories(Paths.get(stateRoot))
    Files.writeString(tmp, s"$v $w $b")
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

  /** Drop every state version below `keep` — they are unreachable once the
    * manifest points at `keep` (the current batch reads only `v$keep`).
    */
  private def pruneBelow(keep: Long): Unit = {
    val root = Paths.get(stateRoot)
    if (Files.exists(root)) {
      val ls = Files.list(root)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        // toLongOption: a stray non-state entry (e.g. a dir named just "v",
        // or digits overflowing Long) must not kill the streaming query
        if (n.startsWith("v"))
          n.drop(1).toLongOption.filter(_ < keep).foreach(_ => deleteRecursively(p))
      } finally ls.close()
    }
  }

  /** Process one micro-batch of new events; returns the emitted documents
    * (TxReplay.replay output schema), read back from their durable copy so
    * the result stays valid after state pruning. Call from `foreachBatch` —
    * or directly for deterministic batch-at-a-time testing (batchId then
    * defaults to the next sequential id).
    */
  def processBatch(newLeft: DataFrame, newRight: DataFrame,
                   newEnds: DataFrame, batchId: Long = -1L): DataFrame = {
    val left = unionWith(readState(version, "left"), newLeft)
    val right = unionWith(readState(version, "right"), newRight)
    val ends = unionWith(readState(version, "ends"), newEnds)

    // reachable txs over the buffer, with settled (already-emitted and
    // compacted) txs floored out — their shrunken buffers must not read as
    // "incomplete" and stall the watermark
    val reach = TxReplay.txCompleteness(left, right, ends, watermark)
      .filter(col("reachable"))
    val newWm = reach.agg(max("commit_lsn")).collect()(0) match {
      case r if r.isNullAt(0) => watermark
      case r => math.max(r.getLong(0), watermark)
    }

    // one doc per (key, tx) not yet emitted in an earlier batch
    val emitted = TxReplay.replay(left, right, ends, watermark)

    // compaction (cleanupState): enrich to learn each event's commit LSN;
    // unfinished events (no END yet) stay raw in the buffer
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
    val keepLeft = split(left, Seq("key"))
    val keepRight = split(right, Seq("key", "line_id"))
    // retain END rows still referenced by kept events or not yet emitted
    val referenced = keepLeft.select("tx_id").union(keepRight.select("tx_id")).distinct()
    val keepEnds = ends.join(referenced, Seq("tx_id"), "left_semi")
      .unionByName(ends.filter(col("commit_lsn") > newWm))
      .dropDuplicates("tx_id")

    val next = version + 1
    val thisBatch = if (batchId >= 0) batchId else committedBatch + 1
    // durability order: state + emitted docs first, manifest (atomic move)
    // last — a crash in between leaves the manifest at the old version with
    // the old dirs intact, and the half-written v(next) is overwritten on
    // redelivery.
    emitted.write.mode(SaveMode.Overwrite).parquet(dir(next, "emitted"))
    keepLeft.write.mode(SaveMode.Overwrite).parquet(dir(next, "left"))
    keepRight.write.mode(SaveMode.Overwrite).parquet(dir(next, "right"))
    keepEnds.write.mode(SaveMode.Overwrite).parquet(dir(next, "ends"))
    commitManifest(next, newWm, thisBatch)
    version = next
    watermark = newWm
    committedBatch = thisBatch
    pruneBelow(next)
    spark.read.parquet(dir(next, "emitted"))
  }

  /** Current watermark (largest emitted commit LSN; MinValue before any). */
  def currentWatermark: Long = watermark

  /** Last micro-batch id whose state+output are durably committed. */
  def lastCommittedBatch: Long = committedBatch

  /** The committed output of the newest processed batch — what a restarted
    * query must redeliver when Structured Streaming re-runs a batch the
    * engine already committed but the sink did not.
    */
  def lastEmitted: DataFrame = {
    require(version >= 0, "no batch committed yet")
    spark.read.parquet(dir(version, "emitted"))
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
