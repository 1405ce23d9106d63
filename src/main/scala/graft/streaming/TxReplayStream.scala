package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

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
  * INCREMENTAL STATE — LOG-STRUCTURED SEGMENTS (round-6 design): event state
  * is hash-bucketed by key — `pmod(hash(key), numBuckets)` — and each bucket
  * holds an ordered LIST of immutable parquet segments. A micro-batch
  * APPENDS one delta-sized segment per side (only this batch's new events);
  * a bucket is COMPACTED — all its segments plus the batch's fresh events
  * rewritten as one segment through the reference's `cleanupState` rule —
  * once its segment count reaches `compactSegments` (from the segment
  * table alone, dirty or not — compaction is semantically free anytime,
  * and an at-threshold bucket pays the identical rewrite on its next dirty
  * batch anyway; this is what lets the appends' staged-bucket set BE the
  * batch's dirty set, with no dedicated dirty-scan job). So per-batch write
  * cost is O(delta) every batch, and the full compaction cost is amortized
  * 1/compactSegments per bucket — the parquet analogue of an LSM / state
  * store, and of ListState's O(delta) updates
  * (`TxAware…Operator.java:432-444`). Deferred compaction is semantically
  * free: replay's as-of `max_by` tolerates superseded versions, settled txs
  * are floored out of completeness by the watermark, and the END-retention
  * rule below keeps the enrichment rows deferred buckets still need. The
  * bucket function must be stable across restarts (state outlives the JVM):
  * Spark's `hash()` is murmur3 with a fixed seed, stable across sessions
  * and cluster layouts.
  *
  * Replay still READS the full segment set each batch — that is the
  * micro-batch replay design itself — but as a parallel column-pruned SCAN
  * only: the replay runs with `broadcastProbes` (probes are trigger-bounded
  * delta), so the buffer is never shuffled and every exchange in the
  * per-batch plan is delta-sized. Completeness never reads the buffer
  * either: a small `counts` state table ((tx_id, n_left, n_right), one row
  * per live tx, settled rows dropped) is merged with each batch's delta
  * counts — the analogue of the reference's running per-tx counters
  * (`WatermarkInjector.java:74-144`, O(delta) per event, never a rescan).
  * END retention: on append-only batches the whole (small) END table
  * carries over unchanged — no scan; on batches that compacted something,
  * ENDs referenced by any kept event (a file-pruned single-column scan of
  * the new segment set) plus all not-yet-settled ENDs are retained, so the
  * scan amortizes with compaction. Independent per-batch writes (left/right
  * append segments, counts) run CONCURRENTLY with the replay — Spark
  * schedules their small jobs onto idle cores.
  *
  * RESTART/RECOVERY: scalar progress (state version, watermark, last
  * committed batch id, bucket count) plus the per-bucket live-segment table
  * is persisted in `stateRoot/MANIFEST`, written via tmp-file + atomic
  * rename AFTER the batch's state and emitted docs are durable — the
  * parquet-state analogue of the reference's checkpointed operator state. A
  * fresh instance over the same `stateRoot` resumes from the manifest;
  * [[TxReplayStream.attach]] skips micro-batches at-or-below the committed
  * batch id and REDELIVERS the committed batch's persisted output
  * (Structured Streaming re-runs the last batch whose sink didn't commit),
  * so a restart neither loses nor double-emits documents. Segment dirs not
  * named by the committed manifest are pruned; a crash mid-batch leaves the
  * old manifest naming only fully-written old dirs, and the half-written
  * next version is overwritten on redelivery.
  *
  * Scale: state lives in parquet partitions, all operations are the same
  * keyed shuffles as the batch replay; the driver holds only the watermark
  * scalar, batch counter, and the numBuckets-sized segment table
  * (orchestration state, like any streaming engine's). Per-batch replay
  * cost is bounded by the compacted buffer scan, per-batch WRITE cost by
  * the batch's delta.
  *
  * RELATION TO THE `transformWithState` DESIGN ([[TxReplayNative]], design
  * (b) of SURVEY §7.3 — now also implemented): the contiguous commit-LSN
  * watermark is a GLOBAL property — tx L may only emit when every tx with a
  * smaller commit LSN is complete — and a keyed `StatefulProcessor` sees
  * one key's slice of the world. The reference solves this with machinery
  * Spark deliberately lacks — a custom watermark TYPE broadcast in-band,
  * injected at parallelism 1 (`WatermarkInjector`; poc.md:264-266). This
  * engine's answer is the micro-batch boundary itself: within a batch,
  * completeness and the stall point are plain aggregates over buffered
  * state, and the per-LSN ordered flush is a deterministic bounded replay.
  * [[TxReplayNative]]'s answer is the reference's own: an explicit
  * parallelism-1 metadata sequencer stage between fully key-parallel
  * stateful operators, with per-key ListState buffers in the RocksDB state
  * store and per-event-shaped incremental work. Trade-off: this engine
  * re-plans and re-scans the buffer each batch but owns its state layout
  * (bucketed parquet, LSM segments); the native engine does delta-only
  * work per batch but pays the state-store encoder boundary per row and
  * routes tx metadata through one sequencer key. Both produce the same
  * emission sequence (TxReplayNativeSpec). The per-key halves that are
  * expressible as standalone keyed processors (commit-LSN fixing,
  * keep-latest, TOAST latching) live in [[Stateful]].
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
class TxReplayStream(spark: SparkSession, stateRoot: String,
                     numBuckets: Int = 16, compactSegments: Int = 4,
                     evictAfterBatches: Option[Int] = None) {
  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
  require(compactSegments > 0, s"compactSegments must be positive, got $compactSegments")
  require(evictAfterBatches.forall(_ > 0), "evictAfterBatches must be positive")

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
  // live segment versions per bucket, oldest first; empty = no data
  private var leftSegs: Array[List[Long]] = Array.fill(numBuckets)(Nil)
  private var rightSegs: Array[List[Long]] = Array.fill(numBuckets)(Nil)

  // Recover progress from the manifest (crash/restart path): the manifest is
  // only ever moved into place after its version's state dirs are fully
  // written, so whatever it names is safe to resume from. Bucket entries are
  // comma-joined segment lists ("-1" = empty); a pre-segment manifest's
  // single-version entries parse as one-element lists.
  if (Files.exists(manifestPath)) {
    val lines = Files.readAllLines(manifestPath)
    require(lines.size >= 3, s"corrupt state manifest at $manifestPath")
    val Array(v, w, b, nb) = lines.get(0).trim.split(" ")
    version = v.toLong
    watermark = w.toLong
    committedBatch = b.toLong
    buckets = nb.toInt
    def parseSegs(line: String): Array[List[Long]] =
      line.trim.split(" ").map(_.split(",").map(_.toLong).filter(_ >= 0).toList)
    leftSegs = parseSegs(lines.get(1))
    rightSegs = parseSegs(lines.get(2))
    require(leftSegs.length == buckets && rightSegs.length == buckets,
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

  private def readSegs(name: String, segs: Array[List[Long]]): Option[DataFrame] = {
    val paths = segs.zipWithIndex.flatMap { case (vs, b) => vs.map(bucketDir(name, b, _)) }
    if (paths.isEmpty) None else Some(spark.read.parquet(paths.toIndexedSeq: _*))
  }

  private def readScalar(name: String): Option[DataFrame] = {
    val p = scalarDir(name, version)
    if (version >= 0 && Files.exists(Paths.get(p))) Some(spark.read.parquet(p)) else None
  }

  private def unionWith(state: Option[DataFrame], fresh: DataFrame): DataFrame =
    state.map(_.unionByName(fresh)).getOrElse(fresh)

  private def commitManifest(v: Long, w: Long, b: Long,
                             ls: Array[List[Long]], rs: Array[List[Long]]): Unit = {
    val tmp = Paths.get(stateRoot, ".MANIFEST.tmp")
    Files.createDirectories(Paths.get(stateRoot))
    def fmt(segs: Array[List[Long]]): String =
      segs.map(l => if (l.isEmpty) "-1" else l.mkString(",")).mkString(" ")
    Files.writeString(tmp, s"$v $w $b $buckets\n${fmt(ls)}\n${fmt(rs)}")
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

  /** Write `df`'s rows for `targets` buckets as one segment dir per bucket
    * at version `next`: ONE partitioned write job into a staging dir, then a
    * per-bucket atomic-ish move into `name/b<i>/v<next>` (a rename on every
    * real filesystem — no second data pass). The repartition on the bucket
    * id lands each bucket in exactly one task → ONE file per bucket dir;
    * without it every shuffle task writes its own sliver of every bucket
    * and later batches pay per-file scan overhead. Returns the buckets that
    * produced a segment (a target whose rows compacted/filtered to zero
    * produces none).
    */
  private def writeSegments(name: String, df: DataFrame, targets: Set[Int],
                            next: Long, tag: String): Set[Int] = {
    if (targets.isEmpty) return Set.empty
    val stage = Paths.get(s"$stateRoot/$name/.stage-$tag-v$next")
    deleteRecursively(stage)
    // partition count capped at the session's shuffle parallelism: appends
    // pass ~all buckets as `targets` whatever the delta touches, and with a
    // large bucket count an uncapped repartition would launch that many
    // mostly-empty write tasks per batch. partitionBy("_b") still yields one
    // dir per touched bucket; staged-set discovery tolerates empty buckets.
    val parts = math.max(1, math.min(targets.size,
      df.sparkSession.sessionState.conf.numShufflePartitions))
    df.withColumn("_b", bucketOf(col("key")))
      .repartition(parts, col("_b"))
      .write.partitionBy("_b").mode(SaveMode.Overwrite).parquet(stage.toString)
    val staged = targets.filter(b => Files.exists(stage.resolve(s"_b=$b")))
    staged.foreach { b =>
      val target = Paths.get(bucketDir(name, b, next))
      deleteRecursively(target) // leftovers from a crashed attempt at `next`
      Files.createDirectories(target.getParent)
      Files.move(stage.resolve(s"_b=$b"), target)
    }
    deleteRecursively(stage)
    staged
  }

  /** Drop state files unreachable from the committed manifest: segment dirs
    * not in their bucket's live list, leftover staging dirs, and scalar
    * (ends/emitted/counts) versions below the current.
    */
  private def prune(ls: Array[List[Long]], rs: Array[List[Long]], keep: Long): Unit = {
    def pruneBuckets(name: String, segs: Array[List[Long]]): Unit = {
      val base = Paths.get(stateRoot, name)
      if (!Files.exists(base)) return
      val ls0 = Files.list(base)
      try ls0.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".stage")) deleteRecursively(p)
        else if (n.startsWith("b")) n.drop(1).toIntOption.foreach { b =>
          val live = if (b < segs.length) segs(b).toSet else Set.empty[Long]
          val vls = Files.list(p)
          try vls.forEach { vp =>
            val vn = vp.getFileName.toString
            // toLongOption: a stray non-state entry must not kill the query
            if (vn.startsWith("v"))
              vn.drop(1).toLongOption.filterNot(live.contains).foreach(_ => deleteRecursively(vp))
          } finally vls.close()
        }
      } finally ls0.close()
    }
    def pruneScalar(name: String): Unit = {
      val base = Paths.get(stateRoot, name)
      if (!Files.exists(base)) return
      val ls0 = Files.list(base)
      try ls0.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v"))
          n.drop(1).toLongOption.filter(_ < keep).foreach(_ => deleteRecursively(p))
      } finally ls0.close()
    }
    pruneBuckets("left", ls)
    pruneBuckets("right", rs)
    pruneScalar("ends")
    pruneScalar("emitted")
    pruneScalar("counts")
    pruneScalar("evicted")
  }

  /** Process one micro-batch of new events; returns the emitted documents
    * (TxReplay.replay output schema), read back from their durable copy so
    * the result stays valid after state pruning. Call from `foreachBatch` —
    * or directly for deterministic batch-at-a-time testing (batchId then
    * defaults to the next sequential id).
    *
    * PER-BATCH COST SHAPE (round-6 LSM rework + round-7 fold): the only
    * full-buffer work left is the replay's SCAN — which is the micro-batch
    * replay design. Everything else is delta- or dimension-sized:
    *  - completeness comes from the incremental `counts` state table, not a
    *    re-aggregation of the buffered events;
    *  - state writes are append segments holding only this batch's events,
    *    started as soon as the deltas are cached; the buckets that staged a
    *    segment ARE the dirty set, so no dedicated dirty-scan job exists
    *    (compaction targets come from the segment table alone — see the
    *    class doc);
    *  - the replay runs with `broadcastProbes`: the buffered state is never
    *    shuffled, every exchange is delta-sized;
    *  - END retention is a no-scan carry-over on append-only batches;
    *  - appends, compactions, and the counts write all run concurrently
    *    with the replay (appends and compactions target disjoint buckets).
    */
  def processBatch(newLeft0: DataFrame, newRight0: DataFrame,
                   newEnds: DataFrame, batchId: Long = -1L): DataFrame = {
    // cache the DELTAS: each is consumed ~4× per batch (counts, append
    // segment, compaction input, replay union), and in `attach` streaming use every
    // uncached read re-runs the upstream micro-batch source. The full state
    // union is NOT cached — its only consumer is the replay (two scans per
    // side), and a parquet re-scan of the segment files beat paying an
    // InMemoryRelation materialization pass each batch (part of the
    // 37.4 s → 32.6 s same-boot step in SCALING.md's r6 table).
    val newLeft = newLeft0.cache()
    val newRight = newRight0.cache()
    val left = unionWith(readSegs("left", leftSegs), newLeft)
    val right = unionWith(readSegs("right", rightSegs), newRight)
    val ends = unionWith(readScalar("ends"), newEnds).dropDuplicates("tx_id").cache()

    // No dedicated dirty-scan job (round-7 fold): compaction targets come
    // from the SEGMENT TABLE alone — any bucket at the `compactSegments`
    // threshold compacts this batch, dirty or not (compaction is
    // semantically free anytime, and an at-threshold bucket would pay the
    // identical rewrite on its next dirty batch anyway) — and the appends'
    // dirty set is discovered by the append write itself (writeSegments
    // returns the staged buckets). Appends and compactions target DISJOINT
    // buckets, so both land at one new version; append jobs start
    // IMMEDIATELY — they need only the delta — and run under the
    // eviction/watermark work, compactions (which need the new watermark)
    // join them concurrently with the replay. Emitting keys' buckets are
    // NOT compacted on emission — their settled history is reclaimed at the
    // bucket's next size-triggered compaction (see class doc).
    val vNext = version + 1
    val allBuckets = (0 until buckets).toSet
    val compactLeftT = allBuckets.filter(b => leftSegs(b).size >= compactSegments)
    val compactRightT = allBuckets.filter(b => rightSegs(b).size >= compactSegments)
    val appendLeftF = Future(phased("append-left")(
      writeSegments("left", newLeft.filter(!inBuckets(compactLeftT)),
        allBuckets -- compactLeftT, vNext, "app")))
    val appendRightF = Future(phased("append-right")(
      writeSegments("right", newRight.filter(!inBuckets(compactRightT)),
        allBuckets -- compactRightT, vNext, "app")))

    val thisBatch = if (batchId >= 0) batchId else committedBatch + 1

    // Incremental per-tx counts: previous counts state ⊎ this batch's delta,
    // folded in ONE partial-aggregated exchange (per-event unit rows merge
    // map-side with the carried counts — no per-side pre-aggregation or
    // join). A state root written before the counts table existed
    // (version >= 0, no counts dir) falls back to one full-buffer
    // aggregation to seed it. `first_b` is the eviction clock: the first
    // batch that sighted the tx (min-merged; END rows contribute 0 counts
    // but start the clock for END-only transactions). A pre-clock counts
    // state reads as first-seen-now — eviction ages restart, never jump.
    def unit(df: DataFrame, l: Long, r: Long): DataFrame =
      df.select(col("tx_id"), lit(l).as("n_left"), lit(r).as("n_right"),
        lit(thisBatch).as("first_b"))
    val unitCounts = unit(newLeft, 1L, 0L)
      .unionByName(unit(newRight, 0L, 1L))
      .unionByName(unit(newEnds, 0L, 0L))
    val countRows = readScalar("counts") match {
      case Some(prev) if prev.columns.contains("first_b") => prev.unionByName(unitCounts)
      case Some(prev) =>
        prev.withColumn("first_b", lit(thisBatch)).unionByName(unitCounts)
      case None if version >= 0 => // migration: seed from the buffer once
        unit(left, 1L, 0L).unionByName(unit(right, 0L, 1L)).unionByName(unit(ends, 0L, 0L))
      case None => unitCounts
    }
    val counts = countRows
      .groupBy("tx_id")
      .agg(sum("n_left").as("n_left"), sum("n_right").as("n_right"),
        min("first_b").as("first_b"))
      .cache()

    try {
      // Stall-timeout eviction (opt-in): transactions still incomplete
      // `evictAfterBatches` batches after first sighting are abandoned —
      // removed from completeness (the watermark advances past them) and
      // anti-joined out of every read path, so their partial events are
      // never applied and vanish at the next compaction. The id list is
      // driver-collected (evictions are rare, ids are 8 bytes) and
      // persisted per version; it must persist for the query's lifetime —
      // an evicted tx's late stragglers keep entering append segments and
      // are re-filtered on every read.
      val prevEvicted: Array[Long] = readScalar("evicted")
        .map(_.collect().map(_.getLong(0))).getOrElse(Array.empty)
      val newlyEvicted: Array[Long] = evictAfterBatches match {
        case None => Array.empty
        case Some(n) =>
          val oldEnough = col("first_b") <= lit(thisBatch - n)
          val ends1 =
            if (prevEvicted.isEmpty) ends
            else ends.filter(!col("tx_id").isInCollection(prevEvicted.toSeq))
          val annStale = ends1.join(counts, Seq("tx_id"), "left")
            .filter(col("commit_lsn") > lit(watermark) &&
              !(coalesce(col("n_left"), lit(0L)) === col("expected_left") &&
                coalesce(col("n_right"), lit(0L)) === col("expected_right")) &&
              coalesce(col("first_b"), lit(thisBatch)) <= lit(thisBatch - n))
            .select("tx_id")
          val unannStale = counts
            .join(ends.select("tx_id"), Seq("tx_id"), "left_anti")
            .filter(oldEnough).select("tx_id")
          phased("evict-scan")(
            annStale.unionByName(unannStale).distinct().collect().map(_.getLong(0)))
      }
      if (newlyEvicted.nonEmpty)
        // loud by design: every eviction is data loss a human accepted by
        // configuring the timeout — it must be traceable, never silent
        System.err.println(s"[TxReplayStream] batch $thisBatch EVICTED stalled " +
          s"transactions ${newlyEvicted.sorted.mkString(", ")} (incomplete after " +
          s"${evictAfterBatches.get} batches); their partial events will never apply")
      val evicted: Array[Long] = (prevEvicted ++ newlyEvicted).distinct
      def exceptEvicted(df: DataFrame): DataFrame =
        if (evicted.isEmpty) df
        else df.filter(!col("tx_id").isInCollection(evicted.toSeq))
      val ends2 = exceptEvicted(ends)
      val left2 = exceptEvicted(left)
      val right2 = exceptEvicted(right)

      // reachable txs from the counts state, with settled (already-emitted
      // and compacted) txs floored out — their shrunken buffers must not
      // read as "incomplete" and stall the watermark. COLLECTED: the replay
      // broadcasts this set into its probe joins anyway (a broadcast IS a
      // driver collect), so materializing it driver-side adds no scale
      // constraint. ONE job: collect (lsn, complete) for every unsettled
      // announced tx and derive the stall point, reachability, and the new
      // watermark in plain Scala — running the stall-min as its own
      // aggregate feeding crossJoin(broadcast(stall)) (the
      // txCompletenessFromCounts shape) evaluated the uncached ends⋈counts
      // join twice and launched an extra job per batch.
      val flaggedRows = phased("watermark")(
        ends2.filter(col("commit_lsn") > lit(watermark))
          .join(counts, Seq("tx_id"), "left")
          .select(col("tx_id"), col("commit_lsn"),
            (coalesce(col("n_left"), lit(0L)) === col("expected_left") &&
              coalesce(col("n_right"), lit(0L)) === col("expected_right")).as("complete"))
          .collect())
      val stallLsn = {
        val it = flaggedRows.iterator.filter(!_.getBoolean(2)).map(_.getLong(1))
        if (it.hasNext) it.min else Long.MaxValue
      }
      val reachRows = flaggedRows
        .filter(r => r.getBoolean(2) && r.getLong(1) < stallLsn)
        .map(r => org.apache.spark.sql.Row(r.getLong(0), r.getLong(1)))
      val newWm =
        if (reachRows.isEmpty) watermark
        else math.max(reachRows.iterator.map(_.getLong(1)).max, watermark)
      val reachSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tx_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("commit_lsn", org.apache.spark.sql.types.LongType)))
      val reach = spark.createDataFrame(
        java.util.Arrays.asList(reachRows: _*), reachSchema)

      // Persist the per-tx counts for the next batch's completeness, minus
      // settled txs (their counts can never be consulted again: the floor
      // excludes them from both the stall rule and reachability).
      val countsF = Future(phased("keep-counts")(
        exceptEvicted(
          counts.join(ends2.filter(col("commit_lsn") <= newWm).select("tx_id"),
            Seq("tx_id"), "left_anti"))
          .write.mode(SaveMode.Overwrite).parquet(scalarDir("counts", vNext))))
      // the evicted list rides the same versioned-scalar scheme; written
      // whenever the feature is on or a list already exists
      val evictedF =
        if (evictAfterBatches.isEmpty && evicted.isEmpty) None
        else Some(Future(phased("keep-evicted")(
          spark.createDataFrame(
            java.util.Arrays.asList(evicted.map(org.apache.spark.sql.Row(_)): _*),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("tx_id",
                org.apache.spark.sql.types.LongType))))
            .write.mode(SaveMode.Overwrite).parquet(scalarDir("evicted", vNext)))))

      // compaction (cleanupState) for the size-triggered buckets only.
      // Appends and compactions are DISJOINT and unchained: the append jobs
      // exclude compacting buckets (`newLeft.filter(!inBuckets(...))`), and
      // a compacting bucket's input is its old segments plus its share of
      // the CACHED delta read directly (`fresh.filter(inBuckets(compact))`)
      // — no dependency on the append write, both run concurrently with
      // the replay. Enrich to learn each event's commit LSN; unfinished
      // events (no END yet) stay raw in the buffer.
      val endsKeyed = ends2.select("tx_id", "commit_lsn")
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
      def compactInput(name: String, segs: Array[List[Long]], compact: Set[Int],
                       fresh: DataFrame): DataFrame = {
        val pruned = segs.zipWithIndex.map { case (vs, b) =>
          if (compact.contains(b)) vs else Nil
        }
        // evicted txs' events leave the buffer here, at their bucket's
        // next compaction — never applied, reclaimed without a dedicated pass
        exceptEvicted(unionWith(readSegs(name, pruned), fresh.filter(inBuckets(compact))))
      }
      val compactLeftF = Future(phased("compact-left")(
        writeSegments("left",
          split(compactInput("left", leftSegs, compactLeftT, newLeft), Seq("key")),
          compactLeftT, vNext, "cmp")))
      val compactRightF = Future(phased("compact-right")(
        writeSegments("right",
          split(compactInput("right", rightSegs, compactRightT, newRight),
            Seq("key", "line_id")),
          compactRightT, vNext, "cmp")))

      // one doc per (key, tx) not yet emitted in an earlier batch; durability
      // order: emitted docs + bucket state + ends first, manifest (atomic
      // move) last — a crash in between leaves the manifest at the old
      // version naming only old, fully-written dirs, and any half-written
      // v(next) output is overwritten on redelivery.
      // Nothing reachable (stalled or idle batch) → nothing can emit: skip
      // the replay's jobs entirely and persist an empty output (the schema
      // comes from plan ANALYSIS only — no execution).
      val replayPlan = TxReplay.replay(left2, right2, ends2, watermark, Some(reach),
        broadcastProbes = true)
      val emitted =
        if (reachRows.isEmpty)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            replayPlan.schema)
        else replayPlan
      phased("replay+emit")(
        emitted.write.mode(SaveMode.Overwrite).parquet(scalarDir("emitted", vNext)))

      val appLeft = Await.result(appendLeftF, Duration.Inf)
      val appRight = Await.result(appendRightF, Duration.Inf)
      val cmpLeft = Await.result(compactLeftF, Duration.Inf)
      val cmpRight = Await.result(compactRightF, Duration.Inf)
      Await.result(countsF, Duration.Inf)
      evictedF.foreach(Await.result(_, Duration.Inf))
      def updated(segs: Array[List[Long]], appended: Set[Int], targets: Set[Int],
                  compacted: Set[Int]): Array[List[Long]] =
        segs.zipWithIndex.map { case (vs, b) =>
          if (targets.contains(b)) { if (compacted.contains(b)) List(vNext) else Nil }
          else if (appended.contains(b)) vs :+ vNext
          else vs
        }
      val newLeftSegs = updated(leftSegs, appLeft, compactLeftT, cmpLeft)
      val newRightSegs = updated(rightSegs, appRight, compactRightT, cmpRight)

      // END retention. Append-only batch: every previously retained END is
      // still referenced (no event left the buffer), so the END table
      // carries over as-is — zero scans. Compacting batch: retain ENDs
      // referenced by ANY kept event — the tx_id column of the NEW segment
      // set (the just-written segments plus untouched buckets' live files, a
      // file-pruned single-column scan) — plus all ENDs not yet settled.
      // Deferred buckets need their settled ENDs to learn commit LSNs at
      // their eventual compaction; dropping one would reclassify its events
      // as unfinished and stall the watermark.
      val keepEnds =
        if (compactLeftT.isEmpty && compactRightT.isEmpty) ends2
        else {
          val referenced = (readSegs("left", newLeftSegs) ++ readSegs("right", newRightSegs))
            .map(_.select("tx_id"))
            .reduceOption(_ union _)
          referenced
            .map(ref => ends2.join(ref.distinct(), Seq("tx_id"), "left_semi"))
            .getOrElse(ends2.filter(lit(false)))
            .unionByName(ends2.filter(col("commit_lsn") > newWm))
            .dropDuplicates("tx_id")
        }
      phased("keep-ends")(
        keepEnds.write.mode(SaveMode.Overwrite).parquet(scalarDir("ends", vNext)))

      commitManifest(vNext, newWm, thisBatch, newLeftSegs, newRightSegs)
      version = vNext
      watermark = newWm
      committedBatch = thisBatch
      leftSegs = newLeftSegs
      rightSegs = newRightSegs
      prune(newLeftSegs, newRightSegs, vNext)
      spark.read.parquet(scalarDir("emitted", vNext))
    } finally {
      counts.unpersist()
      newLeft.unpersist()
      newRight.unpersist()
      ends.unpersist()
    }
  }

  /** Current watermark (largest emitted commit LSN; MinValue before any). */
  def currentWatermark: Long = watermark

  /** Transactions evicted by the stall timeout over this query's lifetime
    * (empty when the feature is off) — the audit surface: every id here is
    * a transaction whose partial events were deliberately dropped.
    */
  def evictedTxIds: Seq[Long] = readScalar("evicted")
    .map(_.collect().map(_.getLong(0)).toSeq.sorted).getOrElse(Seq.empty)

  /** Last micro-batch id whose state+output are durably committed. */
  def lastCommittedBatch: Long = committedBatch

  /** Number of state buckets in effect (manifest's on resume). */
  def bucketCount: Int = buckets

  /** Live segment versions per bucket for `side` ("left"/"right") — test
    * visibility into the LSM layout (oldest first; empty = no data).
    */
  def liveSegments(side: String): Map[Int, Seq[Long]] = {
    val segs = if (side == "left") leftSegs else rightSegs
    segs.zipWithIndex.map { case (vs, b) => b -> (vs: Seq[Long]) }.toMap
  }

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
  /** @param numBuckets state buckets (a resumed manifest's layout wins)
    * @param compactSegments per-bucket segment count that triggers
    *   compaction — the write-amplification / read-fanout dial
    * @param evictAfterBatches opt-in stall timeout, measured in batches: a
    *   transaction still incomplete this many batches after first sighting
    *   is abandoned — the watermark advances past it and its partial
    *   events are never applied (the same consistency trade as
    *   [[TxReplayNative.docs]]'s `stallTimeoutMs`, with the micro-batch
    *   counter as the clock). Size it ABOVE the worst-case transport lag
    *   between a transaction's events and its END marker: any tx whose END
    *   (or missing events) straggle longer than this is permanently lost —
    *   that is what a timeout means (EvictEquivalenceSpec pins the
    *   evicted ≡ never-existed semantics when the window is respected)
    */
  def attach(unioned: DataFrame, stateRoot: String, checkpoint: String,
             numBuckets: Int = 16, compactSegments: Int = 4,
             evictAfterBatches: Option[Int] = None)
            (onEmit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val engine = new TxReplayStream(unioned.sparkSession, stateRoot,
      numBuckets, compactSegments, evictAfterBatches)
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
