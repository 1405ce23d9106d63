package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.cdc.Envelope

/** Streaming-native stateful operators (Structured Streaming,
  * `transformWithState` / `StatefulProcessor`) — the per-key keyed-state halves
  * of the batch operators in `graft.ops`:
  *
  *  - [[ToastProcessor]] ↔ the reference's keyed TOAST backfill
  *    (`postgres-toast-backfill/.../DataStreamJob.java:60-101`): a per-key
  *    latch of the last real value, substituted into update events that carry
  *    the `__debezium_unavailable_value` sentinel.
  *  - [[KeepLatestProcessor]] ↔ the upsert materializer (O8/A3,
  *    `KafkaChangelogToUpsertJob.java:23-60`): latest row per key by LSN,
  *    emitting the current row per input batch (an update stream).
  *
  * Scale: state is per-key and partitioned by the shuffle
  * (`groupByKey` → hash exchange); RocksDB state store handles
  * larger-than-memory state per executor. Within a micro-batch, per-key rows
  * are folded in LSN order (sorted in the handler — bounded by the batch),
  * which is the same per-key FIFO guarantee the reference gets from Kafka
  * partitioning (single-record consistency, poc.md:321-324).
  */
object Stateful {

  /** TOAST event: a flattened change event with one TOASTable column. */
  case class ToastEvent(id: Long, op: String, lsn: Long, value: String)

  /** Upsert input: key + full row payload as JSON + ordering LSN. */
  case class UpsertEvent(key: Long, op: String, lsn: Long, payload: String)

  /** Per-key latch with the reference's op matrix: r/c/i seed the latch,
    * u with the sentinel substitutes the latched value (or passes NULL
    * through untouched — sentinel ≠ NULL), plain u updates the latch,
    * d clears state.
    */
  class ToastProcessor(sentinel: String = Envelope.ToastSentinel)
      extends StatefulProcessor[Long, ToastEvent, ToastEvent] {

    @transient private var latch: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latch = getHandle.getValueState[String]("latch", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ToastEvent],
                                 timerValues: TimerValues): Iterator[ToastEvent] = {
      val out = Vector.newBuilder[ToastEvent]
      rows.toSeq.sortBy(_.lsn).foreach { ev =>
        ev.op match {
          case "r" | "c" | "i" =>
            if (ev.value != null) latch.update(ev.value)
            out += ev
          case "u" =>
            if (ev.value == sentinel) {
              val known = latch.get() // null when nothing latched yet
              out += ev.copy(value = known)
            } else {
              if (ev.value != null) latch.update(ev.value)
              out += ev
            }
          case "d" =>
            latch.clear()
            out += ev
          case _ => out += ev
        }
      }
      out.result().iterator
    }
  }

  /** Keep-latest-per-key materializer: state = (lsn, op, payload) of the
    * newest change; emits the key's current row once per batch it appears
    * in. Deletes emit a tombstone marker (null payload) and clear state.
    *
    * Tiebreak: on EQUAL lsn the incoming event beats stored state (and the
    * later-arriving event beats the earlier within a batch — sortBy is
    * stable), matching upsert-kafka semantics where same-offset redelivery
    * carries the newer serialization. Re-emission: the current row is
    * emitted for every batch the key appears in, even if all of the batch's
    * events were stale — deliberate update-stream semantics (each appearance
    * refreshes downstream sinks), mirroring the reference's upsert topic
    * where redelivered keys re-publish their current value.
    */
  class KeepLatestProcessor
      extends StatefulProcessor[Long, UpsertEvent, UpsertEvent] {

    @transient private var latest: ValueState[UpsertEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[UpsertEvent](
        "latest", Encoders.product[UpsertEvent], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UpsertEvent],
                                 timerValues: TimerValues): Iterator[UpsertEvent] = {
      val sorted = rows.toSeq.sortBy(_.lsn)
      val current = Option(latest.get())
      // reduceLeft with >= : the LAST element among equal-lsn maxima wins,
      // i.e. incoming beats stored, later-arriving beats earlier.
      val newest = (current.toSeq ++ sorted)
        .reduceLeft((a, b) => if (b.lsn >= a.lsn) b else a)
      if (newest.op == "d") {
        latest.clear()
        Iterator.single(newest.copy(payload = null)) // tombstone
      } else {
        latest.update(newest)
        Iterator.single(newest)
      }
    }
  }

  /** Event for the streaming commit-LSN fixer: data events (`kind="e"`) and
    * tx END markers (`kind="end"`, commit_lsn set) share one stream keyed by
    * tx id — the data-plane substitute for the reference's broadcast state.
    */
  case class TxKeyedEvent(tx_id: Long, kind: String, key: Long, op: String,
                          lsn: Long, payload: String, commit_lsn: Long)

  /** Streaming CommitLsnFixer (`CommitLsnFixer.java:37-152`): per-tx buffer
    * of data events until the END marker arrives, then re-emit each with the
    * corrected commit LSN; events arriving after the END flow straight
    * through. State clears once a tx's END has been seen and its buffer
    * flushed (the reference GCs heuristically; keyed state lets us clear
    * exactly).
    */
  class CommitLsnFixerProcessor
      extends StatefulProcessor[Long, TxKeyedEvent, TxKeyedEvent] {

    @transient private var buffer: ListState[TxKeyedEvent] = _
    @transient private var endLsn: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buffer = getHandle.getListState[TxKeyedEvent](
        "buffer", Encoders.product[TxKeyedEvent], TTLConfig.NONE)
      endLsn = getHandle.getValueState[Long](
        "endLsn", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(txId: Long, rows: Iterator[TxKeyedEvent],
                                 timerValues: TimerValues): Iterator[TxKeyedEvent] = {
      val out = Vector.newBuilder[TxKeyedEvent]
      var commit: Option[Long] = if (endLsn.exists()) Some(endLsn.get()) else None
      rows.toSeq.sortBy(_.lsn).foreach { ev =>
        if (ev.kind == "end") {
          commit = Some(ev.commit_lsn)
          endLsn.update(ev.commit_lsn)
          // flush everything buffered before the END arrived
          buffer.get().foreach(b => out += b.copy(commit_lsn = ev.commit_lsn))
          buffer.clear()
        } else commit match {
          case Some(lsn) => out += ev.copy(commit_lsn = lsn)
          case None => buffer.appendValue(ev)
        }
      }
      out.result().iterator
    }
  }

  /** Streaming commit-LSN enrichment over a tx-keyed event stream. */
  def fixCommitLsn(events: Dataset[TxKeyedEvent]): Dataset[TxKeyedEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.tx_id)
      .transformWithState(new CommitLsnFixerProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming TOAST backfill over a typed event stream. */
  def toastBackfill(events: Dataset[ToastEvent],
                    sentinel: String = Envelope.ToastSentinel): Dataset[ToastEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.id)
      .transformWithState(new ToastProcessor(sentinel), TimeMode.None(), OutputMode.Update())
  }

  /** Streaming upsert materializer (keep latest per key, tombstones on delete). */
  def keepLatest(events: Dataset[UpsertEvent]): Dataset[UpsertEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new KeepLatestProcessor, TimeMode.None(), OutputMode.Update())
  }
}
