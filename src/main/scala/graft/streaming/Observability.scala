package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** §2.8 observability — the reference dashboards track Debezium's
  * `TotalNumberOfEventsSeen` and `MilliSecondsBehindSource` plus retained-WAL
  * gauges (`postgres-replication-slots/grafana/.../replication_dashboard.json:51,84,160`).
  * Structured Streaming exposes the same signals through query progress;
  * this listener folds them into per-query counters a metrics exporter can
  * scrape.
  *
  * Mapping: events-seen ↔ cumulative `numInputRows`; behind-source ↔ batch
  * duration (processing lag proxy; with an event-time watermark the
  * `eventTime.watermark` gap is the exact analogue); state size ↔
  * `stateOperators.numRowsTotal`.
  */
/** Per-query counters (top-level: a case class nested in the listener class
  * would capture an outer reference pattern-matching can't check).
  */
final case class QueryMetrics(name: String, eventsSeen: Long, batches: Long,
                              lastBatchMs: Long, lastInputRows: Long,
                              stateRows: Long)

/** @param stateRowsWarnAt opt-in state-growth tripwire: when a query's
  *   total state rows cross the threshold, log ONE warning for it (and
  *   record it in [[stateRowsWarnings]]). The misuse this exists to make
  *   loud: [[TxReplayNative]]'s sharded fan-out with `shardDoneTtlMs`
  *   unset keeps a done-tombstone per (transaction, shard) FOREVER —
  *   state linear in total transactions × shards — which is deliberate
  *   back-compat but must not be silent on a long-running stream. Size
  *   the threshold to the deployment's expected steady-state (keys +
  *   in-flight transactions), far below transactions-ever × shards.
  */
class GraftMetricsListener(stateRowsWarnAt: Option[Long] = None)
    extends StreamingQueryListener {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[GraftMetricsListener])
  private val byQuery = TrieMap.empty[java.util.UUID, QueryMetrics]
  private val warned = TrieMap.empty[String, Long]

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    byQuery.put(event.id, QueryMetrics(Option(event.name).getOrElse(event.id.toString),
      0L, 0L, 0L, 0L, 0L))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val prev = byQuery.getOrElse(p.id,
      QueryMetrics(Option(p.name).getOrElse(p.id.toString), 0L, 0L, 0L, 0L, 0L))
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    val name = Option(p.name).getOrElse(p.id.toString)
    stateRowsWarnAt.foreach { at =>
      if (stateRows >= at && warned.putIfAbsent(name, stateRows).isEmpty)
        log.warn(s"query '$name' holds $stateRows state rows (threshold $at): " +
          "state is growing past the configured bound — on a TxReplayNative " +
          "sharded stream this usually means shardDoneTtlMs is unset and " +
          "done-tombstones accumulate per (tx, shard) forever")
    }
    byQuery.put(p.id, prev.copy(
      eventsSeen = prev.eventsSeen + p.numInputRows,
      batches = prev.batches + 1,
      lastBatchMs = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
      lastInputRows = p.numInputRows,
      stateRows = stateRows))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Current per-query metrics snapshot (keyed by query name). */
  def snapshot: Map[String, QueryMetrics] =
    byQuery.values.map(m => m.name -> m).toMap

  /** Query names whose state rows crossed `stateRowsWarnAt` (with the
    * row count observed at the crossing) — the scrapeable form of the
    * one-shot log warning.
    */
  def stateRowsWarnings: Map[String, Long] = warned.toMap
}
