package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming next-fit sequence packing — the stateful half of
  * [[graft.scale.Packing.nextFitPack]]: a continuously-ingested corpus is
  * packed into whole-document bins per group (source / shard), with the
  * open bin's (id, fill) carried across micro-batches so the assignment is
  * identical to the batch fold over the same rows in the same order
  * (StreamingPackSpec pins stream ≡ batch).
  *
  * Semantics match the batch operator exactly: documents are folded in
  * `doc_id` order (within a micro-batch the handler sorts; across batches
  * the caller must feed id-ascending slices — an appending ingest does),
  * a document that would overflow `capacity` closes the open bin and
  * starts the next, an oversized document occupies a bin alone, and
  * non-positive token counts are dropped.
  *
  * Scale: state is ONE (bin, fill) pair per group — O(groups), not
  * O(documents); the shuffle is the same per-group hash exchange the batch
  * operator uses, and each group's documents stream through its handler.
  * Emission is append-mode (every document is assigned exactly once,
  * assignments never retract), so any sink works.
  */
object StreamingPack {

  /** Input/output rows. `PackedDoc.bin_fill` = the bin's running fill
    * AFTER placing the document, mirroring the batch column.
    */
  case class PackDoc(source: String, doc_id: Long, n_tokens: Long)
  case class PackedDoc(source: String, doc_id: Long, n_tokens: Long,
                       bin_id: Long, bin_fill: Long)

  /** Open-bin state per group. */
  case class BinState(bin: Long, fill: Long)

  class NextFitPackProcessor(capacity: Long)
      extends StatefulProcessor[String, PackDoc, PackedDoc] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    @transient private var open: ValueState[BinState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[BinState](
        "open", Encoders.product[BinState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[PackDoc],
                                 timerValues: TimerValues): Iterator[PackedDoc] = {
      // fill == 0 ⇔ nothing placed yet: the first document NEVER closes
      // the (empty) open bin, exactly like the batch fold's `fill > 0` arm
      var st = Option(open.get()).getOrElse(BinState(0L, 0L))
      val out = Vector.newBuilder[PackedDoc]
      rows.toSeq.filter(_.n_tokens > 0).sortBy(_.doc_id).foreach { d =>
        st =
          if (st.fill > 0 && st.fill + d.n_tokens > capacity)
            BinState(st.bin + 1, d.n_tokens)
          else BinState(st.bin, st.fill + d.n_tokens)
        out += PackedDoc(key, d.doc_id, d.n_tokens, st.bin, st.fill)
      }
      open.update(st)
      out.result().iterator
    }
  }

  /** Streaming next-fit packing keyed by `source`. */
  def nextFitPack(docs: Dataset[PackDoc], capacity: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new NextFitPackProcessor(capacity),
        TimeMode.None(), OutputMode.Append())
  }
}
