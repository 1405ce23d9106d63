package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming MinHash-LSH near-duplicate detection — the online half of
  * [[graft.scale.NearDup.minHashDedup]]: documents arrive over micro-batches
  * and each is checked against everything seen SO FAR, so a crawl pipeline
  * can drop near-dups at ingest instead of re-running batch dedup.
  *
  * Dataflow (same candidate discipline as the batch operator — never
  * all-pairs): signature → b band keys per doc → shuffle on the band key →
  * per-bucket keyed state holds the signatures previously filed under that
  * band; an incoming doc compares only against its bucket's entries.
  * Verification is the signature slot-agreement estimate of Jaccard (the
  * shingle sets are not retained in state — retaining them would make
  * state corpus-sized; E[slot agreement] = J, so the threshold is the same
  * dial, with sampling error ~1/√numHashes instead of the batch operator's
  * exact verify).
  *
  * State discipline: each band bucket stores at most `maxBucket`
  * signatures. A bucket at capacity stops absorbing new entries (documents
  * still MATCH against the stored ones) — the same document-frequency cap
  * the winnowing operator uses for hot fingerprints: an over-hot bucket is
  * evidence of templated/boilerplate content whose first `maxBucket`
  * exemplars already represent it. State per bucket is b×`maxBucket`
  * signatures of 8×numHashes bytes — bounded, RocksDB-backed, partitioned
  * by the band-key shuffle.
  *
  * Emission: one match row per (band, earlier doc) hit, so a pair sharing
  * several bands emits several rows — `distinct()` downstream if pair
  * uniqueness matters (documented rather than built-in: a second stateful
  * dedup operator would double the state for a property many consumers —
  * "is this doc a dup of anything?" — don't need).
  */
object StreamingNearDup {

  /** One row per (doc, band): the state-shuffle unit. */
  case class BandedDoc(band_key: Long, doc_id: Long, seq: Long, sig: Array[Long])

  /** `doc_id` matched `dup_of` (seen earlier) with slot-agreement `sim`. */
  case class NearDupMatch(doc_id: Long, dup_of: Long, sim: Double)

  /** Per-band-bucket matcher. Within a batch, rows fold in (seq, doc_id)
    * order, so "earlier" is well-defined inside a batch too.
    */
  class NearDupProcessor(simThreshold: Double, maxBucket: Int)
      extends StatefulProcessor[Long, BandedDoc, NearDupMatch] {

    @transient private var seen: ListState[BandedDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[BandedDoc](
        "seen", Encoders.product[BandedDoc], TTLConfig.NONE)

    private def agreement(a: Array[Long], b: Array[Long]): Double = {
      val n = math.min(a.length, b.length)
      if (n == 0) return 0.0
      var i = 0; var eq = 0
      while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }

    override def handleInputRows(bandKey: Long, rows: Iterator[BandedDoc],
                                 timerValues: TimerValues): Iterator[NearDupMatch] = {
      val out = Vector.newBuilder[NearDupMatch]
      var stored = seen.get().toVector
      var n = stored.size
      rows.toSeq.sortBy(d => (d.seq, d.doc_id)).foreach { d =>
        stored.foreach { p =>
          if (p.doc_id != d.doc_id) {
            val sim = agreement(p.sig, d.sig)
            if (sim >= simThreshold) out += NearDupMatch(d.doc_id, p.doc_id, sim)
          }
        }
        if (n < maxBucket) {
          seen.appendValue(d)
          stored = stored :+ d
          n += 1
        }
      }
      out.result().iterator
    }
  }

  /** Project (id, seq, text) — batch or streaming — to banded signatures.
    * Same signature/banding construction as the batch operator (native
    * one-pass [[graft.functions.MinHashSig]], bands of `rowsPerBand` slots
    * hashed with the band index); sub-`shingleK`-token docs are dropped for
    * the batch operator's reason: they cannot be near-dups and would pile
    * into one degenerate empty-signature bucket.
    */
  def bandedSignatures(docs: DataFrame, idCol: String, seqCol: String,
                       textCol: String, bands: Int = 32, rowsPerBand: Int = 3,
                       shingleK: Int = 3): Dataset[BandedDoc] = {
    val sh = graft.scale.NearDup.shinglesFromTokens(split(col(textCol), " "), shingleK)
    val sig = graft.functions.TextHashFunctions.minHashSig(col("_sh"), bands * rowsPerBand)
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r => col("_sig")(b * rowsPerBand + r)): _*)
    }
    docs
      .filter(size(split(col(textCol), " ")) >= shingleK)
      .withColumn("_sh", sh)
      .withColumn("_sig", sig)
      .select(col(idCol).cast("long").as("doc_id"),
        col(seqCol).cast("long").as("seq"),
        col("_sig").as("sig"),
        explode(array(bandCols: _*)).as("band_key"))
      .select("band_key", "doc_id", "seq", "sig")
      .as[BandedDoc](Encoders.product[BandedDoc])
  }

  /** The stateful matcher over banded signatures (use on the output of
    * [[bandedSignatures]] applied to a streaming source).
    */
  def matches(banded: Dataset[BandedDoc], simThreshold: Double = 0.7,
              maxBucket: Int = 64): Dataset[NearDupMatch] = {
    implicit val matchEnc = Encoders.product[NearDupMatch]
    banded
      .groupByKey(_.band_key)(Encoders.scalaLong)
      .transformWithState(new NearDupProcessor(simThreshold, maxBucket),
        TimeMode.None(), OutputMode.Append())
  }
}
