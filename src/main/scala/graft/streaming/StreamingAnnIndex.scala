package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.scale.Similarity

/** Streaming maintenance of the IVF embedding index
  * ([[Similarity.assignBuckets]]'s (vec_id, bucket, vec, norm) artifact)
  * under the [[SegmentStore]] LSM lifecycle — the third index family on
  * the shared contract, beside [[StreamingRetrieval]] (BM25 postings) and
  * [[StreamingDedupIndex]] (MinHash signatures): vectors arrive as a
  * stream of UPSERTS and DELETES, each micro-batch appends one
  * delta-sized assignment segment (one broadcast-centroid pass over just
  * the batch), and probes see the corpus as of the last committed batch —
  * an updated vector is re-assigned from its NEW values (it may move
  * buckets), a deleted vector stops appearing as a neighbor.
  *
  * The centroids are the index's FROZEN parameter (train once with
  * [[Similarity.kmeansIterate]]; retraining re-buckets everything =
  * rebuild the index). The first committed batch persists them under
  * `_centroids/` inside the index dir — underscore-hidden from partition
  * discovery, like the manifest — so the artifact is self-contained and
  * probes cannot accidentally route with different centroids than the
  * assignments were built with.
  *
  * Scale shape: per-batch write cost is one |delta|×K broadcast pass;
  * probes pay one |queries|×K routing pass plus one streamed pass of the
  * index scan, on which the liveness predicates (per-id batch maxima +
  * churn-sized delete markers) ride as AQE-broadcast joins — the index is
  * scanned, never shuffled, exactly as in [[Similarity.ivfTopKIndexed]].
  */
object StreamingAnnIndex {

  private val segSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("bucket", LongType),
    StructField("vec", ArrayType(DoubleType, containsNull = true)),
    StructField("norm", DoubleType),
    StructField("batch", LongType)))

  /** Committed manifest of the index at `indexDir`. */
  def readManifest(indexDir: String): SegmentStore.Manifest =
    SegmentStore.readManifest(indexDir)

  /** Live assignment rows, `batch` included. */
  def readSegments(spark: SparkSession, indexDir: String): DataFrame =
    SegmentStore.readSegments(spark, indexDir, segSchema)

  /** Live delete markers — schema (vec_id, batch). */
  def readDels(spark: SparkSession, indexDir: String): DataFrame =
    SegmentStore.readDels(spark, indexDir, "vec_id")

  /** Relative dir of the centroid generation the manifest points at:
    * `_centroids` (flat — generation 0, the first committed batch's
    * write) until a [[refreshCentroids]] bumps the manifest's `param` to
    * `g<N>` → `_centroids_g<N>`. Sibling dirs, never nested: a parquet
    * dir must not grow subdirectories under it.
    */
  private def centroidsDir(m: SegmentStore.Manifest): String =
    m.param.fold("_centroids")(g => s"_centroids_$g")

  /** The centroids the CURRENT index generation was built with — columns
    * (vec_id, embedding ARRAY<DOUBLE>). Resolved through the manifest's
    * parameter pointer, so assignments and routing always match.
    */
  def readCentroids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/${centroidsDir(SegmentStore.readManifest(indexDir))}")

  /** [[Similarity.ivfTopKIndexed]] over the live view of an upsert/delete
    * index: query vectors route through the persisted centroids; the
    * liveness predicates ride the streamed index scan as churn-sized
    * AQE-broadcast joins (versions from a column-pruned (vec_id, batch)
    * pass), then the bucket join reduces to the probed buckets' rows.
    * Equals an [[Similarity.ivfTopKIndexed]] probe of a fresh assignment
    * of the surviving latest-version corpus (StreamingAnnIndexSpec pins
    * it).
    */
  def ivfTopKLive(segs: DataFrame, dels: DataFrame, centroids: DataFrame,
                  queries: DataFrame, k: Int, nprobe: Int = 1,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val versions = segs.select("vec_id", "batch").distinct()
    val live = SegmentStore.liveFilter(segs, versions, dels, "vec_id")
    Similarity.ivfTopKIndexed(live.drop("batch"), centroids, queries,
      k, nprobe, idCol, vecCol)
  }

  /** [[ivfTopKLive]] reading a maintained index directory (centroids from
    * the artifact itself).
    */
  def ivfTopKLive(spark: SparkSession, indexDir: String, queries: DataFrame,
                  k: Int, nprobe: Int): DataFrame =
    ivfTopKLive(readSegments(spark, indexDir), readDels(spark, indexDir),
      readCentroids(spark, indexDir), queries, k, nprobe)

  /** Apply one micro-batch of vector changes to the index at `indexDir`
    * (`opCol` rows with "d" delete, others upsert; redelivered batches are
    * skipped). The first committed batch persists `centroids`; later
    * batches use the argument for assignment — pass the same centroids
    * for the artifact to stay coherent (read them back with
    * [[readCentroids]]).
    */
  def processBatch(docs: DataFrame, batchId: Long, indexDir: String,
                   centroids: DataFrame,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   opCol: Option[String] = None,
                   compactSegments: Int = 8): Unit = {
    // (re)write the centroids until the FIRST batch commits — keying the
    // freeze on the manifest, not on dir existence, so a crash between a
    // _centroids write and the first manifest commit cannot freeze stale
    // centroids under assignments built from a different argument on retry
    if (SegmentStore.readManifest(indexDir).lastBatch < 0L)
      centroids.select(col(idCol).as("vec_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("embedding"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/_centroids")
    SegmentStore.processBatch(docs, batchId, indexDir, idCol, "vec_id", opCol,
      compactSegments,
      upserts => Similarity.assignBuckets(upserts, centroids, idCol, vecCol))
  }

  /** Re-center the index's frozen routing parameter on the CURRENT live
    * corpus — the drift answer for a long-running stream. The centroids a
    * batch-0 training run froze describe batch-0's distribution; months of
    * upserts can leave most of the corpus far from every centroid
    * (degenerate buckets → recall collapse on the drifted mass). This runs
    * `lloydIters` Lloyd rounds ([[Similarity.kmeansIterate]]) seeded from
    * the CURRENT centroids over the live vectors, persists the result as
    * the next centroid generation (`_centroids_g<N>`), and re-derives
    * every live row's bucket in one [[SegmentStore.rewrite]] — segments
    * and the generation pointer swap in a single atomic manifest commit,
    * so a probe either routes old-against-old or new-against-new, never
    * mixed. Per-row `batch` versions are preserved, so upsert/delete
    * semantics continue unchanged across the refresh.
    *
    * Offline and corpus-sized BY DESIGN (one |live|×K assignment pass per
    * Lloyd round plus the rewrite) — the amortized cost of keeping every
    * per-batch append delta-sized; run it on the cadence drift warrants
    * (weekly, or when bucket-occupancy skew crosses a threshold), NOT per
    * batch. Single-writer: serialize with the maintenance stream (call it
    * between batches or from inside the same foreachBatch).
    *
    * Returns the refreshed centroids (vec_id, embedding).
    */
  def refreshCentroids(spark: SparkSession, indexDir: String,
                       lloydIters: Int = 1, tol: Double = 1e-4,
                       pruneGraceBatches: Int = 2): DataFrame = {
    val m = SegmentStore.readManifest(indexDir)
    require(m.lastBatch >= 0L, s"no committed index at $indexDir")
    val live = SegmentStore.liveRows(readSegments(spark, indexDir),
      readDels(spark, indexDir), "vec_id")
    val corpus = live.select(col("vec_id"), col("vec").as("embedding"))
    val refreshed = Similarity.kmeansIterate(corpus,
      readCentroids(spark, indexDir), maxIters = lloydIters, tol = tol)
      .select(col("centroid_id").as("vec_id"), col("embedding"))
    val gen = m.param.fold(1)(p => p.stripPrefix("g").toInt + 1)
    refreshed.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/_centroids_g$gen")
    val cents = spark.read.parquet(s"$indexDir/_centroids_g$gen")
    SegmentStore.rewrite(spark, indexDir, segSchema, "vec_id",
      rows => Similarity.assignBuckets(
          rows.select(col("vec_id"), col("vec").as("embedding")), cents)
        .join(rows.select("vec_id", "batch"), Seq("vec_id")),
      newParam = Some(s"g$gen"), extraDead = Seq(centroidsDir(m)),
      pruneGraceBatches = pruneGraceBatches)
    cents
  }

  /** Attach index maintenance to a vector-change stream. */
  def attachIndexMaintenance(docs: DataFrame, indexDir: String, checkpoint: String,
                             centroids: DataFrame,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             opCol: Option[String] = None,
                             compactSegments: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexDir, centroids, idCol, vecCol,
          opCol, compactSegments)
      }
      .start()
}
