package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.scale.Similarity

/** Measures the centroid-refresh contract: refresh cost is ONE
  * corpus-sized rebuild (kmeans rounds + re-assignment), linear in the
  * live corpus, and probe cost is unchanged across the generation swap —
  * the amortized price of keeping per-batch appends delta-sized on a
  * drifting stream. Run:
  * `sbt "Test/runMain graft.streaming.RefreshProfile [sfDirs...]"`.
  */
object RefreshProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("refresh-profile")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    sfs.foreach { sf =>
      val e = Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val centroids = e.filter(col("vec_id") % 101 === 0).select("vec_id", "embedding")
      val queries = e.filter(col("vec_id") % 211 === 0).select("vec_id", "embedding")
      val n = e.count()
      val k = centroids.count()
      val dir = Files.createTempDirectory(s"graft-refresh-prof").toString
      StreamingAnnIndex.processBatch(
        e.withColumn("op", lit("u")), 0L, dir, centroids, opCol = Some("op"))

      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      val (_, probeBefore) = time(
        StreamingAnnIndex.ivfTopKLive(spark, dir, queries, k = 5, nprobe = 1)
          .write.format("noop").mode("overwrite").save())
      // the drift-policy costs: baseline bootstrap is corpus-sized but
      // once per generation; the per-batch judge is delta-sized
      val stableDelta = e.filter(col("vec_id") % 10 === 7)
        .select("vec_id", "embedding")
      val (_, baseBootT) = time(
        StreamingAnnIndex.readRefreshBaseline(spark, dir).collect())
      val (firedStable, judgeT) = time(
        StreamingAnnIndex.maybeRefreshOnDrift(spark, dir, stableDelta))
      val (_, refreshT) = time(
        StreamingAnnIndex.refreshCentroids(spark, dir, lloydIters = 1))
      val (_, probeAfter) = time(
        StreamingAnnIndex.ivfTopKLive(spark, dir, queries, k = 5, nprobe = 1)
          .write.format("noop").mode("overwrite").save())
      // post-refresh judge reads the rewrite-written baseline (no bootstrap)
      val (firedAfter, judgeAfterT) = time(
        StreamingAnnIndex.maybeRefreshOnDrift(spark, dir, stableDelta))
      // the comparison bar: a from-scratch inline rebuild of the same
      // artifact (one Lloyd round + assignment + write), no index reuse
      val (_, rebuildT) = time {
        val cents = Similarity.kmeansIterate(e, centroids, maxIters = 1)
          .select(col("centroid_id").as("vec_id"), col("embedding"))
        Similarity.assignBuckets(e, cents)
          .write.mode("overwrite").parquet(s"$dir-rebuild")
      }
      println(f"REFRESH $sf: n=$n k=$k refresh=$refreshT%.2f s " +
        f"rebuild=$rebuildT%.2f s probe_before=$probeBefore%.2f s probe_after=$probeAfter%.2f s")
      println(f"POLICY $sf: baseline_bootstrap=$baseBootT%.2f s " +
        f"judge_stable=$judgeT%.2f s (fired=${firedStable.isDefined}) " +
        f"judge_postrefresh=$judgeAfterT%.2f s (fired=${firedAfter.isDefined})")

      // ---- the chunk-granular sibling, same contract at passage scale:
      // every vector becomes two chunk vectors (ck = key(vec_id, 0|1),
      // second chunk rotated by one dim) with DOC-level liveness
      import graft.scale.Chunking
      val chunkVecs = e.select(col("vec_id").as("doc_id"),
          posexplode(array(col("embedding"),
            concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))))
            .as(Seq("chunk_id", "embedding")))
        .select(col("doc_id"),
          Chunking.chunkKey(col("doc_id"), col("chunk_id")).as("ck"),
          col("embedding"))
      val vdir = Files.createTempDirectory("graft-refresh-prof-chunk").toString
      StreamingChunkIndex.processVecBatch(
        chunkVecs.withColumn("op", lit("u")), 0L, vdir, centroids,
        opCol = Some("op"))
      def vProbe(): Unit =
        StreamingChunkIndex.ivfChunkHitsLive(spark, vdir,
          queries, kChunks = 5, nprobe = 1)
          .write.format("noop").mode("overwrite").save()
      val (_, vProbeBefore) = time(vProbe())
      val stableChunkDelta = chunkVecs.filter(col("doc_id") % 10 === 7)
        .select("ck", "embedding")
      val (_, vBaseBootT) = time(
        StreamingChunkIndex.readVecRefreshBaseline(spark, vdir).collect())
      val (vFired, vJudgeT) = time(
        StreamingChunkIndex.maybeRefreshVecOnDrift(spark, vdir, stableChunkDelta))
      val (_, vRefreshT) = time(
        StreamingChunkIndex.refreshVecCentroids(spark, vdir, lloydIters = 1))
      val (_, vProbeAfter) = time(vProbe())
      val (vFiredAfter, vJudgeAfterT) = time(
        StreamingChunkIndex.maybeRefreshVecOnDrift(spark, vdir, stableChunkDelta))
      println(f"CHUNKPOLICY $sf: chunks=${2 * n} " +
        f"baseline_bootstrap=$vBaseBootT%.2f s " +
        f"judge_stable=$vJudgeT%.2f s (fired=${vFired.isDefined}) " +
        f"refresh=$vRefreshT%.2f s " +
        f"probe_before=$vProbeBefore%.2f s probe_after=$vProbeAfter%.2f s " +
        f"judge_postrefresh=$vJudgeAfterT%.2f s (fired=${vFiredAfter.isDefined})")
    }
    spark.stop()
  }
}
