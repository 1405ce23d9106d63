package graft.scale

import org.apache.spark.sql.functions._

/** Measures the incremental-dedup claim directly: probe cost tracks the
  * DELTA, not the corpus. The same fixed delta (sf0.1's % 3 = 0 slice,
  * ~1.7k docs) probes a parquet-persisted index of the sf0.1 corpus and of
  * the 10× sf1 corpus (disjoint replica vocabularies keep the candidate
  * count fixed — only the index band scan grows). Run:
  * `sbt "Test/runMain graft.scale.IndexProbeScaling [sf01Dir] [sf1Dir]"`.
  */
object IndexProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("index-probe-scaling")
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.drop(1).headOption.getOrElse("/tmp/sf1")

    val delta = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id", "text")

    Seq("sf0.1" -> sf01, "sf1" -> sf1).foreach { case (tag, dir) =>
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 3 =!= 0)
        // delta ids (% 3 = 0, replica-0 range) are disjoint from this
        // corpus slice at both scales — the operator's unique-id contract
        .select("doc_id", "text")
      val idxPath = s"/tmp/probe_idx_$tag"
      val t0 = System.nanoTime()
      NearDup.buildMinHashIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxPath)
      println(f"PROBE $tag index build+write: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${spark.read.parquet(idxPath).count()} docs indexed)")

      val index = spark.read.parquet(idxPath)
      val times = (1 to 3).map { i =>
        val t = System.nanoTime()
        NearDup.incrementalMinHashDedup(index, delta, "doc_id", "text", threshold = 0.7)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t) / 1e9
        println(f"PROBE $tag rep$i: $s%.2f s")
        spark.catalog.clearCache()
        s
      }
      println(f"PROBE $tag min: ${times.min}%.2f s")
    }
    spark.stop()
  }
}
