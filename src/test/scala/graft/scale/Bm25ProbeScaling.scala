package graft.scale

import org.apache.spark.sql.functions._

/** Measures the BM25 probe-amortization claim directly: with a persisted
  * [[Retrieval.buildBm25Index]] artifact, probe cost tracks the candidate
  * set, not the corpus. The same fixed probe set (replica-0 doc ids % 97,
  * first-4-token queries) probes an index of the sf0.1 corpus and of the
  * 10× sf1 corpus; sf1's replica vocabularies are disjoint, so the probe
  * terms match only replica-0 postings and the candidate count stays
  * fixed — only the index-side semi-join and the (doc_id, dl) stats pass
  * grow. Run:
  * `sbt "Test/runMain graft.scale.Bm25ProbeScaling [sf01Dir] [sf1Dir]"`.
  */
object Bm25ProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("bm25-probe-scaling")
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.drop(1).headOption.getOrElse("/tmp/sf1")

    val probes = spark.read.parquet(s"$sf01/documents.parquet")
      .filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("q_id"),
        explode(array_distinct(slice(split(col("text"), " "), 1, 4))).as("term"))

    Seq("sf0.1" -> sf01, "sf1" -> sf1).foreach { case (tag, dir) =>
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val idxPath = s"/tmp/bm25_idx_$tag"
      val t0 = System.nanoTime()
      Retrieval.buildBm25Index(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxPath)
      println(f"BM25PROBE $tag index build+write: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${spark.read.parquet(idxPath).count()} postings)")

      val index = spark.read.parquet(idxPath)
      val times = (1 to 3).map { i =>
        val t = System.nanoTime()
        Retrieval.bm25TopKIndexed(index, probes, "q_id", "term", k = 10)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t) / 1e9
        println(f"BM25PROBE $tag rep$i: $s%.2f s")
        spark.catalog.clearCache()
        s
      }
      println(f"BM25PROBE $tag min: ${times.min}%.2f s")
    }
    spark.stop()
  }
}
