package graft.scale

import org.apache.spark.sql.functions._

/** Phase profiler for the near-dup clustering query:
  * `sbt "Test/runMain graft.scale.ClusterProfile [sfDir]"`.
  */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("cluster-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val copies = base.filter(col("doc_id") % 20 === 0)
    val corpus = base
      .unionByName(copies.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionByName(copies.select((col("doc_id") + 20000).as("doc_id"), col("text")))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    (1 to 3).foreach { i =>
      val pairs = NearDup.minHashDedup(corpus, "doc_id", "text", threshold = 0.7)
      timed(s"pairs    rep$i")(noop(pairs))
      val labels = timed(s"iterate  rep$i")(
        NearDup.clusterPairs(corpus.select(col("doc_id").as("id")), pairs))
      timed(s"finalize rep$i") {
        val sizes = labels.groupBy("cluster_root").agg(count(lit(1)).as("cluster_size"))
        noop(labels.join(sizes, Seq("cluster_root")))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
