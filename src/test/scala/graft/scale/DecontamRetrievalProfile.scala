package graft.scale

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Stage-level timing for the q_decontam_retrieval shape:
  * `sbt "Test/runMain graft.scale.DecontamRetrievalProfile [sfDir]"`.
  */
object DecontamRetrievalProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("decontam-retrieval-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DRPHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      val evals = docs.filter(col("doc_id") % 41 === 0)
      val probes = evals.select(col("doc_id").as("q_id"),
        explode(array_distinct(slice(split(col("text"), " "), 1, 6))).as("term"))
      val hits = Retrieval.bm25TopK(docs, "doc_id", "text", probes, "q_id", "term", k = 5)
        .cache()
      time("hits")(hits.count())
      val evalG = evals.select(col("doc_id").as("q_id"),
        NearDup.shinglesFromTokens(TextOps.tokens(col("text"))).as("eg"))
      time("evalG")(evalG.write.format("noop").mode("overwrite").save())
      val candG = docs
        .join(broadcast(hits.select("doc_id").distinct()), Seq("doc_id"))
        .select(col("doc_id"),
          NearDup.shinglesFromTokens(TextOps.tokens(col("text"))).as("cg"))
      time("candG")(candG.write.format("noop").mode("overwrite").save())
      val he = hits.join(evalG, Seq("q_id"))
      val out = candG.join(broadcast(he), Seq("doc_id"))
        .withColumn("overlap", round(
          size(array_intersect(col("eg"), col("cg"))).cast(org.apache.spark.sql.types.DoubleType) /
            size(col("eg")), 6))
        .withColumn("contaminated", col("overlap") >= 0.5)
        .select("q_id", "doc_id", "rank", "score", "overlap", "contaminated")
      time("verify+join")(out.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
