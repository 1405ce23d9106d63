package graft.scale

/** Scratch plan probe (not a Spec): prints the settled physical plans of the
  * incremental-dedup probe over a parquet-backed index and of semDedup, to
  * pick the assertable shape properties. Run: sbt "Test/runMain graft.scale.IncrementalPlanProbe"
  */
object IncrementalPlanProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.TestSpark.spark
    val sf = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    NearDup.buildMinHashIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/mh_index")
    val index = spark.read.parquet("/tmp/mh_index")
    val probe = NearDup.incrementalMinHashDedup(index, delta, "doc_id", "text")
    probe.collect()
    val plan = (probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    println("==== incremental probe final plan ====")
    println(plan)

    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val sd = Similarity.semDedup(e, e.filter(col("vec_id") % 10 === 3), 0.99)
    sd.collect()
    val plan2 = (sd.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    println("==== semDedup final plan ====")
    println(plan2)
    spark.stop()
  }
}
