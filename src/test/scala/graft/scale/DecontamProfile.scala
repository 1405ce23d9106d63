package graft.scale

/** Phase profiler for the decontamination join:
  * `sbt "Test/runMain graft.scale.DecontamProfile [sfDir]"`.
  */
object DecontamProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("decontam-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    def run(label: String): Unit = {
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      val out = Decontam.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 5)
      timed(label)(out.write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    run("warmup")
    run("pass1")
    run("pass2")

    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    Decontam.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      "doc_id", "text", n = 5).explain("formatted")
    spark.stop()
  }
}
