package graft.scale

/** Plan/phase probe for the winnow copy-detection join:
  * `sbt "Test/runMain graft.scale.WinnowProfile [sfDir]"`.
  */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("winnow-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    import org.apache.spark.sql.functions._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val n = spark.sessionState.conf.numShufflePartitions
    val base = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val copies = base.filter(col("doc_id") % 31 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(lit("prefix edit "), col("text")).as("text"))
    val corpus = base.unionByName(copies).repartition(n, col("doc_id"))
    val x = TextOps.winnowFingerprints(corpus, "text")
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      .cache()
    timed("x cache")(println("fp rows: " + x.count()))

    val keep = x.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 5).select("fp")
    timed("keep")(println("kept fps: " + keep.count()))

    val xx = x.join(keep, Seq("fp"))
    timed("xx")(println("surviving rows: " + xx.count()))

    val pairs = xx.select(col("fp"), col("doc_id").as("a_id"))
      .join(xx.select(col("fp"), col("doc_id").as("b_id")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
    timed("pairs")(println("pairs: " + pairs.count()))
    pairs.explain("formatted")
    spark.stop()
  }
}
