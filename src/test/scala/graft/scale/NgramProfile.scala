package graft.scale

/** Phase profiler for the prefix-filtered Jaccard join:
  * `sbt "Test/runMain graft.scale.NgramProfile [sfDir]"`.
  */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("ngram-profile")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.Tables.documents(spark, sf)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // replicate the operator's phases
    import org.apache.spark.sql.functions._
    val n = spark.sessionState.conf.numShufflePartitions
    val shingled = docs.repartition(n, col("doc_id"))
      .withColumn("_toks", split(col("text"), " "))
      .select(col("doc_id").as("id"),
        NearDup.shinglesFromTokens(col("_toks")).as("sh"))
    timed("shingle+cache")(shingled.cache().count())

    val freq = shingled.select(explode(col("sh")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
    timed("freq")(freq.count())

    val threshold = 0.5
    val prefixes = shingled.select(col("id"), explode(col("sh")).as("tok"))
      .join(broadcast(freq), Seq("tok"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("f"), col("tok")))).as("ranked"),
        count(lit(1)).as("cnt"))
      .withColumn("plen", (col("cnt") - ceil(lit(threshold) * col("cnt")) + 1).cast("int"))
      .select(col("id"), col("cnt"), explode(slice(col("ranked"), lit(1), col("plen"))).as("p"))
      .select(col("id"), col("cnt"), col("p.tok").as("tok"))
    timed("prefixes")(println("prefix rows: " + prefixes.cache().count()))

    val candidates = prefixes
      .select(col("tok"), col("id").as("a_id"), col("cnt").as("a_n"))
      .join(prefixes.select(col("tok"), col("id").as("b_id"), col("cnt").as("b_n")), Seq("tok"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("b_n") >= col("a_n") * threshold && col("a_n") >= col("b_n") * threshold)
      .select("a_id", "b_id").distinct()
    timed("candidates")(println("candidates: " + candidates.cache().count()))

    val a = shingled.select(col("id").as("a_id"), col("sh").as("a_sh"))
    val b = shingled.select(col("id").as("b_id"), col("sh").as("b_sh"))
    val verified = candidates.repartition(n, col("a_id"))
      .join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("jac", NearDup.jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jac") >= threshold)
    timed("verify")(println("pairs: " + verified.count()))
    spark.stop()
  }
}
