package graft

/** Isolated re-measurement harness (the round-4 q_embed_topk protocol):
  * `sbt "Test/runMain graft.IsolateBench [sfDir] q1,q2,..."` runs each named
  * [[SparkEntry.queries]] entry alone in this fresh session, noop-write
  * materialized, 3 reps, and prints per-rep and min times — the number to
  * compare against sweep-context figures when adjudicating a suspected
  * regression (sweep context adds cache pressure and session history that
  * full-sweep timings can't separate from plan changes).
  */
object IsolateBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("isolate-bench")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("q_dedup_minhash", "q_edit_distance"))
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        q(spark, sf).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"ISOLATE $name rep$i: $s%.2f s")
        spark.catalog.clearCache()
        s
      }
      println(f"ISOLATE $name min: ${times.min}%.2f s")
    }
    spark.stop()
  }
}
