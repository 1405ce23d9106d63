package graft

/** Plan auditor: `sbt "Test/runMain graft.PlanAudit q_name [q_name2 ...]"` —
  * prints the formatted physical plan of each query at sf0.001 (plan shape
  * is sf-independent; AQE may re-plan at runtime).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-plan-audit")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"\n================ $name ================")
      SparkEntry.queries(name)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
