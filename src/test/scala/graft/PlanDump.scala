package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to files:
  * `sbt "Test/runMain graft.PlanDump <outDir> <suffix> q1,q2,..."` writes
  * `<outDir>/<q>_<suffix>.txt` per query — the plan evidence the
  * optimization rounds commit under plans/r13/ so claims like "2 Exchange →
  * 1" are checkable without running Spark.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args.take(3)
    val spark = Sessions.build("plan-dump")
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
