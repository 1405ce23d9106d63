package graft

/** Mirrors the driver's smoke check: `SparkEntry.entry` must return rows.
  * `sbt "Test/runMain graft.EntrySmoke"`.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-entry-smoke")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY rows=$n")
    assert(n > 0, "driver smoke check requires rows > 0")
    spark.stop()
  }
}
