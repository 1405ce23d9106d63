package graft
import java.nio.file.{Files, Paths}
/** Benchmark main. Per-query timing with FULL materialization — a
  * `format("noop")` write evaluates every output column (a bare `.count()`
  * would let Catalyst prune aggregate payloads and drop final sorts). One
  * untimed warmup pass absorbs JVM/codegen warmup so per-query numbers are
  * steady-state. The JSON result line goes to stdout AND to BENCH.json in the
  * working directory (sbt log prefixes would otherwise hide it from parsers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(materialize) // warmup: codegen + parquet footer caches
    val results = names.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("BENCH.json"), line + "\n")
    spark.stop()
  }
}
