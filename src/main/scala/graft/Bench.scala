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
      } finally {
        // Queries cache small derived tables as optimizer fences; dropping
        // them between queries keeps the storage pool from accumulating
        // 39-queries' worth of entries (eviction thrash at small heaps).
        spark.catalog.clearCache()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional arg: comma-separated query filter (local iteration)
    val names = args.headOption match {
      case Some(f) => f.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    names.foreach(materialize) // warmup: codegen + parquet footer caches
    // Two timed passes, min per query: a transient host-contention spike in
    // one pass doesn't masquerade as engine cost.
    val pass1 = names.map(n => n -> materialize(n)).toMap
    val results = names.map { n =>
      val t2 = materialize(n)
      val t1 = pass1(n)
      n -> (if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("BENCH.json"), line + "\n")
    spark.stop()
  }
}
