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
      val elapsed =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      // OUTSIDE the timed window: dropping the query's cache fences is
      // harness bookkeeping (it keeps the storage pool from accumulating
      // the whole sweep's entries), not query cost.
      spark.catalog.clearCache()
      elapsed
    }

    // optional arg: comma-separated query filter (local iteration)
    val names = args.headOption match {
      case Some(f) =>
        val (known, unknown) = f.split(",").map(_.trim).toSeq
          .partition(SparkEntry.queries.contains)
        require(unknown.isEmpty,
          s"unknown quer${if (unknown.size == 1) "y" else "ies"}: " +
            unknown.mkString(", "))
        known.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    names.foreach(materialize) // warmup: codegen + parquet footer caches
    // Three timed passes, min per query: transient host-contention spikes
    // (observed: the same query at 2 s and 20 s minutes apart on this
    // shared host) must not masquerade as engine cost.
    val passes = (1 to 3).map(_ => names.map(n => n -> materialize(n)).toMap)
    val results = names.map { n =>
      val ts = passes.map(_(n)).filter(_ >= 0)
      n -> (if (ts.isEmpty) -1.0 else ts.min)
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
