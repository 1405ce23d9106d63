package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}

/** Measures the monitor-log claim: with the SegmentStore roll-up,
  * `readLog` cost is FLAT in stream age (bounded dir count), where the
  * old one-dir-per-batch layout paid a listing + footer per batch ever
  * profiled. Run:
  * `sbt "Test/runMain graft.streaming.MonitorLogProfile [nBatches]"`.
  */
object MonitorLogProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("monitor-log-profile")
    val n = args.headOption.map(_.toInt).getOrElse(200)
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text").cache()
    val baseline = CorpusMonitor.profile(docs, "text").cache()
    baseline.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirCount(dir: String): Long = {
      val ls = Files.list(Paths.get(dir))
      try ls.count() finally ls.close()
    }

    // age checkpoints: read the log at increasing stream age; flat wall
    // time + bounded dir count is the claim
    val dir = Files.createTempDirectory("graft-monlog-prof").toString
    var b = 0L
    Seq(n / 10, n / 2, n).foreach { upto =>
      while (b < upto) {
        CorpusMonitor.processBatch(docs.filter(col("doc_id") % 50 === b % 50),
          b, dir, baseline, "text", z = 3.0)
        b += 1
      }
      val (rows, readT) = time(CorpusMonitor.readLog(spark, dir).count())
      println(f"MONLOG age=$b%4d batches: readLog=$readT%.2f s rows=$rows " +
        f"dirs=${dirCount(dir)} segs=${SegmentStore.readManifest(dir).segs.size}")
    }
    spark.stop()
  }
}
