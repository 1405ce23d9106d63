package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Stage-level profile of one query: `sbt "Test/runMain graft.StageProfile
  * [sfDir] q_name"` — one warmup materialization, then one measured run with
  * a listener recording every stage's wall span, task count, and shuffle
  * bytes. Prints the per-stage table sorted by stage submission so the
  * expensive exchanges of a multi-job query are attributable (the local
  * harness runs with the UI off; this is the UI's stage page as text).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("stage-profile")
    val sf = if (args.length > 1) args(0) else "/root/testdata/sf0.1"
    args.last.split(",").map(_.trim).filter(_.nonEmpty).foreach(profile(spark, sf, _))
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession,
                      sf: String, name: String): Unit = {
    val q = SparkEntry.queries(name)

    // warmup (codegen, parquet footers)
    q(spark, sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    case class St(job: Int, id: Int, name: String, tasks: Int,
                  ms: Long, cpuMs: Long, shufRead: Long, shufWrite: Long,
                  input: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    val stageToJob = mutable.Map.empty[Int, Int]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages += St(stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n').take(60), si.numTasks, ms,
          si.taskMetrics.executorCpuTime / 1000000L,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain

    // executorCpuTime is the A/B metric on this noisy shared host: actual
    // CPU burned is load-independent where wall time swings ±25% run-to-run
    println(f"\nPROFILE $name: $secs%.2f s, $jobs jobs, ${stages.size} stages, " +
      f"${stages.map(_.ms).sum} stage-ms (sum), ${stages.map(_.cpuMs).sum} cpu-ms (sum)")
    println(f"${"job"}%4s ${"stage"}%5s ${"ms"}%7s ${"cpuMs"}%7s ${"tasks"}%5s " +
      f"${"input"}%10s ${"shufR"}%10s ${"shufW"}%10s  name")
    stages.sortBy(_.id).foreach { s =>
      println(f"${s.job}%4d ${s.id}%5d ${s.ms}%7d ${s.cpuMs}%7d ${s.tasks}%5d " +
        f"${s.input}%10d ${s.shufRead}%10d ${s.shufWrite}%10d  ${s.name}")
    }
    spark.catalog.clearCache()
  }
}
