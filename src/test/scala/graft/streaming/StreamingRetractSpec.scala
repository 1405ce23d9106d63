package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.ops.Materialize

/** Incremental view maintenance over a changelog stream: per micro-batch,
  * envelope rows become signed partials folded into a running state table —
  * the streaming deployment of Materialize.retractAgg. The invariant: after
  * any prefix of batches, the maintained state equals a from-scratch
  * retractAgg over the concatenated prefix.
  */
class StreamingRetractSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def env(rows: Seq[(String, Long, Option[Long], Option[Long])]): DataFrame =
    rows.toDF("op", "k", "b", "a")
      .select(
        when(col("b").isNotNull, struct(col("k"), col("b").as("v"))).as("before"),
        when(col("a").isNotNull, struct(col("k"), col("a").as("v"))).as("after"))

  test("foreachBatch retract maintenance equals batch recompute after every batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Option[Long], Option[Long])]

    val batches = Seq(
      Seq(("c", 1L, None, Some(10L)), ("c", 2L, None, Some(5L))),
      Seq(("u", 1L, Some(10L), Some(12L)), ("c", 1L, None, Some(3L))),
      Seq(("d", 2L, Some(5L), None), ("c", 3L, None, Some(8L)))
    )

    @volatile var state: DataFrame = spark.emptyDataset[(Long, Long, Long)]
      .toDF("k", "n_live", "sum_value")
    var seen = Seq.empty[(String, Long, Option[Long], Option[Long])]

    val q = stream.toDS().toDF("op", "k", "b", "a")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val contrib = Materialize.retractions(
          batch.select(
            when(col("b").isNotNull, struct(col("k"), col("b").as("v"))).as("before"),
            when(col("a").isNotNull, struct(col("k"), col("a").as("v"))).as("after")))
        val delta = Materialize.retractPartials(contrib, Seq("k"), col("v"))
        // localCheckpoint: pin this batch's merge result so the lineage (and
        // the batch's source) isn't re-read on every later merge
        state = Materialize.mergeRetractState(state, delta, Seq("k")).localCheckpoint()
        ()
      }
      .start()

    try {
      batches.foreach { b =>
        stream.addData(b)
        q.processAllAvailable()
        seen = seen ++ b
        val expected = Materialize.retractAgg(
          Materialize.retractions(env(seen)), Seq("k"), col("v"))
          .select("k", "n_live", "sum_value")
          .as[(Long, Long, Long)].collect().toSet
        val got = state.select("k", "n_live", "sum_value")
          .as[(Long, Long, Long)].collect().toSet
        got shouldBe expected
      }
      // final state: k=1 has rows 12 and 3; k=2 fully retracted; k=3 has 8
      state.orderBy("k").as[(Long, Long, Long)].collect() shouldBe
        Array((1L, 2L, 15L), (3L, 1L, 8L))
    } finally q.stop()
  }
}
