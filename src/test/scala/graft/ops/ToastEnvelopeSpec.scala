package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.cdc.Envelope

/** Toast.backfillEnvelope — the reference's actual call shape: rebuild the
  * envelope's `after` ROW with the one TOASTed field replaced
  * (`SqlOverAggJob.java:113-129`), keyed by the op-dependent id, ordered by
  * LSN. Deletes (null after) pass through untouched.
  */
class ToastEnvelopeSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val S = Envelope.ToastSentinel

  test("sentinel fields are rebuilt inside after; deletes pass through") {
    import spark.implicits._
    // (id, lsn, op, bioOrNull) — None after = delete event
    val rows = Seq(
      (1L, 10L, "r", Some("bio-v1")),
      (1L, 11L, "u", Some(S)),        // unchanged TOAST -> backfill bio-v1
      (1L, 12L, "u", Some("bio-v2")), // real update advances the latch
      (1L, 13L, "u", Some(S)),        // -> bio-v2
      (2L, 20L, "u", Some(S)),        // no prior value: sentinel latches to null
      (3L, 30L, "d", None)            // delete: after stays null
    )
    val env = rows.toDF("id", "lsn", "op", "bio")
      .select(
        when(col("op") === "d",
          struct(col("id"), lit("gone").as("bio"))).as("before"),
        when(col("op") =!= "d",
          struct(col("id"), col("bio"))).as("after"),
        struct(col("lsn")).as("source"),
        col("op"))

    val out = Toast.backfillEnvelope(env, "id", "bio")
      .select(
        Envelope.keyOf(col("after"), col("before"), "id").as("key"),
        col("source.lsn"), col("after.bio"))
      .orderBy("lsn")
      .as[(Long, Long, Option[String])].collect()

    out shouldBe Array(
      (1L, 10L, Some("bio-v1")),
      (1L, 11L, Some("bio-v1")),
      (1L, 12L, Some("bio-v2")),
      (1L, 13L, Some("bio-v2")),
      (2L, 20L, None),
      (3L, 30L, None)) // delete: after null, field untouched
  }
}
