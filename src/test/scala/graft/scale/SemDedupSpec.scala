package graft.scale

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** SemDeDup behavior gates beyond the DuckDB-oracled q_semdedup row:
  * scaling invariance (a positively-scaled copy lands in its original's
  * cluster and is pruned BY the original), survivor completeness, and the
  * smallest-id-survives retention rule inside a multi-copy group.
  */
class SemDedupSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private lazy val base = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    .cache()
  private lazy val centroids = base.filter(col("vec_id") % 10 === 3)

  test("scaled copies are pruned by their originals; everything else survives") {
    val copies = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.5)).as("embedding"))
    val out = Similarity.semDedup(base.unionByName(copies), centroids, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r).toMap

    out.size shouldBe base.count() + copies.count() // one row per vector
    out.foreach { case (id, r) =>
      withClue(s"vec $id: ") {
        if (id >= 10000) {
          r.getBoolean(2) shouldBe true        // is_dup
          r.getLong(3) shouldBe id - 10000     // dup_of = the original
          r.getDouble(4) shouldBe 1.0 +- 1e-9  // cos
          // the copy shares its original's cluster (cosine is scale-blind)
          r.getLong(1) shouldBe out(id - 10000).getLong(1)
        } else {
          r.getBoolean(2) shouldBe false       // corpus max pairwise cos 0.51
          r.isNullAt(3) shouldBe true
        }
      }
    }
  }

  test("multi-copy group keeps exactly the smallest id") {
    val trip = base.filter(col("vec_id") === 7)
    val group = trip
      .unionByName(trip.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0)).as("embedding")))
      .unionByName(trip.select((col("vec_id") + 200000).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5)).as("embedding")))
    val out = Similarity.semDedup(base.unionByName(group.filter(col("vec_id") > 7)),
      centroids, threshold = 0.99)
      .filter(col("vec_id") % 100000 === 7).collect()
      .map(r => (r.getLong(0), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).sortBy(_._1)
    out.toSeq shouldBe Seq((7L, false, -1L), (100007L, true, 7L), (200007L, true, 7L))
  }
}
