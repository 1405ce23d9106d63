package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}
import graft.scale.Similarity

/** The stream-maintained IVF index must probe exactly like a fresh
  * [[Similarity.assignBuckets]] + [[Similarity.ivfTopKIndexed]] over the
  * surviving latest-version corpus: updated vectors re-assign (possibly
  * to a different bucket) from their NEW values, deleted vectors stop
  * appearing as neighbors, compaction changes no answer, and the
  * centroids persist inside the artifact.
  */
class StreamingAnnIndexSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), (Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("streamed assignments ≡ fresh rebuild through update, delete, compaction") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    val centroids = e.filter(col("vec_id") % 10 === 3).select("vec_id", "embedding")
    val queries = e.filter(col("label") === 0).select("vec_id", "embedding")
    val indexDir = Files.createTempDirectory("graft-ann-lsm").toString

    def send(b: Long, rows: org.apache.spark.sql.DataFrame): Unit =
      StreamingAnnIndex.processBatch(rows, b, indexDir, centroids,
        opCol = Some("op"), compactSegments = 3)

    def rebuilt(corpus: org.apache.spark.sql.DataFrame) =
      topk(Similarity.ivfTopKIndexed(
        Similarity.assignBuckets(corpus, centroids), centroids, queries, k = 3))

    // batch 0: the whole corpus
    send(0, e.select(col("vec_id"), col("embedding"), lit("u").as("op")))
    topk(StreamingAnnIndex.ivfTopKLive(spark, indexDir, queries, k = 3, nprobe = 1)) shouldBe
      rebuilt(e.select("vec_id", "embedding"))

    // batch 1: every %17 vector is UPDATED to its reverse (direction
    // changes → may move buckets); batch 2: every %13 vector DELETED
    send(1, e.filter(col("vec_id") % 17 === 0)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"), lit("u").as("op")))
    send(2, e.filter(col("vec_id") % 13 === 0)
      .select(col("vec_id"), col("embedding"), lit("d").as("op")))
    val survivors = e.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"),
        when(col("vec_id") % 17 === 0, reverse(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
    val expect = rebuilt(survivors)
    topk(StreamingAnnIndex.ivfTopKLive(spark, indexDir, queries, k = 3, nprobe = 1)) shouldBe expect

    // batch 3 tips over the threshold → compaction; the answer holds and
    // only survivors' latest versions remain physically
    send(3, Seq((100000L, Seq.fill(64)(0.01), "u")).toDF("vec_id", "embedding", "op"))
    StreamingAnnIndex.readManifest(indexDir).segs should have size 1
    val afterCompact = topk(StreamingAnnIndex.ivfTopKLive(spark, indexDir, queries, k = 3, nprobe = 1))
    val expect3 = rebuilt(survivors.unionByName(
      Seq((100000L, Seq.fill(64)(0.01))).toDF("vec_id", "embedding")))
    afterCompact shouldBe expect3
    StreamingAnnIndex.readSegments(spark, indexDir)
      .groupBy("vec_id").agg(countDistinct("batch").as("nb"))
      .filter(col("nb") > 1).count() shouldBe 0L

    // the artifact carries its own centroids
    StreamingAnnIndex.readCentroids(spark, indexDir).count() shouldBe centroids.count()
  }
}
