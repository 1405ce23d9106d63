package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}
import graft.functions.KmvSketch

/** KMV sketch: the properties that make it THE portable sketch —
  * determinism (pure function of the input set), exact mergeability
  * (merge of partials == sketch of the union, bit-for-bit), bounded O(k)
  * state, and the estimator's accuracy band.
  */
class KmvSketchSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val k = 64

  import spark.implicits._

  test("sketch of a union == merge of per-shard sketches, bit-for-bit") {
    val ev = Tables.events(spark, sf)
    val whole = Sketches.kmvDistinct(ev, Seq("event_type"), "user_id", k)
      .select("event_type", "kmv")

    // shard by an arbitrary predicate, sketch each shard, merge the partials
    val shards = Seq(ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 =!= 0))
    val partials = shards.map(s =>
        Sketches.kmvDistinct(s, Seq("event_type"), "user_id", k)
          .select("event_type", "kmv"))
      .reduce(_ unionByName _)
    val merged = Sketches.kmvMergeSketches(partials, Seq("event_type"), k)

    val diff = whole.join(merged.withColumnRenamed("kmv", "kmv2"), Seq("event_type"))
      .filter(col("kmv") =!= col("kmv2"))
    diff.count() shouldBe 0L
    whole.count() shouldBe merged.count()
  }

  test("duplicates don't perturb the sketch; order doesn't either") {
    val vals = (1L to 500L).toDF("v")
    val withDups = vals.union(vals).union(vals.orderBy(col("v").desc))
    val a = vals.agg(KmvSketch.kmv(Hashing.md5Long60(col("v").cast("string")), k))
      .head.getSeq[Long](0)
    val b = withDups.agg(KmvSketch.kmv(Hashing.md5Long60(col("v").cast("string")), k))
      .head.getSeq[Long](0)
    a shouldBe b
    a.length shouldBe k
    a shouldBe a.sorted // ascending contract
  }

  test("under-full sketch IS the distinct set and the estimate is exact") {
    val small = (1L to 20L).toDF("v")
    val row = Sketches.kmvDistinct(small.withColumn("g", lit("x")), Seq("g"), "v", k)
      .head
    row.getSeq[Long](row.fieldIndex("kmv")).length shouldBe 20
    row.getLong(row.fieldIndex("n_est")) shouldBe 20L
  }

  test("nulls are skipped; empty input yields an empty sketch and estimate 0") {
    val df = Seq[Option[Long]](None, None).toDF("v")
    val out = Sketches.kmvDistinct(df.withColumn("g", lit("x")), Seq("g"), "v", k)
    out.count() shouldBe 0L // filter drops all-null input before the agg

    val mixed = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("v")
    val row = Sketches.kmvDistinct(mixed.withColumn("g", lit("x")), Seq("g"), "v", k).head
    row.getSeq[Long](row.fieldIndex("kmv")).length shouldBe 2
  }

  test("estimator lands within 3 standard deviations of the exact count") {
    // relative sd of the KMV estimator ~ 1/sqrt(k-2)
    val n = 20000L
    val big = (1L to n).toDF("v").withColumn("g", lit("x"))
    val est = Sketches.kmvDistinct(big, Seq("g"), "v", k)
      .head.getAs[Long]("n_est")
    val sd = n / math.sqrt(k - 2.0)
    est.toDouble shouldBe n.toDouble +- 3 * sd
  }
}
