package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class RangeJoinLayoutSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pointInInterval: inclusive bounds, multi-bin intervals, no duplicate matches") {
    val points = Seq(
      (1L, 100L, 0L), (1L, 101L, 50L), (1L, 102L, 51L),
      (2L, 103L, 25L),          // right key, interval belongs to key 1
      (1L, 104L, 995L)          // inside the long interval only
    ).toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, 200L, 0L, 50L),      // [0,50] inclusive both ends
      (1L, 201L, 40L, 1000L),   // spans 97 bins of width 10
      (1L, 202L, 60L, 59L)      // degenerate end<start: matches nothing
    ).toDF("k", "iid", "s", "e")

    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e",
        binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    out shouldBe Set(
      (100L, 200L), (101L, 200L),  // t=50 included (inclusive end)
      (101L, 201L), (102L, 201L),
      (104L, 201L))                // found although 97 bins from the start
    // exactly one row per matching pair even though interval 201 covers many bins
    RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "s", "e", 10L)
      .count() shouldBe out.size
  }

  test("zValue2 matches a reference Morton implementation") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

    val cases = for { x <- 0L to 7L; y <- 0L to 7L } yield (x, y)
    val got = cases.toDF("x", "y")
      .withColumn("z", Layout.zValue2(col("x"), col("y"), bits = 3))
      .as[(Long, Long, Long)].collect()

    got.foreach { case (x, y, z) => z shouldBe morton(x, y, 3) }
    // the curve is a bijection on the 8x8 grid
    got.map(_._3).toSet.size shouldBe 64
  }

  test("zOrdered: partitions cover compact envelopes in BOTH dimensions") {
    // 64x64 grid; 16 partitions => each partition has 256 cells. A z-range
    // covers a compact region: expect per-partition envelope area well below
    // a single-dimension sort's worst case (which pins x but spans ALL of y).
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)).toDF("x", "y")
    val parts = Layout.zOrdered(grid, "x", "y", bits = 6, partitions = 16)
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()

    parts.length shouldBe 16
    // every partition's bounding box is far smaller than the full 63x63 grid
    parts.foreach { r =>
      val area = (r.getAs[Long]("dx") + 1) * (r.getAs[Long]("dy") + 1)
      area should be <= 1024L // 4x the 256 cells it holds; full grid is 4096
    }
  }
}
