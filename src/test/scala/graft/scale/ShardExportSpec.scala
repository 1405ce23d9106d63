package graft.scale

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{Tables, TestSpark}

/** The export seam of the pipeline: trained-on shards must be (a) bounded in
  * size (downstream loaders stream fixed-ish files), (b) laid out by split
  * for partition-pruned reads, and (c) a lossless round trip. All of it is
  * stock Spark (`partitionBy` + `maxRecordsPerFile`) — the test pins the
  * contract the pipeline relies on.
  */
class ShardExportSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def walk(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList
    } finally s.close()
  }

  test("sharded export: bounded files, split-partitioned layout, lossless round trip") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-shards")
    val docs = Sampling.hashSplit(
      Tables.documents(spark, "/root/testdata/sf0.01").select("doc_id", "text"),
      "doc_id")

    docs.write
      .mode("overwrite")
      .option("maxRecordsPerFile", 50)
      .partitionBy("split")
      .parquet(out.toString)

    // split-partitioned directory layout (partition pruning applies on read)
    val dirs = walk(out).filter(Files.isDirectory(_)).map(_.getFileName.toString)
    dirs should contain allOf ("split=train", "split=valid", "split=test")

    // every shard respects the record bound
    val files = walk(out).filter(_.toString.endsWith(".parquet"))
    files should not be empty
    files.foreach { f =>
      spark.read.parquet(f.toString).count() should be <= 50L
    }

    // lossless round trip, split column reconstructed from the layout
    val back = spark.read.parquet(out.toString)
    back.count() shouldBe docs.count()
    back.select("doc_id", "split").as[(Long, String)].collect().toSet shouldBe
      docs.select("doc_id", "split").as[(Long, String)].collect().toSet

    // pruned read: one split's scan touches only that directory
    val pruned = spark.read.parquet(out.toString).filter(col("split") === "train")
    pruned.count() shouldBe docs.filter(col("split") === "train").count()
  }
}
