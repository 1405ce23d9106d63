package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Lifecycle edges of the shared LSM store that the per-index specs don't
  * reach: an append whose buildSegment yields NO part files must not be
  * registered (a file-less dir poisons every later read — whether an
  * empty write leaves a schema-only part file or nothing is plan-shape
  * dependent, so the store checks the dir, not the plan), and delete-only
  * batches must count toward the compaction trigger so a delete-heavy
  * stream cannot accumulate marker dirs (and probe-side delMax join
  * input) without bound.
  */
class SegmentStoreSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val segSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))
  private val segSchemaB = StructType(segSchema.fields :+ StructField("batch", LongType))

  // a 0-partition plan runs zero write tasks → the dir gets only _SUCCESS,
  // no part files — the deterministic file-less case (an AQE-coalesced
  // empty join can land the same way)
  private def fileLess(ups: DataFrame): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], segSchema)

  private def identityBuild(ups: DataFrame): DataFrame =
    ups.select(col("id"), col("id").as("v"))

  private def send(dir: String, b: Long, rows: Seq[(Long, String)],
                   build: DataFrame => DataFrame): Unit =
    SegmentStore.processBatch(rows.toDF("id", "op"), b, dir, "id", "id",
      Some("op"), compactSegments = 3, build)

  test("an append whose build drops every row stays probe-able") {
    // this Spark leaves a schema-only part file even for a 0-partition
    // plan, so the segment lands readable — the contract is that the
    // index survives an all-rows-dropped build either way
    val dir = Files.createTempDirectory("graft-lsm-fileless").toString
    send(dir, 0, Seq((1L, "u")), fileLess)
    SegmentStore.readManifest(dir).lastBatch shouldBe 0L
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id").count() shouldBe 0L

    // a later real batch appends and reads back normally
    send(dir, 1, Seq((2L, "u")), identityBuild)
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id")
      .select("id").as[Long].collect().toSeq shouldBe Seq(2L)
  }

  test("a file-less segment dir is never registered (hasParquetFiles guard)") {
    // a writer that leaves no part files (empty plan on an object store,
    // external tampering, future Spark behavior) must not poison the
    // manifest — the guard checks the DIR, not the plan
    val base = Files.createTempDirectory("graft-lsm-guard")
    val fl = base.resolve("seg=a0")
    Files.createDirectories(fl)
    Files.writeString(fl.resolve("_SUCCESS"), "")
    SegmentStore.hasParquetFiles(fl) shouldBe false
    val ok = base.resolve("seg=a1")
    Files.createDirectories(ok)
    Files.writeString(ok.resolve("part-00000-x.snappy.parquet"), "")
    SegmentStore.hasParquetFiles(ok) shouldBe true
  }

  test("delete-only batches tip the compaction trigger; markers stay bounded") {
    val dir = Files.createTempDirectory("graft-lsm-del-heavy").toString
    def total(): Int = {
      val m = SegmentStore.readManifest(dir)
      m.segs.size + m.dels.size
    }
    send(dir, 0, Seq((1L, "u"), (2L, "u")), identityBuild)
    send(dir, 1, Seq((1L, "d")), identityBuild)
    total() shouldBe 2 // below threshold: 1 segment + 1 marker
    send(dir, 2, Seq((2L, "d")), identityBuild)
    // segs(1) + dels(2) hit the threshold 3 → compaction ran on a
    // fully-dead set: markers cleared, nothing live
    val m2 = SegmentStore.readManifest(dir)
    m2.dels shouldBe empty
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id").count() shouldBe 0L
    // however the stream continues, live segs + markers stay bounded
    (3L to 8L).foreach { b =>
      send(dir, b, Seq((90L + b, "d")), identityBuild)
      total() should be < 3
    }
    // and a reinsert after all that is live
    send(dir, 9, Seq((1L, "u")), identityBuild)
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id")
      .select("id").as[Long].collect().toSet shouldBe Set(1L)
  }

  test("rewrite swaps rows and param atomically; a crashed attempt's dir never resurfaces") {
    val dir = Files.createTempDirectory("graft-lsm-rewrite").toString
    send(dir, 0, Seq((1L, "u"), (2L, "u")), identityBuild)
    send(dir, 1, Seq((2L, "d")), identityBuild) // delete marker on 2

    // a CRASHED earlier rewrite attempt left an unreferenced dir at the
    // name the retry would otherwise pick
    Seq((99L, 99L, 0L)).toDF("id", "v", "batch")
      .write.parquet(s"${dir}/seg=r1x0")

    // the retry re-derives every live row (here: v doubled) under a new
    // parameter; delete markers are cleared (their rows are gone)
    SegmentStore.rewrite(spark, dir, segSchemaB, "id",
      rows => rows.select(col("id"), (col("v") * 2).as("v"), col("batch")),
      newParam = Some("gen-2"))
    val m = SegmentStore.readManifest(dir)
    m.lastBatch shouldBe 1L // a rewrite is not a data batch
    m.segs shouldBe Seq("seg=r1x1") // crashed attempt's name skipped
    m.dels shouldBe Nil
    m.param shouldBe Some("gen-2")
    Files.exists(Paths.get(dir, "seg=r1x0")) shouldBe false // never committed → pruned now
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id")
      .select("id", "v").as[(Long, Long)].collect().toSeq shouldBe Seq((1L, 2L))

    // the stream continues: redelivery contract intact (batch 1 skipped),
    // the param rides along through ordinary commits
    send(dir, 1, Seq((7L, "u")), identityBuild)
    SegmentStore.readManifest(dir).segs shouldBe Seq("seg=r1x1")
    send(dir, 2, Seq((7L, "u")), identityBuild)
    SegmentStore.readManifest(dir).param shouldBe Some("gen-2")
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 7L)
  }

  test("a probe planned against an old manifest survives compaction (prune grace)") {
    val dir = Files.createTempDirectory("graft-lsm-grace").toString
    send(dir, 0, Seq((1L, "u"), (2L, "u")), identityBuild)
    send(dir, 1, Seq((3L, "u")), identityBuild)
    // a probe in flight: planned against the 2-segment manifest, scan
    // deferred — on a cluster this runs long after the manifest read
    val inFlight = SegmentStore.readSegments(spark, dir, segSchemaB)
    SegmentStore.readManifest(dir).segs shouldBe Seq("seg=a0", "seg=a1")

    // maintenance compacts underneath it (3rd segment hits threshold 3)
    send(dir, 2, Seq((4L, "u")), identityBuild)
    val m2 = SegmentStore.readManifest(dir)
    m2.segs shouldBe Seq("seg=c2")
    m2.pending.map(_._1).toSet shouldBe Set("seg=a0", "seg=a1")
    // the in-flight probe still completes — its dirs are parked, not gone
    inFlight.count() shouldBe 3L
    Files.exists(Paths.get(dir, "seg=a0")) shouldBe true

    // two commits later the grace window passes and the dirs are deleted
    send(dir, 3, Seq((5L, "u")), identityBuild)
    Files.exists(Paths.get(dir, "seg=a0")) shouldBe true // dead@2, 2 > 3-2
    send(dir, 4, Seq((6L, "u")), identityBuild)
    Files.exists(Paths.get(dir, "seg=a0")) shouldBe false
    Files.exists(Paths.get(dir, "seg=a1")) shouldBe false
    SegmentStore.readManifest(dir).pending.map(_._1) should not contain "seg=a0"
    // live answers were right the whole time
    SegmentStore.liveRows(SegmentStore.readSegments(spark, dir, segSchemaB),
      SegmentStore.readDels(spark, dir, "id"), "id")
      .select("id").as[Long].collect().toSet shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L)
  }

  test("markers with no live segments clear at the threshold (inert branch)") {
    val dir = Files.createTempDirectory("graft-lsm-inert").toString
    // no segment ever lands (file-less builds); delete markers alone must
    // still clear — a marker only suppresses STRICTLY OLDER rows, and
    // none exist
    send(dir, 0, Seq((1L, "d")), fileLess)
    send(dir, 1, Seq((2L, "d")), fileLess)
    SegmentStore.readManifest(dir).dels should have size 2
    send(dir, 2, Seq((3L, "d")), fileLess)
    val m = SegmentStore.readManifest(dir)
    m.lastBatch shouldBe 2L
    m.segs shouldBe empty
    m.dels shouldBe empty
    SegmentStore.readDels(spark, dir, "id").count() shouldBe 0L
  }
}
