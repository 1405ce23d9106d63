package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Full restart of the ATTACHED tx-replay query — a checkpointed file
  * source (recoverable, unlike MemoryStream), stop, a NEW StreamingQuery
  * over the same checkpoint + stateRoot, more data: the continuation must
  * join against state buffered before the restart and emit each (key, tx)
  * exactly once across the two incarnations.
  */
class TxReplayRestartE2ESpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val rowSchema = StructType(Seq(
    StructField("purchaser", IntegerType), StructField("shipping_address", StringType)))
  private val wireSchema = StructType(Seq(
    StructField("stream", StringType), StructField("key", LongType),
    StructField("line_id", LongType), StructField("op", StringType),
    StructField("lsn", LongType), StructField("tx_id", LongType),
    StructField("row", rowSchema),
    StructField("commit_lsn", LongType), StructField("expected_left", LongType),
    StructField("expected_right", LongType)))

  private def l(key: Long, lsn: Long, tx: Long, addr: String) =
    s"""{"stream":"l","key":$key,"line_id":-1,"op":"c","lsn":$lsn,"tx_id":$tx,"row":{"purchaser":9,"shipping_address":"$addr"},"commit_lsn":-1,"expected_left":-1,"expected_right":-1}"""
  private def r(key: Long, line: Long, lsn: Long, tx: Long) =
    s"""{"stream":"r","key":$key,"line_id":$line,"op":"c","lsn":$lsn,"tx_id":$tx,"row":{"purchaser":-1,"shipping_address":null},"commit_lsn":-1,"expected_left":-1,"expected_right":-1}"""
  private def t(tx: Long, commit: Long, el: Long, er: Long) =
    s"""{"stream":"t","key":-1,"line_id":-1,"op":null,"lsn":-1,"tx_id":$tx,"row":null,"commit_lsn":$commit,"expected_left":$el,"expected_right":$er}"""

  test("attach survives a query restart: buffered state joins, exactly-once across incarnations") {
    val srcDir = Files.createTempDirectory("graft-e2e-src").toString
    val stateRoot = Files.createTempDirectory("graft-e2e-state").toString
    val checkpoint = Files.createTempDirectory("graft-e2e-ckpt").toString
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()

    def start() = TxReplayStream.attach(
      spark.readStream.schema(wireSchema).json(srcDir),
      stateRoot, checkpoint) { (docs, _) =>
      emitted ++= docs.collect().map(d =>
        (d.getAs[Long]("key"), d.getAs[Long]("commit_lsn"),
          d.getStruct(d.fieldIndex("row")).getString(1)))
    }

    // incarnation 1: tx 1 commits fully (emits); tx 2's order+line arrive
    // but its END does not — they must survive in replay state
    Files.writeString(Paths.get(srcDir, "f1.json"),
      Seq(l(1, 1, 1, "addr-1"), r(1, 10, 2, 1), t(1, 100, 1, 1),
          l(2, 3, 2, "addr-2"), r(2, 20, 4, 2)).mkString("", "\n", "\n"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    emitted.toList shouldBe List((1L, 100L, "addr-1"))

    // incarnation 2: same checkpoint + stateRoot, NEW query object. Only tx
    // 2's END arrives — the doc must be assembled from pre-restart state.
    Files.writeString(Paths.get(srcDir, "f2.json"),
      Seq(t(2, 200, 1, 1)).mkString("", "\n", "\n"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    emitted.toList shouldBe List((1L, 100L, "addr-1"), (2L, 200L, "addr-2"))
  }
}
