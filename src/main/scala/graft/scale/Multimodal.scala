package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travels as opaque
  * `BINARY` columns with typed metadata alongside — the Spark-side plumbing
  * (schemas, partitioning, batch iteration) is real; only the codec itself is
  * a STUB, because no media libraries exist in this environment.
  *
  * Design for 100 TB: binary payloads stay columnar in parquet (never
  * exploded), metadata extraction is a narrow per-row projection, and batch
  * decoding runs per-partition so a real codec amortizes model/codec init
  * once per partition (the `mapPartitions` shape below — the Scala analogue
  * of a Pandas-UDF `mapInPandas` pipeline).
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload — all codegen'd built-ins
    * over BINARY (sha2, hex, substring, octet_length).
    */
  def mediaMeta(bin: Column): Column = struct(
    octet_length(bin).as("byte_len"),
    sha2(bin, 256).as("sha256"),
    lower(hex(substring(bin, 1, 8))).as("magic"))

  /** Frame sampling: fixed-size windows at a stride over the payload —
    * the access pattern of video frame extraction / audio chunking, done with
    * array expressions (no data leaves the JVM, no UDF).
    */
  def sampleFrames(bin: Column, frameLen: Int, stride: Int): Column = {
    val nSteps = greatest(
      floor((octet_length(bin) - frameLen).cast(DoubleType) / stride).cast(LongType),
      lit(0L))
    transform(
      sequence(lit(0L), nSteps),
      i => bin.substr((i * stride + 1).cast(IntegerType), lit(frameLen)))
  }

  /** Nearest-neighbor byte resample of a binary payload to `outLen` bytes:
    * output byte i is the input byte at floor(i·inLen/outLen) — the resize
    * access pattern (strided downsample to a fixed-width output) without a
    * codec. A real image resize replaces the byte picker with pixel
    * arithmetic behind the [[decodeFrames]] seam; the dataflow (fixed
    * output width, positional gather, no data leaving the JVM) is the same.
    * Shorter-than-outLen payloads upsample by repetition; empty stays empty.
    */
  def resizeBytes(bin: Column, outLen: Int): Column =
    concat((0 until outLen).map { i =>
      // Long arithmetic: i * byte_len overflows Int for payloads > ~143 MB
      // (exactly the video/audio blobs this targets) — ANSI mode would
      // throw, non-ANSI would silently read from a negative position.
      bin.substr(
        (floor(lit(i.toLong) * octet_length(bin).cast(LongType) / outLen) + 1L)
          .cast(IntegerType),
        lit(1))
    }: _*)

  /** Decoded-frame feature record produced by the (stubbed) codec. */
  case class FrameFeature(doc_id: Long, frame_no: Int, width: Int, height: Int,
                          mean_byte: Double)

  /** Per-partition batch decode seam. The iteration/encoder/schema plumbing
    * is real; `decoder` is where a codec (JPEG/PCM/…) plugs in. The default
    * is a DETERMINISTIC FAKE (STUB): byte-statistics standing in for decoded
    * pixels — replace with a real implementation when media libs exist.
    */
  def decodeFrames(frames: Dataset[(Long, Int, Array[Byte])],
                   decoder: (Long, Int, Array[Byte]) => FrameFeature = stubDecoder)
                  : Dataset[FrameFeature] = {
    implicit val enc: Encoder[FrameFeature] = Encoders.product[FrameFeature]
    // one decoder instantiation per partition — where a real codec would
    // open its native context once and stream frames through it
    frames.mapPartitions { it => it.map { case (id, no, bytes) => decoder(id, no, bytes) } }
  }

  /** STUB codec: deterministic byte statistics in place of real decoding. */
  def stubDecoder(id: Long, frameNo: Int, bytes: Array[Byte]): FrameFeature = {
    val n = math.max(bytes.length, 1)
    val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff))
    FrameFeature(id, frameNo, width = n, height = 1, mean_byte = sum.toDouble / n)
  }
}
