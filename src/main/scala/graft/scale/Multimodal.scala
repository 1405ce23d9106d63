package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travels as opaque
  * `BINARY` columns with typed metadata alongside — the Spark-side plumbing
  * (schemas, partitioning, batch iteration) is real, and the decode seam
  * carries a REAL raster codec ([[decodeBmp]]: 24bpp BI_RGB BMP, pure
  * offset arithmetic — no media library needed); compressed codecs
  * (JPEG/PNG/PCM) remain stubs behind the same seam because their
  * libraries don't exist in this environment.
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

  // ---- real image decode: BMP (24bpp BI_RGB) ----
  // The one raster format with a fully fixed byte layout — decodable with
  // nothing but offset arithmetic, so the decode seam can carry a REAL
  // codec in this zero-dependency environment. JPEG/PNG/audio swap in
  // behind the same [[decodeImages]] shape.

  /** Decoded image features: dimensions + per-channel means. */
  case class ImageFeature(doc_id: Long, frame_no: Int, width: Int, height: Int,
                          mean_r: Double, mean_g: Double, mean_b: Double)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Serialize a 24bpp bottom-up BI_RGB BMP. `pixel(x, y)` returns (r, g, b)
    * with y=0 the TOP row (the writer handles the bottom-up flip). Rows are
    * padded to 4-byte boundaries per the format.
    */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      out(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putU32(2, 54L + dataSize); putU32(10, 54)              // file size, data offset
    putU32(14, 40); putU32(18, width); putU32(22, height)  // info header
    putU16(26, 1); putU16(28, 24)                          // planes, bpp
    putU32(30, 0); putU32(34, dataSize)                    // BI_RGB, image size
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowBytes        // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(rowOff + x * 3) = b.toByte                     // B, G, R order
        out(rowOff + x * 3 + 1) = g.toByte
        out(rowOff + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24bpp uncompressed BMP to dimensions + per-channel means —
    * pure offset arithmetic over the fixed layout (file header 14B, info
    * header 40B, bottom-up rows padded to 4 bytes). Throws on anything
    * that is not a 24bpp BI_RGB BMP: at scale, route undecodable payloads
    * through a quarantine branch like [[graft.cdc.Envelope.decodeQuarantine]].
    */
  def decodeBmp(id: Long, frameNo: Int, bytes: Array[Byte]): ImageFeature = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      s"not a BMP payload (${bytes.length} bytes)")
    require(u16(bytes, 28) == 24 && u32(bytes, 30) == 0,
      s"unsupported BMP variant: bpp=${u16(bytes, 28)} compression=${u32(bytes, 30)}")
    val dataOff = u32(bytes, 10).toInt
    val width = u32(bytes, 18).toInt
    val height = u32(bytes, 22).toInt
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rowBytes = (width * 3 + 3) / 4 * 4
    require(bytes.length >= dataOff + rowBytes * height, "truncated pixel data")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < height) {
      val rowOff = dataOff + y * rowBytes
      var x = 0
      while (x < width) {
        sb += bytes(rowOff + x * 3) & 0xff
        sg += bytes(rowOff + x * 3 + 1) & 0xff
        sr += bytes(rowOff + x * 3 + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    ImageFeature(id, frameNo, width, height,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Per-partition batch image decode — [[decodeFrames]]'s shape with the
    * REAL (BMP) codec plugged into the seam.
    */
  def decodeImages(frames: Dataset[(Long, Int, Array[Byte])],
                   decoder: (Long, Int, Array[Byte]) => ImageFeature = decodeBmp)
                  : Dataset[ImageFeature] = {
    implicit val enc: Encoder[ImageFeature] = Encoders.product[ImageFeature]
    frames.mapPartitions { it => it.map { case (id, no, bytes) => decoder(id, no, bytes) } }
  }

  /** Deterministic synthetic test image for `doc_id`: dimensions and every
    * pixel are closed-form functions of (doc_id, x, y), so an oracle can
    * recompute the decoded statistics WITHOUT parsing BMP — which is what
    * makes the decoder driver-verifiable end to end (q_multimodal_decode).
    */
  def syntheticBmp(docId: Long): Array[Byte] = {
    val w = (4 + docId % 5).toInt
    val h = (3 + docId % 4).toInt
    encodeBmp(w, h, (x, y) => (
      ((x * 7 + y * 13 + docId) % 256).toInt,
      ((x * 3 + y * 5 + 2 * docId) % 256).toInt,
      ((x + y + 3 * docId) % 256).toInt))
  }

  // ---- real audio decode: WAV (PCM s16le) ----
  // The second fully fixed-layout media format — RIFF chunks + raw
  // little-endian samples, decodable with offset arithmetic alone — proving
  // the [[decodeFrames]] seam generalizes beyond images: same partition-
  // batched shape, a different real codec plugged in.

  /** Decoded audio features: format fields + amplitude statistics over all
    * interleaved samples (`n_samples` counts samples across channels).
    */
  case class AudioFeature(doc_id: Long, frame_no: Int, sample_rate: Int,
                          channels: Int, n_samples: Long,
                          mean_abs: Double, rms: Double)

  /** Serialize a PCM s16le WAV (RIFF/WAVE, 16-byte fmt chunk, data chunk).
    * `samples` are interleaved across channels.
    */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"bad format $sampleRate/$channels")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putU16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(off: Int, v: Long): Unit = (0 until 4).foreach { i =>
      out(off + i) = ((v >> (8 * i)) & 0xff).toByte
    }
    def putTag(off: Int, tag: String): Unit =
      tag.zipWithIndex.foreach { case (c, i) => out(off + i) = c.toByte }
    putTag(0, "RIFF"); putU32(4, 36L + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putU32(16, 16)
    putU16(20, 1) // PCM
    putU16(22, channels); putU32(24, sampleRate)
    putU32(28, sampleRate.toLong * channels * 2) // byte rate
    putU16(32, channels * 2); putU16(34, 16)     // block align, bits
    putTag(36, "data"); putU32(40, dataSize)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(44 + i * 2) = (s & 0xff).toByte
      out(44 + i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  /** Decode a PCM s16le WAV to format fields + amplitude statistics — a
    * RIFF chunk walk (fmt/data chunks in any order, unknown chunks
    * skipped per the spec) and a little-endian sample scan. Throws on
    * non-PCM / non-16-bit payloads: at scale, route undecodable payloads
    * through a quarantine branch like [[graft.cdc.Envelope.decodeQuarantine]].
    */
  def decodeWavPcm16(id: Long, frameNo: Int, bytes: Array[Byte]): AudioFeature = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      s"not a RIFF/WAVE payload (${bytes.length} bytes)")
    var off = 12
    var sampleRate = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val tag = new String(bytes.slice(off, off + 4), "US-ASCII")
      val len = u32(bytes, off + 4).toInt
      tag match {
        case "fmt " =>
          require(u16(bytes, off + 8) == 1, s"not PCM: fmt=${u16(bytes, off + 8)}")
          channels = u16(bytes, off + 10)
          sampleRate = u32(bytes, off + 12).toInt
          require(u16(bytes, off + 22) == 16,
            s"not 16-bit: bits=${u16(bytes, off + 22)}")
        case "data" => dataOff = off + 8; dataLen = len
        case _ => // unknown chunk: skip (LIST, fact, ...)
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "missing fmt chunk")
    require(dataOff >= 0 && bytes.length >= dataOff + dataLen, "missing/truncated data chunk")
    val n = dataLen / 2
    var sumAbs = 0L; var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(dataOff + i * 2) & 0xff) |
        (bytes(dataOff + i * 2 + 1) << 8)).toShort.toInt
      sumAbs += math.abs(s); sumSq += s.toLong * s
      i += 1
    }
    val d = math.max(n, 1)
    AudioFeature(id, frameNo, sampleRate, channels, n,
      sumAbs.toDouble / d, math.sqrt(sumSq.toDouble / d))
  }

  /** Per-partition batch audio decode — [[decodeFrames]]'s shape with the
    * REAL (PCM WAV) codec plugged into the seam.
    */
  def decodeAudio(frames: Dataset[(Long, Int, Array[Byte])],
                  decoder: (Long, Int, Array[Byte]) => AudioFeature = decodeWavPcm16)
                 : Dataset[AudioFeature] = {
    implicit val enc: Encoder[AudioFeature] = Encoders.product[AudioFeature]
    frames.mapPartitions { it => it.map { case (id, no, bytes) => decoder(id, no, bytes) } }
  }

  /** Deterministic synthetic WAV for `doc_id`: format fields and every
    * sample are closed-form functions of (doc_id, i), so the oracle
    * recomputes the decoded statistics WITHOUT parsing RIFF
    * (q_multimodal_audio — the audio analogue of [[syntheticBmp]]).
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val sampleRate = (8000 + (docId % 4) * 4000).toInt
    val channels = (1 + docId % 2).toInt
    val n = ((16 + docId % 17) * channels).toInt
    val samples = Array.tabulate(n)(i =>
      (((i * 37 + docId * 101) % 2048) - 1024).toShort)
    encodeWavPcm16(sampleRate, channels, samples)
  }
}
