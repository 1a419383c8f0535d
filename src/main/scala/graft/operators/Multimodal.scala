package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video travel as
  * opaque `binary` payloads with typed metadata, and feature extraction
  * runs batched per partition — the Spark-side shape (schema,
  * partitioning, batch iteration) is real. The IMAGE and AUDIO codecs
  * are real too: [[decodeImage]] is pure-JVM `javax.imageio` (PNG/BMP/
  * GIF, no native libraries) and [[decodeWav]] is pure-JVM
  * `javax.sound.sampled` WAV/PCM parsing — both exercised end-to-end by
  * the `mm_decode` / `mm_audio` gates against generated fixtures whose
  * pixel/sample values an external oracle recomputes exactly (PNG and
  * WAV PCM are lossless). Only VIDEO decode remains a deterministic
  * stub (no codec libraries ship in this environment).
  *
  * Scale notes: payloads never shuffle for metadata-only queries (column
  * pruning drops them at the scan); feature extraction is `mapPartitions`
  * so the decoder amortizes codec init per partition, the same shape as
  * a Pandas-UDF batch pipeline.
  */
object Multimodal {

  // ---- real image codec (javax.imageio — pure JVM) -----------------------

  /** The `mm_decode` fixture's pixel formula, shared with the generated
    * DuckDB oracle (drift discipline): channel c of pixel (x, y) in
    * image `id` is `(id·k0 + x·k1 + y·k2) mod 256` with (k0, k1, k2) =
    * `PixelCoef(c)`. PNG is lossless, so encode → decode must reproduce
    * these exact values — which makes the REAL decoder externally
    * verifiable without shipping binary fixtures. */
  val PixelCoef: Seq[(Long, Long, Long)] =
    Seq((31L, 7L, 13L), (17L, 5L, 11L), (23L, 3L, 19L))

  /** Fixture edge (16×16) and the resize target (8×8) for `mm_decode`. */
  val FixtureSize = 16
  val FixtureResize = 8

  private def pixelChannel(id: Long, x: Int, y: Int, c: Int): Int = {
    val (k0, k1, k2) = PixelCoef(c)
    ((id * k0 + x * k1 + y * k2) % 256L).toInt
  }

  /** Deterministic RGB PNG for image `id`: every channel follows
    * [[PixelCoef]]'s formula. */
  def syntheticPng(id: Long, size: Int = FixtureSize): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(size, size,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        img.setRGB(x, y, (pixelChannel(id, x, y, 0) << 16) |
          (pixelChannel(id, x, y, 1) << 8) | pixelChannel(id, x, y, 2))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode — pure-JVM `javax.imageio` (PNG/BMP/GIF out of
    * the box). None when the payload is not a decodable image OR is
    * recognized but corrupt (ImageIO.read throws IIOException/
    * EOFException on a truncated PNG — at corpus scale a dirty payload
    * must drop its row, never fail the task), so a mixed-modality
    * column degrades row-wise. RuntimeException is caught too: the JDK
    * plugins throw unchecked errors on some malformed headers. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** Exact per-channel pixel sums — integers, so an external oracle can
    * reproduce them bit-for-bit (float means could not be compared). */
  def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (r, g, b) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    (r, g, b)
  }

  /** REAL nearest-neighbor resize on decoded pixels: output (x, y) takes
    * source (x·srcW/outW, y·srcH/outH) — integer division, the exact
    * mapping the oracle mirrors. */
  def resizeImage(img: java.awt.image.BufferedImage, outW: Int,
                  outH: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(outW, outH,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        out.setRGB(x, y, img.getRGB(
          (x.toLong * img.getWidth / outW).toInt,
          (y.toLong * img.getHeight / outH).toInt))
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- real video codec (multi-frame GIF via javax.imageio) --------------

  /** The `mm_video` fixture's pixel formula: gray level of pixel (x, y)
    * in frame f of clip `id` is `(id·k0 + f·k1 + x·k2 + y·k3) mod 256`
    * with coefficients [[VideoCoef]]. GIF is lossless for ≤256 colors
    * and the fixture uses the full 256-level gray palette, so encode →
    * decode must reproduce these exact values. */
  val VideoCoef: (Long, Long, Long, Long) = (11L, 41L, 7L, 13L)
  val VideoFrames = 8
  val VideoSize = 16
  val VideoStride = 2

  private def videoGray(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * VideoCoef._1 + f * VideoCoef._2 + x * VideoCoef._3 +
      y * VideoCoef._4) % 256L).toInt

  /** Deterministic multi-frame grayscale GIF for clip `id` — the
    * "video" fixture: `nFrames` full frames, no inter-frame delta
    * compression tricks, written with the JDK's own GIF sequence
    * writer. */
  def syntheticGif(id: Long, nFrames: Int = VideoFrames,
                   size: Int = VideoSize): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // identity gray PALETTE, not TYPE_BYTE_GRAY: getRGB on a gray
      // colorspace image applies linear-gray → sRGB conversion, which
      // would break the exact round trip; an IndexColorModel with
      // entry i = (i, i, i) is stored verbatim in the GIF
      val cmap = Array.tabulate(256)(i => (0xff << 24) | (i << 16) | (i << 8) | i)
      val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false,
        -1, java.awt.image.DataBuffer.TYPE_BYTE)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(size, size,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            raster.setSample(x, y, 0, videoGray(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** One REAL decoded video frame: index, dimensions, exact gray sum. */
  case class FrameStats(media_id: Long, frame_idx: Int, width: Int,
                        height: Int, gray_sum: Long)

  /** REAL keyframe extraction — pure-JVM `javax.imageio` multi-frame
    * GIF read: every `stride`-th frame decoded to pixels and reduced to
    * exact integer gray sums. Empty for non-GIF payloads (row-wise
    * degradation, like the image and audio paths). This replaces the
    * byte-chunking [[sampleFrames]] stub with an actual container
    * parse: frame COUNT comes from the file, not from byte arithmetic. */
  def decodeGifFrames(payload: Array[Byte],
                      stride: Int = VideoStride): Seq[FrameStats] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) Nil
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          if (r.getFormatName.toLowerCase != "gif") Nil
          else {
            val n = r.getNumImages(true)
            (0 until n by stride).map { i =>
              val img = r.read(i)
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += (img.getRGB(x, y) & 0xff)
                  x += 1
                }
                y += 1
              }
              FrameStats(0L, i, img.getWidth, img.getHeight, sum)
            }
          }
        } finally r.dispose()
      }
    } catch {
      // IOException for truncated containers; RuntimeException because
      // the JDK GIF plugin throws unchecked errors (e.g. on malformed
      // frame tables) — both mean "this payload's frames are gone", a
      // row-wise drop, not a task failure
      case _: java.io.IOException => Nil
      case _: RuntimeException => Nil
    }

  /** Batched multi-frame decode over a binary video column — the video
    * twin of [[decodeImageStats]]/[[decodeAudioStats]], flatMap-shaped
    * like real keyframe extraction (one row → few frames). */
  def decodeVideoFrames(media: Dataset[MediaRecord],
                        stride: Int = VideoStride)
                       (implicit spark: SparkSession): Dataset[FrameStats] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap(m =>
        decodeGifFrames(m.payload, stride).map(_.copy(media_id = m.media_id)))
    }
  }

  /** Per-image decode + stats row: dimensions and exact channel sums of
    * the decoded image and of its [[resizeImage nearest-neighbor]]
    * `resizeTo`×`resizeTo` thumbnail. */
  case class ImageStats(media_id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long,
                        r_width: Int, r_height: Int,
                        rsum_r: Long, rsum_g: Long, rsum_b: Long)

  /** Batched decode over a binary image column: one codec pass per
    * partition, real pixels end to end. Undecodable payloads are
    * dropped (flatMap), keeping the operator total on dirty corpora. */
  def decodeImageStats(media: Dataset[MediaRecord],
                       resizeTo: Int = FixtureResize)
                      (implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        decodeImage(m.payload).map { img =>
          val (r, g, b) = channelSums(img)
          val small = resizeImage(img, resizeTo, resizeTo)
          val (r2, g2, b2) = channelSums(small)
          ImageStats(m.media_id, img.getWidth, img.getHeight, r, g, b,
            small.getWidth, small.getHeight, r2, g2, b2)
        }
      }
    }
  }

  /** A media row: payload plus typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  // ---- real audio codec (javax.sound.sampled — pure JVM) -----------------

  /** The `mm_audio` fixture's sample formula, shared with the generated
    * DuckDB oracle: 16-bit PCM sample k of clip `id` is
    * `((id·k0 + k·k1) mod 65536) − 32768` with (k0, k1) = [[AudioCoef]].
    * WAV PCM is lossless, so encode → decode must reproduce these exact
    * values. */
  val AudioCoef: (Long, Long) = (17L, 29L)
  val AudioSamples = 2048
  val AudioRate = 8000

  private def audioSample(id: Long, k: Int): Int =
    (((id * AudioCoef._1 + k * AudioCoef._2) % 65536L) - 32768L).toInt

  /** Deterministic mono 16-bit PCM WAV for clip `id`, following
    * [[AudioCoef]]'s formula. */
  def syntheticWav(id: Long, nSamples: Int = AudioSamples): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var k = 0
    while (k < nSamples) {
      val s = audioSample(id, k)
      pcm(2 * k) = (s & 0xff).toByte          // little-endian
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      AudioRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded-audio stats: real header fields plus exact integer sample
    * sums an external oracle can reproduce. */
  case class AudioStats(media_id: Long, sample_rate: Long, channels: Long,
                        n_samples: Long, sum_amp: Long, sum_abs: Long)

  /** REAL audio decode — pure-JVM `javax.sound.sampled` WAV/PCM parsing
    * (no audio device touched: file parsing only, headless-safe). None
    * when the payload is not a decodable audio file, so a mixed column
    * degrades row-wise. */
  def decodeWav(payload: Array[Byte]): Option[AudioStats] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
      else {
        val bytes = ais.readAllBytes()
        var (sum, sabs) = (0L, 0L)
        var i = 0
        while (i + 1 < bytes.length) {
          val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort.toInt
          sum += s; sabs += math.abs(s)
          i += 2
        }
        Some(AudioStats(0L, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, bytes.length / 2L, sum, sabs))
      }
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Batched WAV decode over a binary audio column — the audio twin of
    * [[decodeImageStats]]. */
  def decodeAudioStats(media: Dataset[MediaRecord])
                      (implicit spark: SparkSession): Dataset[AudioStats] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap(m => decodeWav(m.payload).map(_.copy(media_id = m.media_id)))
    }
  }

  /** Extracted features: fixed-width vector + provenance metadata.
    * `slot_sums` are the exact per-slot byte sums the float features
    * derive from — integer, so an external oracle can reproduce them
    * bit-for-bit where float accumulation could not be compared. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           sha256: String, features: Array[Float],
                           slot_sums: Array[Long])

  /** A sampled frame: every `stride`-th fixed-size chunk of the payload
    * (the video-frame-sampling shape: one input row → few output rows,
    * payload chunked positionally). */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Exact per-slot byte sums: slot j accumulates payload bytes at
    * positions ≡ j (mod 8). Integer arithmetic — oracle-reproducible. */
  def byteSlotSums(payload: Array[Byte]): Array[Long] = {
    val out = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    out
  }

  /** STUB — stands in for an image/audio decode + model embed. Produces a
    * deterministic 8-dim feature from the payload bytes so tests can
    * assert end-to-end plumbing. A real deployment swaps only this
    * function. */
  def stubDecodeAndEmbed(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** STUB resize — nearest-neighbor decimation of the payload to
    * `outBytes` samples (byte k of the output is input byte
    * (k·len) / outBytes, integer division). Stands in for an image
    * thumbnail/resample; the positional-selection shape and the
    * binary→binary signature are what a real codec plugs into. Payloads
    * shorter than `outBytes` pass through unchanged. */
  def resizeStub(payload: Array[Byte], outBytes: Int = 32): Array[Byte] = {
    if (payload.length <= outBytes) return payload
    val out = new Array[Byte](outBytes)
    var k = 0
    while (k < outBytes) {
      out(k) = payload((k.toLong * payload.length / outBytes).toInt)
      k += 1
    }
    out
  }

  /** Frame sampling: chunk the payload into `frameBytes` frames and keep
    * every `stride`-th one (frame_idx keeps the original frame number).
    * The last frame may be short. One row in → ceil(nframes/stride) rows
    * out, flatMap-shaped like real video keyframe extraction. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64,
                   stride: Int = 4)
                  (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 =>
          MediaFrame(m.media_id, idx, chunk)
      }
    }
  }

  /** documents → media records, treating the text bytes as an opaque
    * payload (the testdata carries no true binary column; the plumbing
    * is payload-agnostic). */
  def asMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction: one codec/digest instance
    * per partition, streaming over records. */
  def extractFeatures(media: Dataset[MediaRecord])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        digest.reset()
        val sha = digest.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length, sha,
          stubDecodeAndEmbed(m.payload), byteSlotSums(m.payload))
      }
    }
  }
}
