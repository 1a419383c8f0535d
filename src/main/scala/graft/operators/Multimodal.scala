package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video travel as
  * opaque `binary` payloads with typed metadata, and feature extraction
  * runs batched per partition — the Spark-side shape (schema,
  * partitioning, batch iteration) is real. So are all three codecs:
  * [[decodeImage]] is pure-JVM `javax.imageio` (PNG/BMP/GIF, no native
  * libraries), [[decodeWav]] is pure-JVM `javax.sound.sampled` WAV/PCM
  * parsing, and [[decodeGifFrames]]/[[sampleKeyframes]] parse
  * multi-frame GIF containers — each exercised end-to-end by the
  * `mm_*` gates against generated fixtures whose pixel/sample values
  * an external oracle recomputes exactly (PNG, WAV PCM and ≤256-color
  * GIF are lossless).
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

  /** Shared GIF container parse: folds `f` over every `stride`-th
    * decoded frame of `payload`; Nil for non-GIF or corrupt payloads
    * (row-wise degradation — IOException for truncated containers,
    * RuntimeException because the JDK GIF plugin throws unchecked
    * errors on malformed frame tables). The `ImageInputStream` is
    * ALWAYS closed: with ImageIO's default `useCache=true` it is
    * backed by a DISK TEMP FILE plus a file descriptor per payload,
    * which a corpus-scale `mapPartitions` would otherwise strand until
    * GC ("too many open files" on long-lived executors). */
  private def foldGifFrames[A](payload: Array[Byte], stride: Int)(
      f: (Int, java.awt.image.BufferedImage) => A): Seq[A] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      if (iis == null) Nil
      else try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Nil
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            if (r.getFormatName.toLowerCase != "gif") Nil
            else (0 until r.getNumImages(true) by stride)
              .map(i => f(i, r.read(i)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch {
      case _: java.io.IOException => Nil
      case _: RuntimeException => Nil
    }

  /** REAL frame extraction — pure-JVM `javax.imageio` multi-frame
    * GIF read: every `stride`-th frame decoded to pixels and reduced to
    * exact integer gray sums. Empty for non-GIF payloads (row-wise
    * degradation, like the image and audio paths); frame COUNT comes
    * from the container, not from byte arithmetic. */
  def decodeGifFrames(payload: Array[Byte],
                      stride: Int = VideoStride): Seq[FrameStats] =
    foldGifFrames(payload, stride) { (i, img) =>
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

  /** Positional byte decimation: output byte k is input byte
    * (k·len) / outBytes (integer division), payloads shorter than
    * `outBytes` pass through unchanged. This is a fixed-size payload
    * SAMPLE — cheap, deterministic, format-agnostic — for binary
    * fingerprinting, grouping, and transfer-size capping; it is NOT an
    * image resize (no decode: pixels, channels, and scanlines are
    * ignored). The real nearest-neighbor thumbnail is
    * [[resizeImageStats]] / `mm_resize`, which decodes via
    * `javax.imageio` and resamples in pixel space. */
  def decimateBytes(payload: Array[Byte], outBytes: Int = 32): Array[Byte] = {
    if (payload.length <= outBytes) return payload
    val out = new Array[Byte](outBytes)
    var k = 0
    while (k < outBytes) {
      out(k) = payload((k.toLong * payload.length / outBytes).toInt)
      k += 1
    }
    out
  }

  /** The mixed-modality fixture's kind assignment, shared with the
    * generated oracles (drift discipline): record `id` carries a
    * `MediaKinds(id mod 3)` payload. */
  val MediaKinds: Seq[String] = Seq("image/png", "audio/wav", "video/gif")

  /** Deterministic mixed-modality media record for `id`: the payload is
    * the REAL encoded fixture of the kind `id mod 3` selects
    * ([[syntheticPng]] / [[syntheticWav]] / [[syntheticGif]]), so one
    * column genuinely carries three codecs' bytes side by side. */
  def syntheticMedia(id: Long): MediaRecord = {
    val kind = MediaKinds((id % 3).toInt)
    val payload = kind match {
      case "image/png" => syntheticPng(id)
      case "audio/wav" => syntheticWav(id)
      case _           => syntheticGif(id)
    }
    MediaRecord(id, kind, payload)
  }

  /** Uniform per-record features of a mixed-modality column, derived
    * from DECODED content (not payload bytes): `n_units` counts the
    * modality's natural unit (pixels / samples / frames), `v_sum` and
    * `v_abs` are exact integer sums over decoded values — signed for
    * audio, where the two differ. */
  case class ModalFeatures(media_id: Long, kind: String, n_units: Long,
                           v_sum: Long, v_abs: Long)

  /** Batched mixed-modality feature extraction: dispatches each record
    * to the REAL codec its typed `kind` metadata names (the documented
    * multimodal-column design — binary payload + typed metadata; byte
    * sniffing would mis-route GIF, which `ImageIO` also reads as a
    * still image). One codec pass per partition; undecodable payloads
    * and unknown kinds drop row-wise, keeping the operator total on
    * dirty corpora. */
  def extractModalFeatures(media: Dataset[MediaRecord])
                          (implicit spark: SparkSession): Dataset[ModalFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        m.kind match {
          case "image/png" =>
            decodeImage(m.payload).map { img =>
              val (r, g, b) = channelSums(img)
              ModalFeatures(m.media_id, m.kind,
                img.getWidth.toLong * img.getHeight, r + g + b, r + g + b)
            }
          case "audio/wav" =>
            decodeWav(m.payload).map(a =>
              ModalFeatures(m.media_id, m.kind, a.n_samples, a.sum_amp,
                a.sum_abs))
          case "video/gif" =>
            val frames = decodeGifFrames(m.payload, stride = 1)
            if (frames.isEmpty) None
            else Some(ModalFeatures(m.media_id, m.kind, frames.length.toLong,
              frames.map(_.gray_sum).sum, frames.map(_.gray_sum).sum))
          case _ => None
        }
      }
    }
  }

  /** Keyframe stride for [[sampleVideoKeyframes]] — deliberately NOT
    * [[VideoStride]], so the keyframe gate and `mm_video` pin different
    * frame subsets of the same container. */
  val KeyframeStride = 3

  /** A sampled keyframe plus a motion feature: `gray_sum` is the exact
    * gray total of the kept frame, `delta_abs` the exact sum of
    * per-pixel absolute differences against the PREVIOUS kept frame
    * (0 for the first) — the frame-delta energy a scene-cut detector
    * thresholds. */
  case class KeyframeStats(media_id: Long, frame_idx: Int, width: Int,
                           height: Int, gray_sum: Long, delta_abs: Long)

  /** REAL keyframe sampling over one GIF payload: every `stride`-th
    * frame decoded to pixels, reduced to its gray sum and the motion
    * delta against the previously kept frame. Same container parse and
    * row-wise corrupt-payload degradation as [[decodeGifFrames]]
    * (shared [[foldGifFrames]] scaffolding — the delta fold is the
    * only difference). */
  def sampleKeyframes(payload: Array[Byte],
                      stride: Int = KeyframeStride): Seq[KeyframeStats] = {
    var prev: java.awt.image.BufferedImage = null
    foldGifFrames(payload, stride) { (i, img) =>
      var (sum, delta) = (0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val g = img.getRGB(x, y) & 0xff
          sum += g
          if (prev != null)
            delta += math.abs(g - (prev.getRGB(x, y) & 0xff))
          x += 1
        }
        y += 1
      }
      prev = img
      KeyframeStats(0L, i, img.getWidth, img.getHeight, sum, delta)
    }
  }

  /** Batched keyframe sampling over a binary video column — flatMap-
    * shaped (one clip → few keyframes), one reader per payload, codec
    * init amortized per partition. */
  def sampleVideoKeyframes(media: Dataset[MediaRecord],
                           stride: Int = KeyframeStride)
                          (implicit spark: SparkSession): Dataset[KeyframeStats] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap(m =>
        sampleKeyframes(m.payload, stride).map(_.copy(media_id = m.media_id)))
    }
  }
}
