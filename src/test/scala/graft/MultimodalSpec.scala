package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("extractModalFeatures: typed kind routes each record to its real codec") {
    implicit val s = spark
    import s.implicits._
    // one column, three codecs: kind metadata dispatches — byte
    // sniffing could not (ImageIO also reads a GIF as a still image)
    val media = (0L until 9L).map(Multimodal.syntheticMedia).toDS()
    val feats = Multimodal.extractModalFeatures(media).collect()
      .sortBy(_.media_id)
    assert(feats.length == 9)
    feats.foreach { f =>
      assert(f.kind == Multimodal.MediaKinds((f.media_id % 3).toInt))
      f.kind match {
        case "image/png" =>
          val img = Multimodal.decodeImage(
            Multimodal.syntheticPng(f.media_id)).get
          val (r, g, b) = Multimodal.channelSums(img)
          assert(f.n_units == Multimodal.FixtureSize * Multimodal.FixtureSize
            && f.v_sum == r + g + b && f.v_abs == f.v_sum)
        case "audio/wav" =>
          val st = Multimodal.decodeWav(
            Multimodal.syntheticWav(f.media_id)).get
          assert(f.n_units == st.n_samples && f.v_sum == st.sum_amp &&
            f.v_abs == st.sum_abs)
          // signed samples: the two audio sums genuinely differ
          assert(f.v_sum != f.v_abs)
        case _ =>
          val frames = Multimodal.decodeGifFrames(
            Multimodal.syntheticGif(f.media_id), stride = 1)
          assert(f.n_units == frames.length &&
            f.v_sum == frames.map(_.gray_sum).sum)
      }
    }
    // dirty corpus: a corrupt payload and an unknown kind each cost one
    // row, never the task
    val dirty = (media.collect().toSeq :+
      Multimodal.MediaRecord(90L, "image/png", Array[Byte](1, 2, 3)) :+
      Multimodal.MediaRecord(91L, "application/x-unknown",
        Multimodal.syntheticPng(91L))).toDS()
    assert(Multimodal.extractModalFeatures(dirty).collect()
      .map(_.media_id).sorted.toSeq == (0L until 9L))
  }

  test("sampleKeyframes: stride-3 container parse + formula-exact motion deltas") {
    val id = 5L
    val gif = Multimodal.syntheticGif(id)
    val kf = Multimodal.sampleKeyframes(gif)
    assert(kf.map(_.frame_idx) ==
      (0 until Multimodal.VideoFrames by Multimodal.KeyframeStride))
    val (k0, k1, k2, k3) = Multimodal.VideoCoef
    def gray(f: Int, x: Int, y: Int): Long =
      (id * k0 + f * k1 + x * k2 + y * k3) % 256L
    kf.foreach { fr =>
      var (sum, delta) = (0L, 0L)
      for (y <- 0 until Multimodal.VideoSize; x <- 0 until Multimodal.VideoSize) {
        sum += gray(fr.frame_idx, x, y)
        if (fr.frame_idx > 0)
          delta += math.abs(gray(fr.frame_idx, x, y) -
            gray(fr.frame_idx - Multimodal.KeyframeStride, x, y))
      }
      assert(fr.gray_sum == sum, s"frame ${fr.frame_idx} gray sum")
      assert(fr.delta_abs == delta,
        s"frame ${fr.frame_idx} motion delta diverges from the formula")
    }
    // first kept frame has no predecessor → zero motion by definition
    assert(kf.head.delta_abs == 0L)
    // non-GIF payloads drop row-wise like the other decoders
    assert(Multimodal.sampleKeyframes(Multimodal.syntheticPng(1L)).isEmpty)
    assert(Multimodal.sampleKeyframes("not video".getBytes).isEmpty)
  }

  test("decimateBytes: fixed output size, short payloads pass through") {
    // backs the codegen'd binary_sample_bytes expression (ExprSpec)
    val p = (0 until 200).map(_.toByte).toArray
    val r = Multimodal.decimateBytes(p, 32)
    assert(r.length == 32)
    assert(r(0) == p(0) && r(31) == p((31L * 200 / 32).toInt))
    val short = Array[Byte](1, 2, 3)
    assert(Multimodal.decimateBytes(short, 32).toSeq == short.toSeq)
  }

  test("real PNG decode: encode → decode reproduces the formula pixels exactly") {
    // PNG is lossless, so every decoded channel must equal the fixture
    // formula — this is the decoder decoding real pixels, not a hash of
    // opaque bytes
    val id = 42L
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(id)).get
    assert(img.getWidth == Multimodal.FixtureSize &&
      img.getHeight == Multimodal.FixtureSize)
    def expect(x: Int, y: Int, c: Int): Int = {
      val (k0, k1, k2) = Multimodal.PixelCoef(c)
      ((id * k0 + x * k1 + y * k2) % 256L).toInt
    }
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) == expect(x, y, 0), s"R($x,$y)")
      assert(((p >> 8) & 0xff) == expect(x, y, 1), s"G($x,$y)")
      assert((p & 0xff) == expect(x, y, 2), s"B($x,$y)")
    }
  }

  test("resizeImage: nearest-neighbor keeps exactly the stride-aligned sources") {
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(7L)).get
    val small = Multimodal.resizeImage(img, 8, 8)
    assert(small.getWidth == 8 && small.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(small.getRGB(x, y) == img.getRGB(2 * x, 2 * y), s"($x,$y)")
    // non-divisor target (mm_resize's 5×5): integer division lands on
    // {0,3,6,9,12} — NOT an even stride; this is the mapping the
    // divisor-aligned case cannot distinguish from plain decimation
    val five = Multimodal.resizeImage(img, 5, 5)
    val srcs = Seq(0, 3, 6, 9, 12)
    for (y <- 0 until 5; x <- 0 until 5)
      assert(five.getRGB(x, y) == img.getRGB(srcs(x), srcs(y)), s"5×5 ($x,$y)")
  }

  test("real WAV decode: encode → decode reproduces the formula samples exactly") {
    val id = 42L
    val wav = Multimodal.syntheticWav(id)
    // RIFF magic first — this is a real file, not raw PCM
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val st = Multimodal.decodeWav(wav).get
    assert(st.sample_rate == Multimodal.AudioRate && st.channels == 1L &&
      st.n_samples == Multimodal.AudioSamples)
    var (sum, sabs) = (0L, 0L)
    for (k <- 0 until Multimodal.AudioSamples) {
      val s = ((id * Multimodal.AudioCoef._1 + k * Multimodal.AudioCoef._2)
        % 65536L - 32768L).toInt
      sum += s; sabs += math.abs(s)
    }
    assert((st.sum_amp, st.sum_abs) == ((sum, sabs)),
      "decoded PCM sums diverge from the generator formula")
    // non-audio payloads drop row-wise, matching the image path
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.syntheticPng(1L)).isEmpty)
  }

  test("real GIF frame extraction: container frame count + formula-exact gray sums") {
    val id = 42L
    val gif = Multimodal.syntheticGif(id)
    assert(new String(gif.take(3), "US-ASCII") == "GIF")
    // stride 1: all frames, exact pixels
    val all = Multimodal.decodeGifFrames(gif, stride = 1)
    assert(all.map(_.frame_idx) == (0 until Multimodal.VideoFrames),
      "frame count must come from the container")
    all.foreach { fr =>
      assert(fr.width == Multimodal.VideoSize && fr.height == Multimodal.VideoSize)
      var expect = 0L
      for (y <- 0 until Multimodal.VideoSize; x <- 0 until Multimodal.VideoSize) {
        val (k0, k1, k2, k3) = Multimodal.VideoCoef
        expect += (id * k0 + fr.frame_idx * k1 + x * k2 + y * k3) % 256L
      }
      assert(fr.gray_sum == expect,
        s"frame ${fr.frame_idx} gray sum diverges from the generator formula")
    }
    // default stride keeps every 2nd frame with original indices
    assert(Multimodal.decodeGifFrames(gif).map(_.frame_idx) ==
      (0 until Multimodal.VideoFrames by Multimodal.VideoStride))
    // non-GIF payloads drop row-wise: a PNG is image-decodable but is
    // NOT a frame container, and noise is nothing at all
    assert(Multimodal.decodeGifFrames(Multimodal.syntheticPng(1L)).isEmpty)
    assert(Multimodal.decodeGifFrames("not video".getBytes).isEmpty)
  }

  test("corrupt-but-recognized payloads drop row-wise, not as task failures") {
    // A truncated PNG/GIF is RECOGNIZED by its header, so the reader
    // commits to decoding and then throws mid-stream (IIOException /
    // EOFException / unchecked plugin errors) — the case a plain
    // ImageIO.read(...) null-check does not cover. On a dirty corpus
    // that one payload must cost one row, never the task.
    val png = Multimodal.syntheticPng(9L)
    val gif = Multimodal.syntheticGif(9L)
    for (cut <- Seq(png.length / 2, png.length / 4, 24))
      assert(Multimodal.decodeImage(png.take(cut)).isEmpty,
        s"truncated PNG (first $cut bytes) must decode to None")
    // a GIF is a frame CONTAINER: cutting it mid-stream keeps the
    // complete leading frames (valid partial data — the reader counts
    // only frames it can fully parse) and must never throw; cutting
    // inside the header yields nothing
    val full = Multimodal.decodeGifFrames(gif, stride = 1)
    for (cut <- Seq(gif.length / 2, gif.length / 4, 16)) {
      val part = Multimodal.decodeGifFrames(gif.take(cut), stride = 1)
      assert(part.size < full.size,
        s"truncated GIF (first $cut bytes) must lose frames")
      assert(part == full.take(part.size),
        s"truncated GIF (first $cut bytes) must yield a clean frame prefix")
    }
    assert(Multimodal.decodeGifFrames(gif.take(8)).isEmpty,
      "mid-header GIF must yield no frames")
    // WAV cut mid-header (RIFF header is 44 bytes): unrecognizable →
    // None. A cut past the header parses the prefix samples instead —
    // WAV is a stream format, so that is a valid partial read, not an
    // error.
    assert(Multimodal.decodeWav(
      Multimodal.syntheticWav(9L).take(20)).isEmpty,
      "mid-header WAV must decode to None")
  }

  test("decodeImageStats: per-partition decode; undecodable payloads drop row-wise") {
    implicit val s = spark
    import s.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", Multimodal.syntheticPng(1L)),
      Multimodal.MediaRecord(2L, "text", "not an image".getBytes),
      Multimodal.MediaRecord(3L, "image/png", Multimodal.syntheticPng(3L))).toDS()
    val stats = Multimodal.decodeImageStats(media).collect()
      .sortBy(_.media_id)
    assert(stats.map(_.media_id).toSeq == Seq(1L, 3L),
      "the non-image payload must drop, not fail the task")
    val one = stats(0)
    val img = Multimodal.decodeImage(Multimodal.syntheticPng(1L)).get
    assert((one.sum_r, one.sum_g, one.sum_b) == Multimodal.channelSums(img))
    assert((one.rsum_r, one.rsum_g, one.rsum_b) ==
      Multimodal.channelSums(Multimodal.resizeImage(img, 8, 8)))
  }
}
