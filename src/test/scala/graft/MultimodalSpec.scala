package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("binary payload pipeline: schema, hashing, deterministic features") {
    implicit val s = spark
    val media = Multimodal.asMedia(Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 500)
    val r = rows.find(_.media_id == 0L).get
    assert(r.n_bytes > 0 && r.sha256.length == 64 && r.features.length == 8)
    // determinism: same payload → same features across runs
    val again = Multimodal.extractFeatures(media).collect()
      .find(_.media_id == 0L).get
    assert(again.features.toSeq == r.features.toSeq && again.sha256 == r.sha256)
    // exact slot sums: 8 slots, reconciling with a direct computation
    assert(r.slot_sums.length == 8)
    val direct = Multimodal.byteSlotSums(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .filter("doc_id = 0").head().getAs[String]("text").getBytes("UTF-8"))
    assert(r.slot_sums.toSeq == direct.toSeq)
  }

  test("resizeStub: fixed output size, short payloads pass through") {
    val p = (0 until 200).map(_.toByte).toArray
    val r = Multimodal.resizeStub(p, 32)
    assert(r.length == 32)
    assert(r(0) == p(0) && r(31) == p((31L * 200 / 32).toInt))
    val short = Array[Byte](1, 2, 3)
    assert(Multimodal.resizeStub(short, 32).toSeq == short.toSeq)
  }

  test("sampleFrames: stride, original indices, short tail frame") {
    implicit val s = spark
    import s.implicits._
    // 300-byte payload, 64-byte frames → frames 0..4; stride 4 → idx 0, 4
    val payload = Array.fill[Byte](300)(7)
    val media = Seq(Multimodal.MediaRecord(1L, "video", payload)).toDS()
    val frames = Multimodal.sampleFrames(media).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 4))
    assert(frames(0).frame.length == 64)
    assert(frames(1).frame.length == 300 - 4 * 64) // short tail: 44 bytes
  }
}
