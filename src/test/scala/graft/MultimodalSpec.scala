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
  }
}
