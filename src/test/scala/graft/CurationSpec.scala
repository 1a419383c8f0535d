package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing a 3-gram") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated text with no overlap at all here"),
      (3L, "a b"), // too short for any 3-gram: never flagged
      (4L, "quick brown fox somewhere else entirely")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "watch the quick brown fox run")
    ).toDF("doc_id", "text")
    val out = Curation.contaminatedDocs(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // docs 1 and 4 share the shingle "quick brown fox" with the bench
    assert(out.keySet == Set(1L, 4L))
    assert(out(1L) >= 1 && out(4L) >= 1)
  }

  test("decontamination overlap count is the distinct shared-shingle count") {
    val corpus = Seq((1L, "x y z w")).toDF("doc_id", "text") // shingles: xyz, yzw
    val bench = Seq((9L, "x y z w")).toDF("doc_id", "text")  // identical
    val out = Curation.contaminatedDocs(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L)
  }

  test("leakageSafeSplit keeps every near-dup cluster inside one split") {
    // 200 singleton docs + one planted 40-member cluster whose members'
    // PER-DOC md5 draws straddle train/val/test (that's what makes the
    // per-doc scheme a leak) — the cluster-rep draw must not
    val docs = (1L to 240L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val clusterIds = (101L to 140L)
    val clusters = clusterIds.map(i => (i, 101L)).toDF("doc_id", "cluster")
    val got = Curation.leakageSafeSplit(docs, "doc_id", clusters)
      .as[(Long, Long, String)].collect()
    assert(got.length == 240)
    val byDoc = got.map { case (d, r, s) => d -> (r, s) }.toMap
    // the planted cluster: one rep, one split, for all 40 members
    val memberSplits = clusterIds.map(byDoc(_)).toSet
    assert(memberSplits.size == 1 && memberSplits.head._1 == 101L,
      s"cluster members scattered: $memberSplits")
    // the hazard is real on this fixture: per-doc draws DO straddle
    def perDocSplit(i: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$i".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map(b => f"$b%02x").mkString, 16) % 10
      if (h < 8) "train" else if (h < 9) "val" else "test"
    }
    assert(clusterIds.map(perDocSplit).toSet.size > 1,
      "fixture too weak: per-doc draws all landed in one split anyway")
    // singletons keep the plain q_split_assign draw (rep = self)
    (1L to 100L).foreach { i =>
      assert(byDoc(i) == ((i, perDocSplit(i))))
    }
  }

  test("keepBest: per-cluster quality argmax, min-id ties, singleton " +
      "pass-through, dropped members don't compete") {
    val scored = Seq(
      // cluster 1: doc 3 has the best score — the min-id canonical (1)
      // must LOSE to it
      (1L, 0.2), (2L, 0.5), (3L, 0.9),
      // cluster 10: tie on score — the smaller id (10) survives
      (10L, 0.7), (11L, 0.7),
      // singletons: survive untouched
      (20L, 0.1), (21L, 0.0)
      // doc 31 (cluster 30) is absent from `scored` — see clusters
    ).toDF("doc_id", "score")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L),
      // cluster 30: member 31 was dropped by the scorer (e.g. empty
      // tokens), member 30 still competes — and wins by default
      (30L, 30L), (31L, 30L)
    ).toDF("doc_id", "cluster")
    val withThirty = scored.unionByName(Seq((30L, 0.3)).toDF("doc_id", "score"))
    val out = Curation.keepBest(withThirty, clusters)
      .as[(Long, Double)].collect().toMap
    assert(out == Map(3L -> 0.9, 10L -> 0.7, 20L -> 0.1, 21L -> 0.0,
      30L -> 0.3), s"unexpected survivors: $out")
  }
}
