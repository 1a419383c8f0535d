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
}
