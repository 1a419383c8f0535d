package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE vocabulary induction laws: the distributed trainer equals a
  * plain-Scala reference on a known corpus, merges never lose
  * characters (segmentations always reconstruct their word), and the
  * pair space the shuffle carries stays alphabet-bounded. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // reference implementation: same algorithm, no Spark — driver-local
  // maps and folds (the DuckDB oracle provides the cross-engine check)
  private def refTrain(texts: Seq[String],
                       n: Int): Seq[(Int, String, String, Long)] = {
    val wf = texts.flatMap(t => "[a-z]+".r.findAllIn(t.toLowerCase).toSeq)
      .groupBy(w => w).map { case (w, ws) => w -> ws.size.toLong }
    var seg: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.split("").toVector).toMap
    (1 to n).flatMap { k =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      seg.foreach { case (w, s) =>
        s.zip(s.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + wf(w))
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        seg = seg.map { case (w, s) =>
          w -> s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
            else acc :+ x
          }
        }
        Some((k, l, r, cnt))
      }
    }
  }

  private val corpus = Seq(
    "the cat sat on the mat with the other cat",
    "that thin cat thought the thick mat was the best mat",
    "another cat sat there on that mat")

  test("distributed trainer equals the plain-Scala reference") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", 6)
      .map(m => (m.rk, m.l, m.r, m.cnt))
    assert(got == refTrain(corpus, 6))
  }

  test("greedy fold on repeated symbols merges left-to-right ([aaa] -> [aa, a])") {
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val seg = Bpe.segment(Bpe.wordFreqs(docs, "text"), Seq(("a", "a")))
      .select("word", "seg").as[(String, Seq[String])].collect().toMap
    assert(seg("aaa") == Seq("aa", "a"))
    assert(seg("aaaa") == Seq("aa", "aa"))
  }

  test("segmentation always reconstructs the word (no character loss)") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, "text", 4).map(m => (m.l, m.r))
    val bad = Bpe.segment(Bpe.wordFreqs(docs, "text"), merges)
      .filter(concat_ws("", col("seg")) =!= col("word")).count()
    assert(bad == 0L)
  }

  test("round-0 pair space is alphabet-bounded (the shuffle stays tiny)") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = Bpe.pairCounts(Bpe.initialSeg(Bpe.wordFreqs(docs, "text"))).count()
    assert(n <= 26L * 26L, s"round-0 pairs $n exceed the [a-z] bigram space")
  }

  test("merge counts are monotone non-increasing across rounds") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val cnts = Bpe.train(docs, "text", 5).map(_.cnt)
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"pair frequency rose across merges: $cnts")
  }

  test("persisted vocabulary: rank-ordered round trip, stored encode " +
    "≡ fresh encode, retrain swaps atomically, foreign dirs refuse") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = sources.Scratch.dir("bpe-vocab")
    val trained = Bpe.train(docs, "text", 5)
    Bpe.writeVocab(spark, trained, dir)
    // the merge SEQUENCE survives byte-for-byte, in rank order — file
    // or row order must never matter
    assert(Bpe.readVocab(spark, dir) == trained.map(m => (m.l, m.r)),
      "stored merge table lost content or order")
    // encoding from the stored vocabulary is bit-identical to encoding
    // from the in-memory one
    def enc(ms: Seq[(String, String)]): Set[(String, String)] =
      Bpe.segment(Bpe.wordFreqs(docs, "text"), ms)
        .select(col("word"), concat_ws(" ", col("seg")))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(enc(Bpe.readVocab(spark, dir))
      == enc(trained.map(m => (m.l, m.r))))
    // retrain over the same directory: atomic pointer swap, new table
    val retrained = Bpe.train(docs, "text", 3)
    Bpe.writeVocab(spark, retrained, dir)
    assert(Bpe.readVocab(spark, dir) == retrained.map(m => (m.l, m.r)),
      "retrain did not replace the vocabulary")
    // a non-vocabulary index refuses by kind; a tampered scheme
    // refuses naming the retrain remedy
    val mh = sources.Scratch.dir("bpe-vocab-notavocab")
    operators.Dedup.writeMinhashIndex(docs.limit(30), "doc_id", "text", mh)
    val exKind = intercept[IllegalArgumentException] {
      Bpe.readVocab(spark, mh)
    }
    assert(exKind.getMessage.contains("not a BPE vocabulary"))
    val root = operators.Dedup.indexRoot(spark, dir)
    operators.Dedup.writeMeta(spark, root,
      operators.Dedup.readMeta(spark, root) + ("scheme" -> "upper:[A-Z]+"))
    val exScheme = intercept[IllegalArgumentException] {
      Bpe.readVocab(spark, dir)
    }
    assert(exScheme.getMessage.contains("scheme") &&
      exScheme.getMessage.contains("retrain"),
      s"scheme refusal unhelpful: ${exScheme.getMessage}")
  }
}
