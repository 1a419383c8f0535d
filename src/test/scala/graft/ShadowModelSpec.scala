package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bm25Index, Dedup, IndexCdc, SimJoin}

/** Model-based law for the shadow-tombstone CDC semantics: a RANDOM
  * change history — deletes, fresh inserts, same-batch upserts,
  * re-inserts of long-dead ids, repeated churn on one id — applied
  * through the `IndexCdc` façade to every document family must net to
  * exactly the state a driver-side `Map[id -> version]` fold predicts:
  * the live id set, the minhash family's served CONTENT (each live
  * doc's stored shingle set is its latest version's, never a stale
  * image), `n_docs`, and BM25's folded df/(N,S) vs the live recompute.
  * Point laws pin the shapes we thought of; this pins the ones we
  * didn't. Seeded — failures replay exactly. */
class ShadowModelSpec extends AnyFunSuite with SparkSpec {

  private val idSpace = 1L to 18L

  private def docText(id: Long, v: Int): String =
    s"document body $id version $v " +
      s"alpha${(id * 7 + v) % 13} beta${(id * 11 + v * 3) % 17} " +
      s"gamma${(id + v) % 5} delta epsilon zeta$v"

  private def docsDf(m: Iterable[(Long, Int)]): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (i, v) => (i, docText(i, v)) }.toDF("doc_id", "text")
  }

  private def idsDf(ids: Iterable[Long]): DataFrame = {
    import spark.implicits._
    ids.toSeq.toDF("doc_id")
  }

  test("random CDC histories: façade-applied state ≡ the model fold " +
    "in every document family") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 2).foreach { trial =>
      // initial corpus: a random half of the id space at version 0
      var model: Map[Long, Int] =
        idSpace.filter(_ => rnd.nextBoolean()).map(_ -> 0).toMap +
          (idSpace.head -> 0) // never an empty-born initial write
      val everSeen = scala.collection.mutable.Map[Long, Int]() ++= model
      val dirs = Seq(
        ("mh", graft.sources.Scratch.dir(s"shadow-model-mh$trial")),
        ("pfx", graft.sources.Scratch.dir(s"shadow-model-pfx$trial")),
        ("bm", graft.sources.Scratch.dir(s"shadow-model-bm$trial")))
      Dedup.writeMinhashIndex(docsDf(model), "doc_id", "text",
        dirs(0)._2, numHashes = 8, bands = 4)
      SimJoin.writePrefixIndex(docsDf(model), "doc_id", "text", 1, 2,
        dirs(1)._2)
      Bm25Index.write(docsDf(model), dirs(2)._2)
      (0L to 5L).foreach { b =>
        // deletes: a random subset of the WHOLE id space — live ids
        // (real takedowns), dead ids and never-seen ids (no-ops by
        // contract) all occur
        val dels = idSpace.filter(_ => rnd.nextInt(4) == 0).toSet
        // inserts: anything not live after the deletes — fresh ids,
        // re-inserts of long-dead ids, and upserts (ids in this very
        // batch's delete set get a NEW version: delete+insert = update)
        val ins = idSpace
          .filter(i => !model.contains(i) || dels.contains(i))
          .filter(_ => rnd.nextInt(3) == 0)
          .map { i =>
            val v = everSeen.getOrElse(i, -1) + 1
            everSeen(i) = v
            i -> v
          }.toMap
        dirs.foreach { case (_, d) =>
          IndexCdc.apply(spark, d, docsDf(ins), idsDf(dels), b)
        }
        model = (model -- dels) ++ ins
      }
      assert(model.nonEmpty, s"vacuous trial $trial — reseed")
      // 1) the live id set nets to the model in every family
      dirs.foreach { case (fam, d) =>
        val live = IndexCdc.liveIds(spark, d)
          .collect().map(_.getLong(0)).toSet
        assert(live == model.keySet,
          s"trial $trial $fam: live=$live model=${model.keySet}")
      }
      // 2) served content is the LATEST version, never a stale image:
      // each live doc's stored shingle set equals its model version's
      val storedHs = Dedup.readMinhashIndex(spark, dirs(0)._2).sets
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
      model.foreach { case (i, v) =>
        val want = Dedup.shingleHashesFlat(docsDf(Seq(i -> v)),
          "doc_id", "text").head().getSeq[Int](1).toSet
        assert(storedHs.get(i).contains(want),
          s"trial $trial: doc $i serves a stale image (model v$v)")
      }
      // 3) n_docs tracked the churn exactly
      assert(Dedup.readMeta(spark,
        Dedup.indexRoot(spark, dirs(0)._2))("n_docs").toLong
        == model.size.toLong,
        s"trial $trial: n_docs drifted from the model live count")
      // 4) BM25's signed df/(N,S) partials fold to the live recompute
      // after arbitrary churn — the stats never skew
      assert(Bm25Index.statsConsistency(spark, dirs(2)._2)
        == ((0L, 0L, 0L)),
        s"trial $trial: BM25 folded stats diverged from live postings")
      // 5) compaction through the façade preserves all of it
      dirs.foreach { case (_, d) => IndexCdc.compact(spark, d) }
      dirs.foreach { case (fam, d) =>
        assert(IndexCdc.liveIds(spark, d)
          .collect().map(_.getLong(0)).toSet == model.keySet,
          s"trial $trial $fam: compaction changed the live set")
      }
      assert(Bm25Index.statsConsistency(spark, dirs(2)._2)
        == ((0L, 0L, 0L)),
        s"trial $trial: compaction skewed the BM25 stats")
    }
  }

  // deterministic, version-dependent vectors: an upsert CHANGES the
  // embedding, so the IVF re-assignment (possibly to a different cell)
  // and the sign-LSH re-keying are both exercised — the stale image
  // must fall under the shadow while the new one serves
  private def vec(id: Long, v: Int): Array[Float] =
    Array.tabulate(6)(d =>
      (((id * 31 + v * 17 + d * 7) % 19) - 9).toFloat)

  private def vecsDf(m: Iterable[(Long, Int)]): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (i, vv) => (i, vec(i, vv).toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
  }

  private def vidsDf(ids: Iterable[Long]): DataFrame = {
    import spark.implicits._
    ids.toSeq.toDF("vec_id")
  }

  test("random CDC histories: façade-applied state ≡ the model fold " +
    "in both vector families, served vectors the LATEST image") {
    val rnd = new scala.util.Random(16081526L)
    var model: Map[Long, Int] =
      (idSpace.filter(_ => rnd.nextBoolean()).map(_ -> 0).toMap) +
        (idSpace.head -> 0)
    val everSeen = scala.collection.mutable.Map[Long, Int]() ++= model
    val ivf = graft.sources.Scratch.dir("shadow-model-ivf")
    val emb = graft.sources.Scratch.dir("shadow-model-emb")
    graft.operators.Similarity.writeIvfIndex(vecsDf(model), ivf,
      nCentroids = 3)
    graft.operators.Similarity.writeEmbeddingIndex(vecsDf(model), emb)
    (0L to 5L).foreach { b =>
      val dels = idSpace.filter(_ => rnd.nextInt(4) == 0).toSet
      val ins = idSpace
        .filter(i => !model.contains(i) || dels.contains(i))
        .filter(_ => rnd.nextInt(3) == 0)
        .map { i =>
          val v = everSeen.getOrElse(i, -1) + 1
          everSeen(i) = v
          i -> v
        }.toMap
      Seq(ivf, emb).foreach(d =>
        IndexCdc.apply(spark, d, vecsDf(ins), vidsDf(dels), b))
      model = (model -- dels) ++ ins
    }
    assert(model.nonEmpty, "vacuous vector trial — reseed")
    Seq("ivf" -> ivf, "emb" -> emb).foreach { case (fam, d) =>
      val live = IndexCdc.liveIds(spark, d)
        .collect().map(_.getLong(0)).toSet
      assert(live == model.keySet,
        s"$fam: live=$live model=${model.keySet}")
    }
    // served vectors are the LATEST image, bit-exact (floats
    // round-trip parquet): a stale pre-upsert assignment surviving in
    // ANY cell would fail this
    val ivfVecs = graft.operators.Similarity.readIvfIndex(spark, ivf)
      .assigned.select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val embVecs = graft.operators.Similarity.readEmbeddingIndex(spark, emb)
      .vectors.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    model.foreach { case (i, v) =>
      assert(ivfVecs(i).sameElements(vec(i, v)),
        s"ivf: vec $i serves a stale image (model v$v)")
      assert(embVecs(i).sameElements(vec(i, v)),
        s"emb: vec $i serves a stale image (model v$v)")
    }
    // occupancy metadata tracked the churn
    assert(Dedup.readMeta(spark,
      Dedup.indexRoot(spark, emb))("n_vectors").toLong == model.size.toLong,
      "n_vectors drifted from the model live count")
    // compaction preserves all of it
    Seq(ivf, emb).foreach(d => IndexCdc.compact(spark, d))
    Seq("ivf" -> ivf, "emb" -> emb).foreach { case (fam, d) =>
      assert(IndexCdc.liveIds(spark, d)
        .collect().map(_.getLong(0)).toSet == model.keySet,
        s"$fam: compaction changed the live set")
    }
  }
}
