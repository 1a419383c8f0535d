package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond dedup (SURVEY §2.9 north star):
  * benchmark decontamination — the standard pre-training hygiene pass
  * that removes training documents overlapping an evaluation set at the
  * n-gram level (the GPT-3/Pile/FineWeb recipe).
  */
object Curation {

  /** Documents in `corpus` sharing at least one hashed n-gram shingle
    * with any document in `benchmark`: (doc_id, n_overlap = distinct
    * shared shingles).
    *
    * Scale shape: the benchmark side is an EVAL SUITE — thousands of
    * documents against a 100 TB corpus — so its distinct shingle-hash
    * set is broadcast and the corpus side is one narrow scan + semi-join
    * + partial-aggregating count; the corpus is never shuffled on
    * anything wider than (doc_id, 8-byte hash). Shingles are the same
    * md5-derived 3-gram hashes as the dedup family
    * ([[Dedup.shingleHashesFlat]]), so one signature pass can feed
    * both. */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame,
                       id: String, text: String): DataFrame = {
    val c = Dedup.shingleHashesFlat(corpus, id, text)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val b = Dedup.shingleHashesFlat(benchmark, id, text)
      .select(explode(col("hs")).as("h")).distinct()
    c.join(broadcast(b), Seq("h"))
      // hs is distinct per document, so each surviving (doc_id, h) is
      // unique — count(1) == count(DISTINCT h) without the extra
      // distinct aggregation pass
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }
}
