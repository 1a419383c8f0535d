package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) via the sorted-neighborhood
  * method (Hernández & Stolfo 1995): sort all records by a blocking
  * key, slide a window of `w` positions over the sorted order, and
  * verify only the pairs that fall inside a window — O(n·w) candidate
  * pairs instead of the O(n²) all-pairs compare, with recall for any
  * pair whose keys sort within w positions of each other.
  */
object EntityRes {

  /** Candidate + verified fuzzy-match pairs: (id_a, id_b, dist) for
    * every pair within `window` positions of the global (key, id) sort
    * order whose Levenshtein distance is ≤ `maxDist`, with `id_a`
    * preceding `id_b` in that order.
    *
    * The global rank is computed WITHOUT a single-task global sort:
    * `repartitionByRange` on the key samples range boundaries (the
    * standard Spark range-exchange — same machinery as a distributed
    * ORDER BY), each partition sorts locally, and per-partition row
    * counts (one tuple per partition, collected to the driver) turn the
    * within-partition `row_number` into an exact global rank. The rank
    * is invariant to where the sampled boundaries fall — boundaries
    * move work, never ranks. The neighborhood self-join is an equality
    * join on `rank div window` (each window pair shares a bucket or
    * sits in adjacent buckets), so candidate volume is exactly ≤
    * n·(window−1) under ANY input.
    *
    * Hot-key caveat: range partitioning puts all copies of ONE
    * identical key in one partition. Identical keys are exact
    * duplicates — collapse them with [[Dedup.exactDuplicates]] first;
    * this operator is for the pairs exact hashing cannot see. Recall
    * caveat (inherent to sorted-neighborhood): a true match whose keys
    * sort ≥ window positions apart (e.g. a typo in the FIRST character)
    * is missed — run a second pass on a rotated/reversed key if that
    * matters, the classic multi-pass variant. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                              window: Int = 16,
                              maxDist: Int = 2): DataFrame = {
    require(window >= 2, s"sortedNeighborhoodPairs: window must be >= 2, got $window")
    require(maxDist >= 0, s"sortedNeighborhoodPairs: maxDist must be >= 0, got $maxDist")
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val t = df.select(col(idCol).cast("long").as("id"),
      col(keyCol).cast("string").as("key"))
    val nNull = t.agg(count(when(col("key").isNull || col("id").isNull,
      lit(1)))).head().getLong(0)
    require(nNull == 0L,
      s"sortedNeighborhoodPairs: $nNull rows have a null id/key — " +
        "the sort order needs both")
    // materialized: the self-join must see ONE consistent rank
    // assignment (range boundaries are sampled; recomputation could
    // legally re-sample)
    val sorted = Dedup.materialize(
      t.repartitionByRange(nPart, col("key"), col("id"))
        .sortWithinPartitions("key", "id")
        .withColumn("pid", spark_partition_id()))
    val sizes = sorted.groupBy("pid").agg(count(lit(1)).as("c"))
      .orderBy("pid").collect().map(r => (r.getInt(0), r.getLong(1)))
    // exclusive prefix sum over ≤ nPart tuples — driver-side, bounded
    // by the partition count, never by rows
    val offsets = sizes.scanLeft((0, 0L)) {
      case ((_, acc), (p, c)) => (p, acc + c)
    }.init.zip(sizes).map { case ((_, before), (p, _)) => (p, before) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("pid", "poff")
    val w = Window.partitionBy("pid").orderBy("key", "id")
    val ranked = Dedup.materialize(
      sorted.join(broadcast(offDf), Seq("pid"))
        .withColumn("rk",
          row_number().over(w).cast("long") - 1L + col("poff"))
        .withColumn("bkt", expr(s"rk div ${window}L"))
        .select("id", "key", "rk", "bkt"))
    val a = ranked.select(col("id").as("id_a"), col("key").as("key_a"),
      col("rk").as("rk_a"), col("bkt"))
    val b = ranked.select(col("id").as("id_b"), col("key").as("key_b"),
      col("rk").as("rk_b"), col("bkt"))
    a.join(b, Seq("bkt"))
      .union(a.withColumn("bkt", col("bkt") + 1L).join(b, Seq("bkt")))
      .filter((col("rk_b") - col("rk_a")).between(1, window - 1))
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** The classic multi-pass sorted-neighborhood: one pass over the key
    * and one over its REVERSE, pairs unioned and de-duplicated (the
    * reversed pass re-ranks, so a pair can surface with flipped sides —
    * pairs are canonicalized on (min id, max id) before the distinct).
    * A typo in the FIRST character sorts ~alphabet-width ranks away in
    * the forward pass but adjacent in the reversed one (and vice versa
    * for last-character typos), so any single-character edit at EITHER
    * end is guaranteed a window in one of the passes; mid-string edits
    * keep both prefixes and suffixes, landing in both. Cost is exactly
    * 2× the single pass — still O(n·window) candidates. */
  def sortedNeighborhoodMultiPass(df: DataFrame, idCol: String,
                                  keyCol: String, window: Int = 16,
                                  maxDist: Int = 2): DataFrame = {
    val fwd = sortedNeighborhoodPairs(df, idCol, keyCol, window, maxDist)
    val rev = sortedNeighborhoodPairs(
      df.withColumn("__rk", reverse(col(keyCol))), idCol, "__rk",
      window, maxDist)
    fwd.union(rev)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
      .distinct()
  }
}
