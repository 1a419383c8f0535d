package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scale-adaptive input fan-out for row-EXPANDING operators.
  *
  * Spark sizes scan tasks by INPUT bytes (`maxPartitionBytes` packing),
  * which is the right currency for scans but the wrong one in front of
  * an operator that multiplies work per input byte — Gram folds emit
  * d(d+1)/2 products per vector, signature passes hash every shingle
  * under every permutation, tokenizers explode documents hundreds of
  * ways. When the corpus is large the split packer already yields ≥
  * one task per core and nothing here applies; when the input is SMALL
  * relative to the cluster (fewer estimated splits than cores — e.g. a
  * single small file, or one parquet row group) the whole
  * expansion×aggregation runs on a handful of cores while the rest of
  * the machine idles.
  *
  * [[fanOutExpansion]] therefore derives the decision from the input
  * size (the scale-adaptive rule, never a constant): it estimates the
  * scan parallelism Spark will give `df` using Spark's own packing
  * arithmetic, and only when that estimate is below the cluster's core
  * count inserts one round-robin repartition to core count — a shuffle
  * of the SMALL pre-expansion rows (by construction under
  * cores × maxPartitionBytes, and orders of magnitude lighter than the
  * expanded work it unlocks). At corpus scale the condition is false
  * and the plan is untouched — no exchange, no cost, bit-identical
  * plans; results are identical either way (the downstream aggregates
  * are fold-order-free by the operators' own exactness contracts).
  */
object Rebalance {

  /** Estimated source task-parallelism of `df`: the sum over its file
    * scans of Spark's split-packing estimate (maxSplitBytes =
    * min(maxPartitionBytes, max(openCostInBytes, bytes/defaultParallelism)),
    * file listings read from the relation's own in-memory FileIndex —
    * no filesystem RPCs), plus checkpointed RDDs' actual partition
    * counts and 1 per local relation. None when any source is opaque
    * (cached relation, streaming source, JDBC, …) — the caller then
    * leaves the plan alone. */
  private[graft] def sourceParallelism(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val maxSplit = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    val legs: Seq[Option[Long]] = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation =>
          val cost = f.location.listFiles(Nil, Nil).flatMap(_.files)
            .map(_.getLen + openCost).sum
          val split = math.min(maxSplit,
            math.max(openCost, cost / par))
          Some(math.max(1L, (cost + split - 1) / math.max(1L, split)))
        case _ => None
      }
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        Some(r.rdd.getNumPartitions.toLong)
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(1L)
    }
    if (legs.isEmpty || legs.exists(_.isEmpty)) None else Some(legs.flatten.sum)
  }

  /** True when `df`'s sources are estimated to scan in fewer splits
    * than the cluster has cores — the small-input case where a
    * row-expanding operator downstream would run underparallelized.
    * False (leave the plan alone) whenever any source is opaque. */
  private[graft] def underparallelized(df: DataFrame): Boolean = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    sourceParallelism(df).exists(_ < par)
  }

  /** `df`, round-robin repartitioned to the cluster's core count IFF
    * its estimated source parallelism is below it (see the object doc);
    * unchanged otherwise. Call on the SMALL pre-expansion frame —
    * ideally the pruned projection feeding the expansion, so the
    * conditional shuffle moves as few bytes as possible. */
  def fanOutExpansion(df: DataFrame): DataFrame =
    if (underparallelized(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else df
}
