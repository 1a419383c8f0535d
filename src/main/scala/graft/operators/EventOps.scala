package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an append-only event log
  * (user_id, ts, event_type, ...): ordered conversion funnels and
  * cohort retention. The reference has no event analytics (its only
  * time axis is a daily schedule — SURVEY §2.8); these are the standard
  * product-analytics shapes a 100 TB event warehouse runs daily, built
  * the Spark-native way: per-user conditional aggregation, never a
  * per-user sort or a window over the whole log.
  */
object EventOps {

  /** Strict ordered funnel: stage i counts users whose FIRST qualifying
    * stage-i event occurs at-or-after their stage-(i-1) entry time
    * (entry = the earliest such chain, computed greedily with
    * first-event times — the standard "unbounded window" funnel).
    *
    * Shape: one `groupBy(user)` aggregation per stage, each joined to
    * the previous stage's (user, t) frame on `user_id`. Every shuffle
    * in the chain hashes the SAME key, so a co-partitioned cluster run
    * reuses one exchange layout end-to-end; the per-stage frames are
    * one row per surviving user — monotonically shrinking — and each is
    * materialized so stage k doesn't recompute stages 1..k-1 (the naive
    * composed plan is O(k²) passes over the log; this is exactly k).
    * No window functions: a per-user ORDER BY over a 100 TB log is a
    * sort the conditional-min aggregation avoids.
    *
    * Returns one row per stage: (stage, users) with stage name
    * `<i>_<event_type>` (1-based), users = survivors at that depth. */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel: duplicate stage types in $stages — a repeated stage " +
        "needs an explicit occurrence index, not a silent re-match")
    def stageEvents(st: String): DataFrame =
      events.filter(col(typeCol) === st)
        .select(col(userCol).as("u"), col(tsCol).as("st_ts"))
    val first = Dedup.materialize(
      stageEvents(stages.head)
        .groupBy(col("u").as("user_id")).agg(min(col("st_ts")).as("t")))
    val frames = stages.tail.scanLeft(first) { (prev, st) =>
      Dedup.materialize(
        stageEvents(st)
          .join(prev, col("u") === col("user_id"))
          .filter(col("st_ts") >= col("t"))
          .groupBy(col("u").as("user_id")).agg(min(col("st_ts")).as("t")))
    }
    frames.zip(stages).zipWithIndex.map { case ((f, st), i) =>
      f.agg(count(lit(1)).as("users"))
        .select(lit(s"${i + 1}_$st").as("stage"), col("users"))
    }.reduce(_.unionByName(_))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of a
    * user's first event of any type; a user is retained in offset w if
    * they have ANY event in the week w weeks after their cohort week.
    * Classic triangle output: (cohort_week, week_offset, active_users).
    *
    * Two shuffles, both on `user_id` (first-event agg, then the
    * events ⋈ first-event join whose distinct collapses to
    * (user, cohort, offset)), then one small agg on the
    * (cohort, offset) pairs — weeks × weeks rows, bounded by the
    * calendar, not the log. The join carries only (user_id, week) — the
    * log's payload columns are pruned at the scan. */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val firsts = events
      .groupBy(col(userCol).as("user_id"))
      .agg(date_trunc("week", min(col(tsCol))).as("cw"))
    events
      .select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).as("aw"))
      .join(firsts, "user_id")
      .select(col("user_id"), col("cw"),
        // both sides are week-truncated, so the day gap is an exact
        // multiple of 7 and the division is exact in double
        (datediff(col("aw"), col("cw")) / 7).cast("int").as("week_offset"))
      .distinct()
      .groupBy(col("cw").cast("date").as("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}
