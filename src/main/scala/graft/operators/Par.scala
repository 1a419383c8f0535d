package graft.operators

/** Concurrent execution of INDEPENDENT per-shard / per-family chains
  * on a small dedicated pool — guide §2.6 ("overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once and
  * FIFO back-fills one chain's straggler tail with the next chain's
  * tasks, so N independent index operations that each leave most
  * cores idle (small per-op data, sequential small jobs) finish in
  * roughly the longest chain's time instead of the sum.
  *
  * This is the LOCAL form of the layout's own deployment story — the
  * per-shard maintenance docs (e.g. [[ShardedIndex.rebuild]]) already
  * say "fan the shard list across a fleet for the S-way speedup";
  * driver threads are that fan-out inside one application. Safe
  * exactly when the tasks share no mutable state: every caller here
  * hands each task its own index DIRECTORY (per-dir leases, disjoint
  * files), and the session object itself is thread-safe for
  * concurrent job submission.
  *
  * Results come back in task order; any task's exception propagates
  * to the caller (a parallel run can never pass where the sequential
  * one would have failed). */
object Par {
  def run[T](tasks: Seq[() => T]): Seq[T] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.sizeIs == 1) return Seq(tasks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
      tasks.map(t => scala.concurrent.Future(t())(ec))
        .map(f => scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }
}
