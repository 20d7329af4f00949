package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut helpers shared by the iterative operators (CC rounds, kCore
  * peeling, SCC phases, HITS half-steps, BFS frontiers).
  *
  * Every iterative operator here must truncate per-round lineage — the
  * measured failure mode is Catalyst re-analysis of a 2^rounds/3^rounds
  * plan tree dominating wall time (kCore scaladoc) or the driver dying in
  * explainString (HITS scaladoc). The cut itself was historically EAGER
  * (`df.checkpoint()` / `df.localCheckpoint()`), which costs one dedicated
  * materialization job per round ON TOP of the convergence aggregate
  * (count / label-sum / fingerprint / L2 norm) every loop runs immediately
  * after — two scheduled jobs per round where one suffices.
  *
  * [[cutLazy]] marks the plan for checkpointing but defers materialization
  * to the caller's next action, so the convergence aggregate and the
  * checkpoint materialization share ONE job: the aggregate computes through
  * the plan exactly once, and the (local)checkpoint machinery persists the
  * partitions as that same job runs. Semantics are unchanged — the returned
  * frame is the same LogicalRDD-backed truncation eager cuts produce, later
  * references scan the materialized blocks — only the job count drops
  * (guide §1/§2: fewer scheduled passes per round; measured on q_scc at
  * sf0.1: 170 → 139 jobs, wall time neutral at toy scale — the saved jobs
  * are what a cluster scheduler charges per round; see OPTIMIZATION_r13.md).
  *
  * Reliable-checkpoint mode (SPARK_GRAFT_CKPT_DIR set — the cluster shape)
  * keeps the same contract: RDD.checkpoint() always writes its files in a
  * follow-up job after the first materializing action, so the lazy form
  * runs (aggregate+compute, checkpoint-write) where the eager form ran
  * (count+compute, checkpoint-write, aggregate) — one fewer pass there too.
  *
  * The one behavioral caveat: a lazily-cut frame that is NEVER acted on
  * stays unmaterialized (no cost, no blocks) — callers that cut a frame
  * purely for its side effect of materialization must keep the eager form
  * ([[cut]]).
  */
private[graft] object Lineage {
  /** Mark `df` for lineage truncation; the caller's next action on the
    * returned frame materializes it (reliable checkpoint when the session
    * has a checkpoint dir — the cluster shape — else local).
    */
  def cutLazy(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = false)
    else df.localCheckpoint(eager = false)

  /** Eager lineage cut — materializes before returning. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
