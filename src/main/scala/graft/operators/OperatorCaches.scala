package graft.operators

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ListBuffer

/** Lifecycle registry for the sketch/edge DataFrames that dedup and
  * similarity operators persist internally.
  *
  * Those persists are load-bearing (they stop Catalyst's CollapseProject
  * from re-inlining sketch expressions into both sides of self-joins —
  * measured 441 s → 2.8 s), but the operators return LAZY frames, so the
  * operator itself can never know when the caller's action has finished
  * and the cache may be dropped. Instead every internal persist is
  * registered here, and a long-lived session releases them between
  * pipelines with [[releaseAll]]. Unpersisting is always safe for
  * correctness — a released cache only recomputes on the next action.
  */
object OperatorCaches {
  private val handles = ListBuffer.empty[DataFrame]

  /** Persist `df` at MEMORY_AND_DISK and register the handle. */
  private[operators] def persistTracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    handles += p
    p
  }

  /** Register an already-persisted frame for release via [[releaseAll]]. */
  private[operators] def register(df: DataFrame): Unit = synchronized {
    handles += df
  }

  /** Number of live tracked handles (for specs). */
  def liveCount: Int = synchronized { handles.size }

  /** Release every cache any graft operator has pinned in this session. */
  def releaseAll(): Unit = synchronized {
    handles.foreach(df => df.unpersist(blocking = false))
    handles.clear()
  }
}
