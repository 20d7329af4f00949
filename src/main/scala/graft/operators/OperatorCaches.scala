package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ListBuffer
import scala.jdk.CollectionConverters._

/** Lifecycle registry for the sketch/edge DataFrames that dedup and
  * similarity operators persist internally.
  *
  * Those persists are load-bearing (they stop Catalyst's CollapseProject
  * from re-inlining sketch expressions into both sides of self-joins —
  * measured 441 s → 2.8 s), but the operators return LAZY frames, so the
  * operator itself can never know when the caller's action has finished
  * and the cache may be dropped. Instead every internal persist is
  * registered here, and a long-lived session releases them between
  * pipelines. Unpersisting is always safe for correctness — a released
  * cache only recomputes on the next action.
  *
  * Handles are scoped PER SparkSession: a multi-tenant JVM releasing one
  * pipeline's caches with [[release]] cannot unpersist another session's
  * in-flight sketches (which would silently reintroduce the CollapseProject
  * re-evaluation pathology mid-query). [[releaseAll]] spans every session
  * and is for single-tenant use between pipelines. The map is weak-keyed,
  * and because a registered DataFrame itself references its session (so
  * the weak key alone never fires for non-empty entries), every mutation
  * also prunes entries whose SparkContext has stopped — a session
  * abandoned without release() is reclaimed on the next register/release
  * anywhere in the JVM.
  */
object OperatorCaches {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, ListBuffer[DataFrame]]

  private def buf(s: SparkSession): ListBuffer[DataFrame] =
    bySession.computeIfAbsent(s, _ => ListBuffer.empty)

  /** Drop entries whose SparkContext has stopped: their cached blocks died
    * with the executors, and the buffered DataFrames otherwise strongly
    * reference the dead session through `df.sparkSession` — exactly the
    * abandoned-session leak the weak keying alone cannot cover. Called on
    * every mutation, so a stopped session's entry lives at most until the
    * next operator registers or releases anywhere in the JVM.
    */
  private def pruneStopped(): Unit = {
    val dead = bySession.keySet.asScala
      .filter(s => s.sparkContext.isStopped).toList
    dead.foreach(bySession.remove)
  }

  /** Persist `df` at MEMORY_AND_DISK and register the handle.
    *
    * REGISTRATION is unconditional — every caller's handle must be
    * releasable — but the persist() call itself is skipped when the
    * CacheManager already holds an equivalent plan (df.storageLevel
    * consults it by plan equality): unpersist() uncaches BY PLAN, not by
    * handle, so releasing either handle drops the one shared cache entry
    * regardless of which call persisted it, and the repeat persist bought
    * nothing but a CacheManager "already cached" warning per overlapping
    * sketch in a long bench run. Actions hit the existing cache either way.
    *
    * Inherited-level caveat (round-6 advice): when the skip fires, the
    * operator runs at whatever storage level the EXISTING cache was
    * created with — a caller who pre-cached the same plan MEMORY_ONLY
    * keeps MEMORY_ONLY eviction semantics under pressure, not this
    * module's MEMORY_AND_DISK. Upgrading in place is not possible
    * (persist() on an already-cached frame is exactly the warning this
    * skip removes, and Spark has no re-level API short of unpersist —
    * which would drop a cache the caller owns mid-use). Every in-library
    * caller reaches caches only through this module, so the level is
    * uniform in practice; the caveat exists for external callers.
    */
  private[graft] def persistTracked(df: DataFrame): DataFrame = synchronized {
    pruneStopped()
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    buf(df.sparkSession) += df
    df
  }

  /** Register an already-persisted frame for release. */
  private[operators] def register(df: DataFrame): Unit = synchronized {
    pruneStopped()
    buf(df.sparkSession) += df
  }

  /** Number of live tracked handles across all sessions (for specs). */
  def liveCount: Int = synchronized {
    pruneStopped()
    bySession.values.asScala.map(_.size).sum
  }

  /** Release every cache graft operators have pinned in `session`, leaving
    * other sessions' caches untouched.
    */
  def release(session: SparkSession): Unit = synchronized {
    pruneStopped()
    Option(bySession.remove(session))
      .foreach(_.foreach(unpersistQuietly))
  }

  /** Release every cache any graft operator has pinned in this JVM. Only
    * safe between pipelines in single-tenant JVMs — in shared JVMs use
    * [[release]] with your own session.
    */
  def releaseAll(): Unit = synchronized {
    bySession.values.asScala.foreach(_.foreach(unpersistQuietly))
    bySession.clear()
  }

  /** unpersist() is not merely a bookkeeping call: uncaching re-plans the
    * cached query (and any dependent caches) to find what to drop, so a
    * handle whose plan cannot be re-planned — e.g. a frame that was
    * CONSTRUCTED with ill-typed expressions and never run — throws here.
    * A release sweep must still drop every cache it CAN: swallow per-
    * handle failures and keep going (the broken handle never materialized
    * a cache, so there is nothing to leak).
    */
  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist(blocking = false)
    catch { case scala.util.control.NonFatal(_) => () }
}
