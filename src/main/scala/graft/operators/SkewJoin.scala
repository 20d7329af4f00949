package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation helpers for hot keys that AQE's runtime
  * skew split cannot always save (e.g. one key holding 30% of a 100 TB
  * table). Both are pure plan rewrites built from deterministic salting —
  * no sampling, no driver round trips.
  */
object SkewJoin {

  /** First `__graft_salt*` name unused by either frame — a fixed temp name
    * would silently clobber a caller column (same guard as
    * RangeJoin.intervalJoin).
    */
  private def saltName(frames: DataFrame*): String =
    Iterator.from(0).map(i => if (i == 0) "__graft_salt" else s"__graft_salt$i")
      .find(n => frames.forall(f => !f.columns.contains(n))).get

  /** Two-path salted equi-join, semantics identical to
    * `left.join(right, key)` (inner).
    *
    * Salting every key replicates the ENTIRE right side `salts`-fold — at
    * 100 TB with a mid-size dimension that replication, not the skew, is
    * the bottleneck. Instead: one map-side-combined aggregate over the
    * left keys finds the keys actually above `hotThreshold` rows (the ones
    * that would overflow a single reducer); only those are salted — the
    * hot left slice spreads over `salts` sub-keys by hashing a
    * discriminator column, and only the MATCHING right rows (a broadcast
    * semi-join against the hot-key list, which is small by construction:
    * at most |left| / hotThreshold keys) are replicated. Everything else
    * takes the plain join, where AQE remains free to pick broadcast /
    * skew-split as usual. Callers that already know their hot keys (e.g.
    * from table stats) can skip the pre-pass via the `hotKeys` overload.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: Column,
      salts: Int = 8,
      hotThreshold: Long = 1000000L): DataFrame = {
    val n = saltName(left, right)
    val hotKeys = left.groupBy(col(key)).agg(count(lit(1)).as(n + "_cnt"))
      .filter(col(n + "_cnt") > hotThreshold)
      .select(col(key))
    saltedEquiJoin(left, right, key, discriminator, hotKeys, salts)
  }

  /** Two-path salted join against a caller-supplied hot-key list (must be
    * broadcast-small; it is by construction ≤ |left| / threshold keys).
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: Column,
      hotKeys: DataFrame,
      salts: Int): DataFrame = {
    val s = saltName(left, right)
    val leftHot = left.join(broadcast(hotKeys), Seq(key), "left_semi")
    val leftCold = left.join(broadcast(hotKeys), Seq(key), "left_anti")
    val rightHot = right.join(broadcast(hotKeys), Seq(key), "left_semi")
    val rightCold = right.join(broadcast(hotKeys), Seq(key), "left_anti")
    val saltedLeft = leftHot
      .withColumn(s, pmod(xxhash64(discriminator), lit(salts)))
    val saltedRight = rightHot.withColumn(s,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLeft.join(saltedRight, Seq(key, s)).drop(s)
      .unionByName(leftCold.join(rightCold, Seq(key)))
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on key. Expressed here
    * for the common algebraic aggregates; Spark's hash aggregate already
    * does map-side partial combine, so this pays off only when single
    * reduce keys overflow one task — i.e. extreme skew.
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      salts: Int = 8): DataFrame = {
    val s = saltName(df)
    // salt from a row-unique id, NOT the value column: a hot key whose
    // values are constant (all-zero amounts) would otherwise land its
    // entire row count in one salt and the rewrite would remove no skew.
    // Sum/count are salt-assignment-invariant, so non-determinism across
    // retries is harmless here (unlike a join key).
    df.withColumn(s, pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col(s))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum"), sum("__pcnt").cast("long").as("count"))
  }
}
