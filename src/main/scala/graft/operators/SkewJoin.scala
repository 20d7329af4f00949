package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join/aggregation helpers for hot keys that AQE's runtime
  * skew split cannot always save (e.g. one key holding 30% of a 100 TB
  * table). Both are pure plan rewrites built from deterministic salting —
  * no sampling, no driver round trips.
  */
object SkewJoin {

  /** Salted equi-join: the skewed (large) left side spreads each hot key
    * over `salts` sub-keys by hashing a discriminator column; the small
    * right side is replicated `salts` times via a literal explode. The
    * shuffle then distributes each hot key across `salts` reducers.
    * Semantics identical to `left.join(right, key)` (inner).
    *
    * Use when the right side is too big to broadcast but small enough to
    * replicate `salts`-fold — the classic mid-size dimension with a
    * power-law fact key.
    */
  /** First `__graft_salt*` name unused by either frame — a fixed temp name
    * would silently clobber a caller column (same guard as
    * RangeJoin.intervalJoin).
    */
  private def saltName(frames: DataFrame*): String =
    Iterator.from(0).map(i => if (i == 0) "__graft_salt" else s"__graft_salt$i")
      .find(n => frames.forall(f => !f.columns.contains(n))).get

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: Column,
      salts: Int = 8): DataFrame = {
    val s = saltName(left, right)
    val saltedLeft = left.withColumn(s, pmod(xxhash64(discriminator), lit(salts)))
    val saltedRight = right.withColumn(s,
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLeft.join(saltedRight, Seq(key, s)).drop(s)
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
