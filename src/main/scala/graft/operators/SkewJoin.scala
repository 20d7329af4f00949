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
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      discriminator: Column,
      salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(discriminator), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
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
      salts: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as("sum"), sum("__pcnt").cast("long").as("count"))
}
