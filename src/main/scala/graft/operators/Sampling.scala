package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling for training-data
  * pipelines. Everything is content/id-hash based — re-running on the same
  * data (or on new shards of it) yields the same assignment, which is what
  * makes train/test splits reproducible across pipeline runs and engines
  * (no RNG state, no row order dependence).
  */
object Sampling {

  /** 16-way deterministic bucket from the md5 of a key column (the first
    * hex digit). md5 is engine-portable (identical in Spark, DuckDB,
    * Python), unlike xxhash64/rand-based assignment.
    */
  def hashBucket16(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1)

  /** Deterministic train/validation/test split: buckets 0..b-1 of 16 by
    * md5. Default 12/2/2 → 75/12.5/12.5. Returns the frame with a `split`
    * column; filter on it downstream (the filter pushes down to the scan
    * when the key is a stored column).
    */
  def deterministicSplit(
      df: DataFrame,
      keyCol: String,
      trainBuckets: Int = 12,
      validBuckets: Int = 2): DataFrame = {
    require(trainBuckets + validBuckets < 16, "need at least one test bucket")
    val hexDigits = "0123456789abcdef"
    val train = hexDigits.take(trainBuckets).map(_.toString)
    val valid = hexDigits.slice(trainBuckets, trainBuckets + validBuckets).map(_.toString)
    df.withColumn("split",
      when(hashBucket16(col(keyCol)).isin(train: _*), "train")
        .when(hashBucket16(col(keyCol)).isin(valid: _*), "valid")
        .otherwise("test"))
  }

  /** Deterministic global corpus shuffle: order by md5(seed, key). The
    * every-epoch operation of a training pipeline — a full-corpus
    * permutation that is reproducible (same seed ⇒ same order, across
    * engines and re-runs) and re-randomizable (new seed ⇒ fresh
    * permutation). Plans as a range-partitioned sort on a 32-char key:
    * one shuffle, no driver-side state, no RNG to snapshot. Returns the
    * frame with its `shuffle_key` so downstream writes can bucket or
    * range-split on it.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws(":", lit(seed), col(keyCol).cast("string"))))
      .orderBy("shuffle_key")

  /** Deterministic per-stratum downsampling: keep each row iff its key
    * hash-bucket (0-15) falls inside the stratum's quota of 16ths. The
    * sampling decision is a narrow filter — no shuffle, no state — and
    * stable under re-runs and repartitioning, unlike df.stat.sampleBy.
    * `fractions16`: stratum value → how many 16ths to keep (0..16).
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      fractions16: Map[String, Int]): DataFrame = {
    val hexDigits = "0123456789abcdef"
    val keep = fractions16.foldLeft(lit(false)) { case (acc, (stratum, sixteenths)) =>
      when(col(stratumCol) === stratum,
        hashBucket16(col(keyCol)).isin(hexDigits.take(sixteenths).map(_.toString): _*))
        .otherwise(acc)
    }
    df.filter(keep)
  }
}
