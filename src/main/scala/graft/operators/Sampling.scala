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
    *
    * `purpose` salts the hash per operation: every sampler keeps a PREFIX
    * range of the same hash space, so two unsalted samplers compose into
    * fully correlated selections (a 4/16 stratified sample would sit
    * entirely inside the 12/16 'train' split and leave valid/test empty).
    * Distinct purpose strings give independent bucketings.
    */
  def hashBucket16(key: Column, purpose: String): Column =
    substring(md5(concat_ws(":", lit(purpose), key.cast("string"))), 1, 1)

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
      when(hashBucket16(col(keyCol), "split").isin(train: _*), "train")
        .when(hashBucket16(col(keyCol), "split").isin(valid: _*), "valid")
        .otherwise("test"))
  }

  /** Deterministic global corpus shuffle: order by md5(seed, key). The
    * every-epoch operation of a training pipeline — a full-corpus
    * permutation that is reproducible (same seed ⇒ same order, across
    * engines and re-runs) and re-randomizable (new seed ⇒ fresh
    * permutation). Plans as a range-partitioned sort on a 32-char key:
    * one shuffle, no driver-side state, no RNG to snapshot. Returns the
    * frame with its `shuffle_key` so downstream writes can bucket or
    * range-split on it. `keyCol` must be unique and non-null (use the
    * primary id): rows sharing a key — including all null-key rows, which
    * concat_ws collapses to the same hash — share a shuffle_key and stay
    * adjacent in every epoch.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws(":", lit(seed), col(keyCol).cast("string"))))
      .orderBy("shuffle_key")

  /** 256-way deterministic bucket from the first two md5 hex digits —
    * finer-grained sibling of [[hashBucket16]] for rate-based sampling.
    * Spark side decodes them with conv(hex, 16, 10); an engine without
    * conv (DuckDB) gets the same value from
    * (instr(hexAlphabet, digit1)-1)*16 + (instr(hexAlphabet, digit2)-1).
    */
  def hashBucket256(key: Column, purpose: String): Column =
    conv(substring(md5(concat_ws(":", lit(purpose), key.cast("string"))), 1, 2),
      16, 10).cast("long")

  /** Mixture (domain-reweighting) sampling: downsample each stratum so the
    * kept corpus approaches the target weight distribution — the
    * "data mixture" step of a training pipeline (e.g. web 50% / books 30%
    * / code 20% regardless of raw crawl proportions). Downsample-only: the
    * feasible total is N = min_s(count_s / w_s), each stratum keeps
    * ~w_s·N rows, and the binding (scarcest-relative-to-weight) stratum
    * keeps everything. Strata not in `weights` are dropped.
    *
    * The keep decision is `hashBucket256(key) < ceil(256·w_s·N/count_s)`:
    * a narrow filter against a broadcast-sized per-stratum threshold map —
    * no shuffle beyond the one tiny count aggregate, stable under re-runs
    * and repartitioning, and rate-quantized to 1/256 (so realized
    * proportions are within ~0.4% of targets; use exact-quota rank
    * sampling if that matters more than avoiding a per-stratum sort).
    */
  def mixtureSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    // cast: the stratum column need not be StringType (int domain ids)
    val stratum = col(stratumCol).cast("string")
    val counts = df.groupBy(stratum.as("__s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = weights.filter { case (s, _) => counts.getOrElse(s, 0L) > 0L }
    require(present.nonEmpty, "no stratum from weights present in the data")
    val feasibleN = present.map { case (s, w) => counts(s) / w }.min
    val thresholds = present.map { case (s, w) =>
      s -> math.min(256L, math.ceil(256.0 * w * feasibleN / counts(s)).toLong)
    }
    val thr = thresholds.foldLeft(lit(null).cast("long")) { case (acc, (s, t)) =>
      when(stratum === s, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket256(col(keyCol), "mix") < thr)
  }

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
        hashBucket16(col(keyCol), "strat").isin(hexDigits.take(sixteenths).map(_.toString): _*))
        .otherwise(acc)
    }
    df.filter(keep)
  }
}
