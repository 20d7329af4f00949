package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature-engineering operators for ML data prep — the encode /
  * hash stage between the warehouse tables and a trainer. New scope beyond
  * the reference (which stops at when/otherwise feature columns,
  * SURVEY.md §2h); both members follow the house envelope: grouped
  * support tables, exact integer arithmetic until the final divisions,
  * portable hashes.
  */
object FeatureEng {

  /** Leave-one-out target encoding with additive (m-estimate) smoothing —
    * the high-cardinality-categorical encoder that avoids plain mean
    * encoding's target leakage (each row's own label is excluded) and its
    * rare-category variance (the global mean prior with weight m):
    *
    *   enc(c, y) = (sum_c − y + m·gmean) / (n_c − 1 + m)
    *
    * Distributed shape: ONE groupBy(category) with map-side combine for
    * (n_c, sum_c), one single-row global aggregate broadcast. The LOO
    * encoding of a row depends only on its (category, label) pair, so the
    * output is the BOUNDED (category, label) support table — a trainer
    * joins it back by (c, y) at feature time; no per-row table ships.
    *
    * Cross-engine determinism: counts and sums are exact BIGINTs on the
    * integral-label contract; gmean is one division, enc one fixed IEEE
    * expression, outputs on the 6-dp grid.
    *
    * Returns (key, y, n_rows, enc) — n_rows the support count, ordered.
    */
  def targetEncodeLoo(
      df: DataFrame,
      keyCol: Column,
      labelCol: Column,
      m: Long = 20L): DataFrame = {
    require(m >= 1, "smoothing weight m must be >= 1 (m = 0 divides by " +
      "zero on singleton categories)")
    val base = df.select(keyCol.as("key"), labelCol.cast("long").as("y"))
    val perKey = base.groupBy("key")
      .agg(count(lit(1)).as("n_c"), sum("y").as("sum_c"))
    val global = broadcast(base.agg(
      (sum("y").cast("double") / count(lit(1))).as("gmean")))
    base.groupBy("key", "y").agg(count(lit(1)).as("n_rows"))
      .join(perKey, Seq("key"))
      .crossJoin(global)
      .select(col("key"), col("y"), col("n_rows"),
        round(((col("sum_c") - col("y")).cast("double")
            + lit(m.toDouble) * col("gmean"))
          / (col("n_c") - 1L + m), 6).as("enc"))
      .orderBy("key", "y")
  }

  /** Hashing-trick feature audit: map every (column, value) feature of
    * the given columns to one of `nBuckets` buckets by the portable hash
    * and report the collision profile — the pre-flight a pipeline runs
    * before committing to a hashed feature width:
    *
    *   bucket(col, v) = portable60(col || '=' || v) mod nBuckets
    *
    * Distributed shape: one explode (|cols|× fan-out) + ONE distinct on
    * the feature string (map-side combined) + one groupBy(bucket) over
    * the bounded distinct-feature set. Shuffles carry features, never
    * rows.
    *
    * Returns one row: (n_features, n_buckets_used, n_collision_buckets,
    * max_bucket_load) — all exact BIGINTs.
    */
  def hashFeatures(
      df: DataFrame,
      cols: Seq[String],
      nBuckets: Long): DataFrame = {
    require(cols.nonEmpty && nBuckets >= 2, "need columns and >= 2 buckets")
    val feats = df.select(explode(array(cols.map(c =>
        concat(lit(c), lit("="), col(c).cast("string"))): _*)).as("feat"))
      .filter(col("feat").isNotNull)
      .distinct()
      .withColumn("bucket",
        pmod(PortableHash.portable60(col("feat")), lit(nBuckets)))
    feats.groupBy("bucket").agg(count(lit(1)).as("load"))
      .agg(sum("load").as("n_features"),
        count(lit(1)).as("n_buckets_used"),
        sum(when(col("load") > 1, 1L).otherwise(0L))
          .as("n_collision_buckets"),
        max("load").as("max_bucket_load"))
  }

  /** Quantile normalization of an integral feature across groups — the
    * cross-source distribution aligner (microarray heritage, used in data
    * prep to make "length" comparable between a verbose and a terse
    * source): each (group, value) is replaced by the POOLED empirical
    * quantile at its within-group midrank,
    *
    *   p(g, v)   = (cum_g(v) − cnt_g(v)/2) / n_g      (midrank CDF)
    *   norm(g,v) = inf { x : F_pool(x) ≥ p }           (type-1 quantile)
    *
    * Distributed shape: ONE groupBy(group, value) folds the corpus to the
    * per-group support; the pooled support is a second bounded aggregate
    * over it; the quantile lookup is a support × support range join —
    * audit-sized on the bin-first contract (isotonic's m² envelope; bin
    * continuous features first).
    *
    * Cross-engine determinism: ENTIRELY exact — midranks and the lookup
    * comparison are cross-multiplied integers
    * (2·cum_pool·n_g ≥ (2·cum_g − cnt)·N), and the normalized value is a
    * pooled support member (a BIGINT), not an interpolation. No doubles
    * anywhere. The cross-multiplication runs in decimal(38,0): its
    * operands are corpus-scale row counts, so 2·N² passes 2^63 at
    * ~2.1e9 rows and Spark's int64 multiply would wrap SILENTLY there
    * (DuckDB's errors loudly) — decimal keeps the predicate exact to
    * N ≈ 1e19 with no cross-engine divergence window.
    *
    * Returns (group, value, cnt, norm_value) ordered.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sup = df.groupBy(groupCol.as("g"), valueCol.cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perGroup = sup
      .withColumn("cum_g", sum("cnt").over(wg))
      .withColumn("n_g", sum("cnt").over(Window.partitionBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("p_num", lit(2L) * col("cum_g") - col("cnt"))
    val wAll = Window.orderBy("pv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pooled = sup.groupBy(col("v").as("pv"))
      .agg(sum("cnt").as("pcnt"))
      .withColumn("cum_pool", sum("pcnt").over(wAll))
    val total = broadcast(pooled.agg(max("cum_pool").as("n_all")))
    val dec = "decimal(38,0)"
    perGroup
      .join(pooled.crossJoin(total),
        lit(2L).cast(dec) * col("cum_pool").cast(dec) * col("n_g").cast(dec)
          >= col("p_num").cast(dec) * col("n_all").cast(dec))
      .groupBy("g", "v", "cnt")
      .agg(min("pv").as("norm_value"))
      .orderBy("g", "v")
  }
}
