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

  /** Leakage-safe train/valid/test split: assignment is keyed on the
    * near-dup CLUSTER representative (the `component` column from
    * [[Dedup.fuzzyDedupClusters]]), not the document id — with a plain
    * id-keyed split, a near-duplicate of a training document lands in
    * test ~25% of the time and silently inflates every evaluation run on
    * the corpus (the reason dedup must run BEFORE splitting, or the split
    * must be cluster-aware like this one). Whole clusters move together:
    * same component ⇒ same split, by construction.
    *
    * Same deterministic md5-bucket machinery as [[deterministicSplit]]
    * (distinct `purpose` salt, so the two splits are independent); the
    * cluster join is the only extra cost over the plain split, and the
    * clusters frame is exactly what the dedup pass already produced.
    */
  def leakageSafeSplit(
      clusters: DataFrame,
      trainBuckets: Int = 12,
      validBuckets: Int = 2): DataFrame = {
    require(trainBuckets + validBuckets < 16, "need at least one test bucket")
    val hexDigits = "0123456789abcdef"
    val train = hexDigits.take(trainBuckets).map(_.toString)
    val valid = hexDigits.slice(trainBuckets, trainBuckets + validBuckets).map(_.toString)
    val b = hashBucket16(col("component"), "lsplit")
    clusters.withColumn("split",
      when(b.isin(train: _*), "train")
        .when(b.isin(valid: _*), "valid")
        .otherwise("test"))
  }

  /** Temperature (alpha) sampling over strata — the multilingual-LM
    * recipe (e.g. mBERT / XLM-R) for flattening a skewed domain/language
    * distribution without an explicit weight table: target weights
    * w_s ∝ count_s^alpha, alpha in (0, 1]. alpha = 1 keeps the natural
    * distribution; alpha → 0 approaches uniform. Downsample-only (no
    * upsampling), so with w_s ∝ c^alpha the binding stratum is always the
    * SCARCEST one — it keeps everything — and the per-stratum keep rate
    * collapses algebraically to (c_min / c_s)^(1-alpha). That closed form
    * is what the DuckDB oracle replays: for the alpha = 0.5 operating
    * point it is sqrt(c_min/c_s), and IEEE sqrt is correctly rounded in
    * every engine (pow carries no such guarantee, hence the split).
    *
    * Scale shape = [[mixtureSample]]: one tiny per-stratum count aggregate
    * (state bounded by stratum cardinality, never corpus size) collected
    * to build a literal threshold chain, then a narrow deterministic
    * hash-filter — no data shuffle, stable under re-runs and re-sharding.
    */
  def temperatureMixture(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val stratum = col(stratumCol).cast("string")
    val counts = df.groupBy(stratum.as("__s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMixture on an empty input")
    val cMin = counts.values.min.toDouble
    val thresholds = counts.map { case (s, c) =>
      val rate = if (alpha == 0.5) math.sqrt(cMin / c)
                 else math.pow(cMin / c, 1 - alpha)
      s -> math.min(256L, math.ceil(256.0 * rate).toLong)
    }
    val thr = thresholds.foldLeft(lit(null).cast("long")) { case (acc, (s, t)) =>
      when(stratum === s, lit(t)).otherwise(acc)
    }
    df.filter(hashBucket256(col(keyCol), "tmix") < thr)
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

  /** Hashed n-gram feature stream for DSIR: every unigram and adjacent
    * bigram of the whitespace-lowered token stream, hashed into `buckets`
    * ids with the portable md5-60-bit family — so an independent engine
    * reproduces the exact bucket of every feature. One narrow expression
    * per doc; only (id, bucket) longs ever leave the scan.
    */
  private def featureBuckets(text: Column, buckets: Int): Column = {
    val t = TextAnalysis.wsTokens(lower(text))
    val bis = zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    concat(
      transform(t, w => pmod(PortableHash.portable60(w), lit(buckets.toLong))),
      transform(bis, b => pmod(PortableHash.portable60(b), lit(buckets.toLong))))
  }

  /** DSIR importance log-weights (Xie et al. 2023, arXiv:2302.03169 "Data
    * Selection for Language Models via Importance Resampling"): score every
    * raw document by how much more likely its hashed-n-gram features are
    * under a TARGET corpus distribution than under the raw distribution —
    * log w(x) = Σ_b n_b(x)·(ln p̂_t(b) − ln p̂_r(b)) with add-one-smoothed
    * bucket unigram models p̂(b) = (c_b + 1)/(C + buckets). High-scoring
    * raw docs "look like" the target domain; resampling by these weights
    * is the standard recipe for tilting a 100 TB crawl toward a quality
    * or domain target without training a classifier.
    *
    * Scale shape: two bucket-count aggregations (≤ `buckets` rows each —
    * vocabulary-bounded state, never corpus-bounded), one broadcast of the
    * ≤`buckets`-row log-ratio table, one map-side-combined per-doc sum.
    * The documents shuffle nothing but (id, bucket) longs.
    *
    * Returns (idCol, logw) for every raw doc, logw rounded to 4 dp (the
    * repo's cross-engine float boundary; summation-order noise is ~1e-12).
    */
  def dsirLogWeights(
      raw: DataFrame,
      target: DataFrame,
      buckets: Int = 1024,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rawFeats = OperatorCaches.persistTracked(
      raw.select(col(idCol).cast("long").as("id"),
        explode(featureBuckets(col(textCol), buckets)).as("b")))
    val tgtCnt = target
      .select(explode(featureBuckets(col(textCol), buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val rawCnt = rawFeats.groupBy("b").agg(count(lit(1)).as("cr"))
    // full outer: a bucket unseen in one corpus still carries its add-one
    // smoothing mass. Totals ride along as literal-free aggregates.
    val tgtTotal = tgtCnt.agg(sum("ct").as("__t"))
    val rawTotal = rawCnt.agg(sum("cr").as("__r"))
    val ratio = tgtCnt.join(rawCnt, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .crossJoin(broadcast(tgtTotal)).crossJoin(broadcast(rawTotal))
      .select(col("b"), (
        log((col("ct") + 1).cast("double") / (col("__t") + buckets)) -
        log((col("cr") + 1).cast("double") / (col("__r") + buckets))).as("lr"))
    rawFeats.join(broadcast(ratio), Seq("b"))
      .groupBy("id")
      .agg(round(sum("lr"), 4).as("logw"))
      .withColumnRenamed("id", idCol)
  }

  /** DSIR resampling: Gumbel-top-n over the importance log-weights —
    * equivalent to sampling n docs WITHOUT replacement with probability
    * ∝ w(x) (the Gumbel-max trick), made deterministic and engine-
    * replayable by drawing each doc's Gumbel from its portable hash:
    * u = (h+1)/(2^60+2), g = −ln(−ln u). Returns the n selected docs with
    * (logw, score), score = rounded logw + g, ranked (score desc, id).
    */
  def dsirSample(
      raw: DataFrame,
      target: DataFrame,
      n: Int,
      buckets: Int = 1024,
      seed: String = "dsir",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = dsirLogWeights(raw, target, buckets, idCol, textCol)
    val u = (PortableHash.portable60(
        concat_ws(":", lit(seed), col(idCol).cast("string"))) + 1).cast("double") /
      lit(math.pow(2, 60))
    w.withColumn("score", round(col("logw") - log(-log(u)), 4))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
  }

  /** Per-domain document cap — at most `cap` documents per group, chosen
    * by deterministic hash rank (the crawl-pipeline rule that stops one
    * aggregator domain from dominating a pre-training mix; C4 and
    * RefinedWeb both ship a variant). Hash-ranked (not first-k) so the
    * kept set is a uniform sample within each domain, stable across runs
    * and partitionings. One window shuffle on the group key; groups under
    * the cap pass through whole.
    */
  def domainCap(
      df: DataFrame,
      groupCol: String,
      cap: Int,
      seed: String = "domaincap",
      idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(PortableHash.portable60(
        concat_ws(":", lit(seed), col(idCol).cast("string"))), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** Weighted sampling WITHOUT replacement over an arbitrary weight
    * column — Efraimidis–Spirakis (2006) via the same Gumbel-top-k
    * identity [[dsirSample]] uses for its learned weights: score =
    * ln(w) + Gumbel, Gumbel = −ln(−ln(u)), u a portable-hash uniform in
    * (0,1]; the top-n scores ARE a weight-proportional sample without
    * replacement. Fully deterministic given the seed (re-runs and
    * independent engines draw the identical sample — the property that
    * makes a 100 TB sampling job resumable and auditable), one
    * TakeOrderedAndProject, no shuffle beyond the top-n.
    *
    * Rows with weight ≤ 0 are excluded (ln undefined) — the E-S
    * convention that zero-weight items are unsampleable.
    */
  def weightedSample(
      df: DataFrame,
      weightCol: Column,
      n: Int,
      seed: String = "wsample",
      idCol: String = "doc_id"): DataFrame = {
    val u = (PortableHash.portable60(
        concat_ws(":", lit(seed), col(idCol).cast("string"))) + 1).cast("double") /
      lit(math.pow(2, 60))
    df.filter(weightCol > 0)
      .withColumn("score", round(log(weightCol) - log(-log(u)), 4))
      .orderBy(col("score").desc, col(idCol))
      .limit(n)
  }

  /** Token-budget-constrained corpus selection — the data-selection
    * primitive: keep the highest-quality documents whose cumulative cost
    * (token count) fits a budget. Semantics are the greedy relaxation
    * every selection paper uses: order by (score rounded to 4 dp DESC,
    * id ASC), take the longest prefix with Σ cost ≤ budget.
    *
    * The naive form is a GLOBAL-order running sum — one partition doing
    * all the work, dead at corpus scale. This implementation computes the
    * SAME selection in the distributed shape: (1) one shuffle builds a
    * per-score-bucket cost histogram (bounded by the 4-dp grid — distinct
    * rounded scores, NOT rows); (2) the driver walks the histogram
    * descending to find the threshold bucket and its residual budget
    * (grid-bounded work); (3) everything above the threshold keeps with a
    * narrow filter, and ONLY the threshold bucket pays a running-sum
    * window, partitioned to that single score value. At 100 TB steps 1
    * and 3 are scan-shaped; the only caveat is a degenerate corpus where
    * most mass shares one rounded score (then the boundary window is the
    * global sort again — pre-sharpen the score or widen the grid).
    *
    * Returns the selected rows as (id, score4, cost). Deterministic and
    * engine-replayable end to end: an oracle reproduces the identical set
    * with a global window over (score4 DESC, id).
    */
  def budgetSelect(
      df: DataFrame,
      scoreCol: Column,
      costCol: Column,
      budget: Long,
      idCol: String = "doc_id"): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val scored = OperatorCaches.persistTracked(
      df.select(col(idCol), round(scoreCol, 4).as("score4"),
        costCol.cast("long").as("cost")))
    // per-bucket cost totals to the driver: bounded by the score GRID
    val hist = scored.groupBy("score4").agg(sum("cost").as("bc"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (s, _) => -s }
    var remaining = budget
    var threshold = Double.NegativeInfinity // buckets strictly above keep whole
    var boundaryBudget = 0L
    val it = hist.iterator
    var done = false
    while (it.hasNext && !done) {
      val (s, bc) = it.next()
      if (bc <= remaining) { remaining -= bc; threshold = s }
      else { boundaryBudget = remaining; threshold = s; done = true }
      // done=false at loop end: every bucket fit — threshold = lowest score
    }
    val full =
      if (done) scored.filter(col("score4") > threshold)
      else scored.filter(col("score4") >= threshold)
    val boundary = if (!done) scored.limit(0) else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("score4").orderBy(col(idCol))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      scored.filter(col("score4") === threshold)
        .withColumn("__cum", sum("cost").over(w))
        .filter(col("__cum") <= boundaryBudget)
        .drop("__cum")
    }
    full.unionByName(boundary)
  }
}
