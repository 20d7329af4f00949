package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-based inference and ranking-quality metrics. Every member follows
  * the ModelEval envelope: the corpus is folded to a GROUPED support table
  * first (one map-side-combined shuffle keyed by the discrete value), so
  * the rank arithmetic that follows runs over the bounded distinct-value
  * support — never a global subject sort, which is what textbook rank
  * statistics (rank() over everything) would shuffle at 100 TB. As with
  * AUC/isotonic, callers bin continuous values first; the support bound is
  * the contract.
  */
object RankEval {

  /** z critical value at α = 0.05 two-sided, on the 6-dp grid — spliced
    * verbatim into the oracles (constant-splice convention).
    */
  val ZCrit05: Double = 1.959964

  /** Mann–Whitney U test (Wilcoxon rank-sum) between group 0 and group 1
    * of an integral value column, with midranks for ties and the tie-
    * corrected normal approximation:
    *
    *   U_a = R_a − n_a(n_a+1)/2
    *   μ   = n_a·n_b/2
    *   σ²  = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))   (t = tie sizes)
    *   z   = (U_a − μ)/σ
    *
    * Distributed shape: ONE groupBy(value) with map-side combine folds the
    * corpus to (value, cnt_a, cnt_b); midranks derive from cumulative
    * counts over the distinct support exactly as in
    * [[ModelEval.aucFromScores]] (same identity — AUC is U_a/(n_a·n_b)).
    *
    * Cross-engine determinism: INTEGER until the final three divisions —
    * rank sums carried as 2×midrank in BIGINT, tie term Σ(t³−t) in BIGINT.
    * BIGINT bounds: rank sums need n ≲ 1e9 (the AUC envelope); the tie
    * term needs max tie-group ≲ 2e6 — past either, swap the sum to
    * DecimalType. `significant` compares |z| AFTER 6-dp rounding against
    * the spliced [[ZCrit05]] so both engines decide over identical values;
    * a degenerate σ = 0 (all values tied) yields NULL z by an explicit
    * guard in both engines.
    *
    * Returns one row: (n_a, n_b, u, z, significant); u is a half-integer
    * carried exactly (one division of a BIGINT by 2.0).
    */
  def mannWhitney(df: DataFrame, valueCol: Column, groupCol: Column): DataFrame = {
    val byV = df
      .groupBy(valueCol.cast("long").as("v"))
      .agg(sum(when(groupCol === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(groupCol === 1, 1L).otherwise(0L)).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byV
      .withColumn("cum_less", sum("cnt").over(w) - col("cnt"))
      .withColumn("midrank2", lit(2L) * col("cum_less") + col("cnt") + 1L)
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(col("ca") * col("midrank2")).as("ra2"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("u",
        (col("ra2") - col("n_a") * (col("n_a") + 1L)).cast("double") / 2.0)
      .withColumn("mu",
        col("n_a").cast("double") * col("n_b") / 2.0)
      .withColumn("sigma2",
        col("n_a").cast("double") * col("n_b") / 12.0 *
          ((col("n") + 1L).cast("double") -
            col("ties").cast("double") /
              (col("n").cast("double") * (col("n") - 1L))))
      .withColumn("z",
        when(col("sigma2") > 0,
          round((col("u") - col("mu")) / sqrt(col("sigma2")), 6)))
      .select(col("n_a"), col("n_b"), col("u"), col("z"),
        (abs(col("z")) > ZCrit05).as("significant"))
  }

  /** Spearman rank correlation between two integral columns, with midranks
    * for ties (Pearson over midranks — the tie-correct form; the textbook
    * 1 − 6Σd²/n(n²−1) shortcut is wrong under ties).
    *
    * Distributed shape: one groupBy per margin builds that margin's
    * (value → midrank2) support table; both broadcast back onto the
    * subjects (support-sized, the binning contract), and ONE aggregation
    * pass collects the five rank moments.
    *
    * Cross-engine determinism: midrank2 values are BIGINTs, and the five
    * moment sums are carried EXACTLY — DecimalType(38,0) here, HUGEINT in
    * the oracle (rank products reach 4n² per row, so Σ overflows int64
    * past n ≈ 1e6; decimal/hugeint make the sums exact at any n). Each
    * exact sum casts to double once (correctly rounded from an integer)
    * and the final correlation is one shared expression on those doubles,
    * 6-dp grid.
    *
    * Returns one row: (n, rho).
    */
  def spearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    def rankTable(c: Column, out: String): DataFrame = {
      val byV = df.groupBy(c.cast("long").as(out))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(out)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV
        .withColumn("cum_less", sum("cnt").over(w) - col("cnt"))
        .select(col(out),
          (lit(2L) * col("cum_less") + col("cnt") + 1L).as(s"r_$out"))
    }
    val dec = DecimalType(38, 0)
    df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .join(broadcast(rankTable(xCol, "x")), "x")
      .join(broadcast(rankTable(yCol, "y")), "y")
      .agg(count(lit(1)).as("n"),
        sum(col("r_x").cast(dec)).as("sx"),
        sum(col("r_y").cast(dec)).as("sy"),
        sum((col("r_x") * col("r_x")).cast(dec)).as("sxx"),
        sum((col("r_y") * col("r_y")).cast(dec)).as("syy"),
        sum((col("r_x") * col("r_y")).cast(dec)).as("sxy"))
      .withColumn("num",
        col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("vx",
        col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("vy",
        col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))
      // a constant margin has zero rank variance: rho undefined — NULL by
      // an explicit shared guard, not an engine-specific NaN/error split
      .select(col("n"),
        when(col("vx") > 0 && col("vy") > 0,
          round(col("num") / (sqrt(col("vx")) * sqrt(col("vy"))), 6))
          .as("rho"))
  }

  /** Precision-recall curve area by the lower trapezoid over score-
    * descending blocks — the deterministic tie-aware PR-AUC: every block
    * of tied scores contributes ONE (recall, precision) point from exact
    * cumulative counts, and the curve starts at the (recall 0,
    * precision 1) convention point. Within-block order never exists, so
    * there is nothing engine-specific to replay (per-subject AP would
    * depend on tie order; the block trapezoid is its canonical form).
    *
    * Same envelope as [[ModelEval.aucFromScores]]: one groupBy(score)
    * pass, cumulative window over the distinct-score support only.
    * Precision/recall are correctly-rounded ratios of exact integers; the
    * final sum of per-block trapezoids is order-free (~1e-16 against the
    * 5e-7 grid boundary, the t-closeness argument). Returns one row:
    * (n_pos, n, pr_auc).
    */
  def prAuc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val byScore = df
      .groupBy(scoreCol.cast("long").as("s"))
      .agg(count(lit(1)).as("cnt"), sum(labelCol.cast("long")).as("pos"))
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy(col("s").desc)
    val pts = byScore
      .withColumn("cum_cnt", sum("cnt").over(w))
      .withColumn("cum_pos", sum("pos").over(w))
      .crossJoin(broadcast(byScore.agg(sum("pos").as("n_pos"),
        sum("cnt").as("n_tot"))))
      .withColumn("recall", col("cum_pos").cast("double") / col("n_pos"))
      .withColumn("prec", col("cum_pos").cast("double") / col("cum_cnt"))
      .withColumn("recall_prev",
        coalesce(lag("recall", 1).over(wLag), lit(0.0)))
      .withColumn("prec_prev",
        coalesce(lag("prec", 1).over(wLag), lit(1.0)))
    pts.agg(first("n_pos").as("n_pos"), first("n_tot").as("n"),
      round(sum((col("recall") - col("recall_prev")) *
        (col("prec") + col("prec_prev")) / 2.0), 6).as("pr_auc"))
  }

  /** Expected calibration error over integral confidence units: the
    * caller supplies confidence as an integer number of grid units (e.g.
    * decile index) plus the grid `scale`, so the predicted probability
    * conf/scale is an EXACT ratio — summing a float probability column
    * would reintroduce order-dependent accumulation. One groupBy(conf)
    * pass;
    *   ECE = Σ_b (n_b/n)·|acc_b − conf_b|,  MCE = max_b |acc_b − conf_b|.
    * Every term is a correctly-rounded function of exact integer counts.
    * Returns one row: (n, ece, mce).
    */
  def ece(df: DataFrame, confUnitsCol: Column, scale: Int,
      labelCol: Column): DataFrame = {
    require(scale > 0, "scale must be positive")
    val byBin = df
      .groupBy(confUnitsCol.cast("long").as("c"))
      .agg(count(lit(1)).as("nb"), sum(labelCol.cast("long")).as("pos"))
      .withColumn("ce",
        abs(col("pos").cast("double") / col("nb") -
          col("c").cast("double") / scale))
    byBin.agg(sum("nb").as("n"),
        sum(col("nb").cast("double") * col("ce")).as("wce"),
        max("ce").as("mce_raw"))
      .select(col("n"), round(col("wce") / col("n"), 6).as("ece"),
        round(col("mce_raw"), 6).as("mce"))
  }

  /** Benjamini–Hochberg step-up FDR adjustment over a (metric, p) family:
    * adjusted p(i) = min_{j ≥ i} min(1, m·p(j)/j) with p sorted ascending
    * (metric name breaks ties deterministically), significant where the
    * ROUNDED adjusted p ≤ α — both engines decide over identical 6-dp
    * values.
    *
    * The single-partition window is the point: a p-value family is
    * metrics-sized (tens to thousands), never corpus-sized — the corpus
    * reduction that PRODUCED each p is where the data was. Returns
    * (metric, p_value, rank, p_adj, significant) ordered by rank.
    */
  def bhAdjust(df: DataFrame, metricCol: Column, pCol: Column,
      alpha: Double = 0.05): DataFrame = {
    val wRank = Window.orderBy(col("p"), col("metric"))
    val wTail = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = df.count()
    df.select(metricCol.as("metric"), pCol.as("p"))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("raw",
        least(lit(1.0), lit(m.toDouble) * col("p") / col("rank")))
      .withColumn("p_adj", round(min("raw").over(wTail), 6))
      .select(col("metric"), round(col("p"), 6).as("p_value"),
        col("rank").cast("long").as("rank"), col("p_adj"),
        (col("p_adj") <= alpha).as("significant"))
      .orderBy("rank")
  }

  /** Bradley–Terry pairwise-preference ratings via the MM algorithm
    * (Hunter 2004), FIXED rounds on a 7-dp per-round grid — the
    * pagerank/logistic-GD replay convention: data-dependent convergence
    * doesn't replay across engines, a round grid does.
    *
    *   p_i ← (W_i / Σ_{j≠i} n_ij/(p_i + p_j)),  then normalize to Σp = 1
    *
    * `wins`: directed aggregate (a, b, w) = games a beat b. The model
    * support is competition-sized (tens to thousands), so every per-round
    * join/window is support-bounded; the corpus-sized work is the
    * caller's wins aggregation. Per-round neighbor sums are unordered
    * doubles rounded at 7 dp (the pagerank contribution argument: ~1e-16
    * against the 5e-8 grid boundary). Returns (model, rating) ordered by
    * model, ratings normalized to sum 1 on the grid.
    */
  def bradleyTerry(wins: DataFrame, rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 50, "rounds must be in [1, 50]")
    val w = wins.select(col("a"), col("b"), col("w").cast("long").as("w"))
    val nij = OperatorCaches.persistTracked(w
      .unionByName(w.select(col("b").as("a"), col("a").as("b"), col("w")))
      .groupBy("a", "b").agg(sum("w").as("n")))
    val winTotals = w.groupBy("a").agg(sum("w").as("w_tot"))
    val models = nij.select(col("a").as("model")).distinct()
    val m = models.count()
    // per-round LINEAGE CUT (the GraphRank `cut` doctrine): without it the
    // 8-round nest of join+agg+crossJoin replans multiplicatively and the
    // driver burns minutes in Catalyst on kilobyte-sized state. Cuts are
    // LAZY (Lineage.cutLazy): q's first action is the normalizer broadcast
    // build right below, p's is the next round's pa broadcast — each
    // materializes in the job that first needs it (guide §1.2).
    var p = Lineage.cutLazy(models.withColumn("p", lit(1.0) / m))
    for (_ <- 1 to rounds) {
      // q is referenced TWICE per round (the normalizer sum and the
      // normalize itself): cut it, or the nij-join+aggregate subtree runs
      // twice per round — once under the `s` broadcast build and once
      // under next round's p (measured at sf0.1: 97 → 80 jobs, in-run
      // 4.6 → 4.4 s — modest here because q is model-count-sized, but at
      // a large model set the duplicated subtree is a full nij join)
      val q = Lineage.cutLazy(nij
        .join(broadcast(p.select(col("model").as("a"), col("p").as("pa"))),
          Seq("a"))
        .join(broadcast(p.select(col("model").as("b"), col("p").as("pb"))),
          Seq("b"))
        .groupBy("a")
        .agg(sum(col("n") / (col("pa") + col("pb"))).as("denom"))
        .join(broadcast(winTotals), Seq("a"), "left")
        .select(col("a").as("model"),
          (coalesce(col("w_tot"), lit(0L)) / col("denom")).as("praw")))
      val s = broadcast(q.agg(sum("praw").as("s")))
      p = Lineage.cutLazy(q.crossJoin(s)
        .select(col("model"), round(col("praw") / col("s"), 7).as("p")))
    }
    p.select(col("model"), col("p").as("rating")).orderBy("model")
  }

  /** Pairwise win rates with Wilson score intervals at α = 0.05: for each
    * unordered pair (a < b), the rate of a over b among decided games and
    * the interval
    *
    *   (p̂ + z²/2n ± z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    *
    * `wins` is the same directed (a, b, w) aggregate bradleyTerry takes.
    * Every term is a correctly-rounded function of exact integer counts
    * and the spliced [[ZCrit05]]; the output support is pair-bounded.
    * Returns (a, b, n, rate, lo, hi) ordered by (a, b).
    */
  def winRateWilson(wins: DataFrame): DataFrame = {
    val z = ZCrit05
    val w = wins.select(col("a"), col("b"), col("w").cast("long").as("w"))
    val pairs = w
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"),
        when(col("a") < col("b"), col("w")).otherwise(lit(0L)).as("wa"),
        col("w").as("wn"))
      .groupBy("a", "b")
      .agg(sum("wa").as("w"), sum("wn").as("n"))
    pairs
      .withColumn("rate", col("w").cast("double") / col("n"))
      .withColumn("center",
        col("rate") + lit(z * z) / (lit(2.0) * col("n")))
      .withColumn("margin",
        lit(z) * sqrt(col("rate") * (lit(1.0) - col("rate")) / col("n") +
          lit(z * z) / (lit(4.0) * col("n") * col("n"))))
      .withColumn("denom", lit(1.0) + lit(z * z) / col("n"))
      .select(col("a"), col("b"), col("n"),
        round(col("rate"), 6).as("rate"),
        round((col("center") - col("margin")) / col("denom"), 6).as("lo"),
        round((col("center") + col("margin")) / col("denom"), 6).as("hi"))
      .orderBy("a", "b")
  }

  /** The NDCG discount table 1/log2(i+1), i = 1..k, and its prefix sums —
    * computed ONCE in Scala and spliced as literals into both engines
    * (the constant-splice convention): log2 is 1-ulp, not correctly
    * rounded, in both JVMs and DuckDB, so neither side ever evaluates it.
    */
  def discounts(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  def discountPrefix(k: Int): Seq[Double] =
    discounts(k).scanLeft(0.0)(_ + _).tail

  /** Ranking-quality evaluation at cutoff k with binary relevance:
    * macro-averaged NDCG@k, MRR@k and recall@k over queries that have at
    * least one relevant item (queries with none are excluded — their NDCG
    * is undefined; document count is reported).
    *
    * `ranked`: (qid, item, rank) with rank 1-based and deterministic
    * (the caller's tiebreak is part of the ranking contract).
    * `relevant`: (qid, item) the binary relevance set.
    *
    * DCG@k = Σ_{hits at rank i ≤ k} d_i and IDCG@k = prefix(min(R, k))
    * with the spliced [[discounts]]/[[discountPrefix]] literals, so the
    * only floats are sums of literal constants (order-free at the 6-dp
    * grid); MRR and recall are exact integer ratios.
    *
    * Distributed shape: relevance counts and the rank≤k slice are both
    * grouped-aggregation shaped; the per-query join is key-partitioned.
    * Returns one row: (n_queries, ndcg, mrr, recall).
    */
  def rankingEval(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    val d = discounts(k)
    val pfx = discountPrefix(k)
    val discountExpr = element_at(
      typedlit(d), col("rank").cast("int"))
    val idcgExpr = element_at(
      typedlit(pfx), least(col("n_rel"), lit(k.toLong)).cast("int"))
    val rel = relevant.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = ranked.filter(col("rank") <= k)
      .join(relevant, Seq("qid", "item"))
      .groupBy("qid")
      .agg(sum(discountExpr).as("dcg"),
        min("rank").as("first_hit"),
        count(lit(1)).as("n_hits"))
    rel.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("dcg"), lit(0.0)).as("dcg"),
        coalesce(lit(1.0) / col("first_hit"), lit(0.0)).as("rr"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("ndcg", col("dcg") / idcgExpr)
      .agg(count(lit(1)).as("n_queries"),
        round(avg("ndcg"), 6).as("ndcg"),
        round(avg("rr"), 6).as("mrr"),
        round(avg(col("n_hits").cast("double") / col("n_rel")), 6)
          .as("recall"))
  }

  /** Reciprocal-rank fusion of two rankings of the same id set (Cormack
    * et al. 2009 — the standard hybrid-search merge, e.g. BM25 ⊕ ANN):
    *
    *   RRF(i) = 1/(k + r1(i)) + 1/(k + r2(i))
    *
    * with r the STRICT row_number rank under (score desc, id) — fully
    * tie-broken, so both engines assign identical integer ranks and the
    * reciprocals are identical IEEE doubles before the 6-dp output grid.
    *
    * Distributed shape: the input is a per-id score table (the corpus
    * fold happened upstream — support contract as everywhere in this
    * object); two windows over it, one top-k TakeOrderedAndProject.
    * Ids missing a score on either side simply rank behind all scored
    * ids on that side (NULL sorts last under desc in both engines —
    * pinned in the oracle).
    *
    * Returns (id, r1, r2, rrf) top `topK` by rrf desc then id.
    */
  def rrfFuse(
      scores: DataFrame,
      idCol: Column,
      score1: Column,
      score2: Column,
      k: Int = 60,
      topK: Int = 20): DataFrame = {
    require(k >= 1 && topK >= 1, "k and topK must be positive")
    val base = scores.select(idCol.as("id"), score1.as("s1"),
      score2.as("s2"))
    base
      .withColumn("r1", row_number().over(
        Window.orderBy(col("s1").desc_nulls_last, col("id"))).cast("long"))
      .withColumn("r2", row_number().over(
        Window.orderBy(col("s2").desc_nulls_last, col("id"))).cast("long"))
      .select(col("id"), col("r1"), col("r2"),
        round(lit(1.0) / (lit(k.toDouble) + col("r1")) +
          lit(1.0) / (lit(k.toDouble) + col("r2")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
  }

  /** Order- and partition-independent table fingerprint per group — the
    * migration-parity primitive ("did the copy/engine-swap preserve the
    * data") that a 100 TB pipeline runs after every rewrite: each row
    * canonicalizes to a string, hashes through two INDEPENDENT portable
    * hash channels (domain-separated seeds), and the per-group fingerprint
    * is the pair of hash SUMS folded mod 2^61−1 — commutative, so file
    * order, partitioning, and shuffle order cannot move it; two channels
    * so a coincidental collision in one sum cannot hide a diff.
    *
    * Arithmetic: sums accumulate in decimal(38,0) (n·2^60 < 10^37 even
    * at 10^18 rows — no wraparound to reason about), then fold onto the
    * BIGINT grid with one mod — the published fingerprint is a plain
    * int64 both engines and every downstream tool can carry.
    *
    * Distributed shape: one scan, one map-side-combined groupBy(group) —
    * the cheapest possible full-content audit.
    *
    * Returns (grp, n_rows, fp1, fp2) ordered by grp. Callers build
    * `rowCanon` from INTEGRAL/string columns only (doubles format
    * differently across engines — put them on a unit grid first).
    */
  val FingerprintMod: Long = 2305843009213693951L // 2^61 - 1

  def tableFingerprint(
      df: DataFrame,
      groupCol: Column,
      rowCanon: Column): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(groupCol.as("grp"), rowCanon.cast("string").as("c"))
      .select(col("grp"),
        PortableHash.portable60(concat(lit("fp1:"), col("c"))).as("h1"),
        PortableHash.portable60(concat(lit("fp2:"), col("c"))).as("h2"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("h1").cast(dec)), lit(FingerprintMod).cast(dec))
          .cast("long").as("fp1"),
        pmod(sum(col("h2").cast(dec)), lit(FingerprintMod).cast(dec))
          .cast("long").as("fp2"))
      .orderBy("grp")
  }

  /** Merkle-style snapshot reconciliation: fingerprint both snapshots
    * into `buckets` hash buckets of the row canon and return ONLY the
    * buckets whose fingerprints disagree — locating a diff in a 100 TB
    * pair costs two scans and a `buckets`-row compare, never a row-level
    * join. Each flagged bucket then scopes the expensive row-level diff
    * to n/buckets rows (recurse with a finer canon prefix if needed —
    * the anti-entropy pattern).
    *
    * Returns (bucket, n_rows_a, n_rows_b, fp1_a, fp1_b, match) for
    * differing buckets ordered by bucket — plus nothing when the
    * snapshots are identical (empty result IS the parity certificate).
    */
  def fingerprintDiff(
      a: DataFrame,
      b: DataFrame,
      rowCanonA: Column,
      rowCanonB: Column,
      buckets: Long): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    def side(df: DataFrame, canon: Column, suffix: String) =
      tableFingerprint(
        df.select(canon.cast("string").as("c"))
          .withColumn("bkt", pmod(PortableHash.portable60(
            concat(lit("fpd:"), col("c"))), lit(buckets))),
        col("bkt"), col("c"))
        .select(col("grp").as("bucket"),
          col("n_rows").as(s"n_rows_$suffix"),
          col("fp1").as(s"fp1_$suffix"), col("fp2").as(s"fp2_$suffix"))
    side(a, rowCanonA, "a").join(side(b, rowCanonB, "b"),
        Seq("bucket"), "full_outer")
      .filter(coalesce(col("n_rows_a"), lit(-1L)) =!=
          coalesce(col("n_rows_b"), lit(-1L)) ||
        coalesce(col("fp1_a"), lit(-1L)) =!=
          coalesce(col("fp1_b"), lit(-1L)) ||
        coalesce(col("fp2_a"), lit(-1L)) =!=
          coalesce(col("fp2_b"), lit(-1L)))
      .select(col("bucket"), coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        col("fp1_a"), col("fp1_b"))
      .orderBy("bucket")
  }
}
