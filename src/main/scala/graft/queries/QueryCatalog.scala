package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.{Dedup, OperatorCaches, Packing, Profiling, Similarity, SkewJoin, TextAnalysis}

/** One catalog entry: a Spark implementation plus (when SQL-expressible) a
  * DuckDB oracle over the same parquet tables. Column names are aligned
  * 1:1 between the two (the driver's compare sorts columns by name before
  * hashing). Every query ends in a deterministic ORDER BY so row order can
  * never cause a spurious mismatch.
  */
/** @param counterExample marks an entry RETAINED AS A MEASURED SCALE
  *   COUNTER-EXAMPLE: correct on the fixtures (its oracle row is green)
  *   but proven non-viable at x100 in BENCH_SF10.md, kept beside its
  *   scale-safe replacement so the failure mode stays measured, not
  *   anecdotal. Surfaced in the bench driver line ("counterexamples")
  *   so artifact readers see the status without archaeology.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    counterExample: Boolean = false)

object QueryCatalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared as-of core (clicks matched to the latest preceding purchase
    * second per user, single-shuffle union+window): q_asof_join reads it
    * straight, q_asof_tolerance adds the horizon filter. One
    * implementation so the two queries cannot silently diverge. Keeps
    * (event_id, sec, purchase_sec) for click rows.
    */
  private def asOfClickPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("sec", date_trunc("second", col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("sec")).distinct()
      .withColumn("kind", lit(0)).withColumn("event_id", lit(null).cast("long"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("sec"), lit(1).as("kind"), col("event_id"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("sec"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("purchase_sec",
        max(when(col("kind") === 0, col("sec"))).over(w))
      .filter(col("kind") === 1)
  }

  /** DuckDB CTE chain replaying the PORTABLE MinHash+LSH path end-to-end
    * (Dedup.minHashLsh(portable = true), shingleK = 3): md5-60bit shingle
    * hashes mod 2^31−1, the literal affine families (spliced from
    * Dedup.affineParams — same constants as the Spark expression tree),
    * min-per-family signatures, banding at the auto-derived (b, r), the
    * modular band chain, distinct band-collision candidates, and the
    * exact-Jaccard verify. Ends with a `mh_pairs(id_a, id_b, jaccard)`
    * CTE (already threshold-filtered) for callers to select from.
    */
  private def minhashPairCtes(numHashes: Int, threshold: Double): String = {
    val b = Dedup.autoBands(numHashes, threshold)
    val r = numHashes / b
    val fam = Dedup.affineParams(numHashes).zipWithIndex
      .map { case ((a, bb), i) => s"($i, $a, $bb)" }
      .grouped(8).map(_.mkString(", ")).mkString(",\n                  ")
    s"""tk AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              shi AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s FROM tk),
              hs AS (SELECT id, list_distinct(list_transform(s,
                  g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 2147483647))
                  AS hv FROM shi),
              fam(i, a, b) AS (VALUES
                  $fam),
              sigs AS (SELECT id, i, min((a * h + b) % 2147483647) AS sig
                FROM (SELECT id, unnest(hv) AS h FROM hs) ph, fam GROUP BY id, i),
              bnd AS (SELECT id, i // $r AS band, list(sig ORDER BY i) AS sl
                FROM sigs GROUP BY id, i // $r),
              bh AS (SELECT id, band, list_reduce(list_prepend(CAST(0 AS BIGINT), sl),
                  (acc, v) -> (acc * 1000003 + v) % 2147483647) AS bh FROM bnd),
              cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bh a JOIN bh c
                ON a.band = c.band AND a.bh = c.bh AND a.id < c.id),
              mh_pairs AS (SELECT id_a, id_b,
                  round(CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE)
                    / (len(ha.hv) + len(hb.hv)
                       - len(list_intersect(ha.hv, hb.hv))), 4) AS jaccard
                FROM cand JOIN hs ha ON ha.id = id_a JOIN hs hb ON hb.id = id_b
                WHERE round(CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE)
                    / (len(ha.hv) + len(hb.hv)
                       - len(list_intersect(ha.hv, hb.hv))), 4) >= $threshold)"""
  }

  /** Oracle for incremental near-dup dedup: base signatures from
    * `documents`, a derived re-crawl batch (ids +1000, every 3rd doc
    * truncated to its first half — Jaccard ~1/3, below the 0.5 cut),
    * band-chain probe join, component-match estimate, anti-join. All in
    * the portable hash family so every step replays exactly.
    */
  /** The literal affine-family VALUES rows shared by every portable-minhash
    * oracle (spliced from Dedup.affineParams — same constants as the Spark
    * expression tree).
    */
  private def affineFamValues(numHashes: Int): String =
    Dedup.affineParams(numHashes).zipWithIndex
      .map { case ((a, bb), i) => s"($i, $a, $bb)" }
      .grouped(8).map(_.mkString(", ")).mkString(",\n                  ")

  /** Portable minhash sketch CTE chain for a `(id, text)` source CTE named
    * `src`, suffixed `p`: tokenize → 3-gram shingles → md5-60bit hashes mod
    * 2^31−1 (hs$p.hv) → per-family min signatures (sig_$p) → modular band
    * chain keys (bh_$p). Callers must emit the `fam(i, a, b)` CTE
    * ([[affineFamValues]]) first.
    */
  private def sketchCtes(src: String, p: String, r: Int): String =
    s"""tk$p AS (SELECT id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM $src),
              sh$p AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s FROM tk$p),
              hs$p AS (SELECT id, list_distinct(list_transform(s,
                  g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 2147483647))
                  AS hv FROM sh$p),
              sig_$p AS (SELECT id, i, min((a * h + b) % 2147483647) AS sig
                FROM (SELECT id, unnest(hv) AS h FROM hs$p) ph, fam GROUP BY id, i),
              bh_$p AS (SELECT id, band, list_reduce(list_prepend(CAST(0 AS BIGINT), sl),
                  (acc, v) -> (acc * 1000003 + v) % 2147483647) AS bh FROM (
                  SELECT id, i // $r AS band, list(sig ORDER BY i) AS sl
                  FROM sig_$p GROUP BY id, i // $r))"""

  private def incrMinhashOracleSql(numHashes: Int, threshold: Double): String = {
    val b = Dedup.autoBands(numHashes, threshold)
    val r = numHashes / b
    val fam = affineFamValues(numHashes)
    s"""WITH fam(i, a, b) AS (VALUES
                  $fam),
              baseq AS (SELECT CAST(doc_id AS BIGINT) AS id, text FROM documents),
              newq AS (SELECT CAST(doc_id + 1000 AS BIGINT) AS id,
                  CASE WHEN doc_id % 3 = 0
                    THEN substr(text, 1, CAST(floor(length(text) / 2) AS INT))
                    ELSE text END AS text
                FROM documents),
              ${sketchCtes("baseq", "b", r)},
              ${sketchCtes("newq", "n", r)},
              cand AS (SELECT DISTINCT n.id AS new_id, b.id AS base_id
                FROM bh_n n JOIN bh_b b ON n.band = b.band AND n.bh = b.bh),
              est AS (SELECT c.new_id,
                  sum(CASE WHEN sn.sig = sb.sig THEN 1 ELSE 0 END)
                    / CAST($numHashes AS DOUBLE) AS est
                FROM cand c
                JOIN sig_n sn ON sn.id = c.new_id
                JOIN sig_b sb ON sb.id = c.base_id AND sb.i = sn.i
                GROUP BY c.new_id, c.base_id),
              dup AS (SELECT DISTINCT new_id FROM est WHERE est >= $threshold)
              SELECT n.id AS doc_id FROM newq n
              ANTI JOIN dup d ON n.id = d.new_id
              ORDER BY doc_id"""
  }

  /** Oracle for q_ingest_neardup: replays ONE streaming-ingest foreachBatch
    * round stage by stage in DuckDB — batch construction, within-batch
    * exact dedup (min id per md5), the digest-table probe against the base
    * corpus, the within-batch near-dup prune (portable minhash pairs →
    * recursive-CTE connected components → keep the min-id representative,
    * CorpusIngest's policy), and the minhash sketch-table probe with the
    * component-match estimate (incrementalMinHash's arithmetic).
    */
  private def ingestNeardupOracleSql(numHashes: Int, threshold: Double): String = {
    val b = Dedup.autoBands(numHashes, threshold)
    val r = numHashes / b
    s"""WITH RECURSIVE fam(i, a, b) AS (VALUES
                  ${affineFamValues(numHashes)}),
              baseq AS (SELECT CAST(doc_id AS BIGINT) AS id, text FROM documents),
              newa AS (SELECT CAST(doc_id + 1000 AS BIGINT) AS id,
                  CASE WHEN doc_id % 3 = 0
                    THEN substr(text, 1, CAST(floor(length(text) / 2) AS INT))
                    ELSE text END AS text
                FROM documents),
              newq AS (
                SELECT id, text FROM newa
                UNION ALL
                SELECT id + 1000, text || ' nearvar' FROM newa WHERE (id - 1000) % 3 = 0
                UNION ALL
                SELECT id + 2000, text FROM newa WHERE (id - 1000) % 5 = 0),
              exd AS (SELECT id, text FROM (
                  SELECT id, text, min(id) OVER (PARTITION BY md5(text)) AS mn
                  FROM newq)
                WHERE id = mn),
              exn AS (SELECT e.id, e.text FROM exd e
                ANTI JOIN (SELECT DISTINCT md5(text) AS d FROM baseq) s
                ON md5(e.text) = s.d),
              ${sketchCtes("exn", "n", r)},
              ibc AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bh_n a JOIN bh_n c
                ON a.band = c.band AND a.bh = c.bh AND a.id < c.id),
              ibp AS (SELECT id_a, id_b FROM ibc
                JOIN hsn ha ON ha.id = id_a JOIN hsn hb ON hb.id = id_b
                WHERE round(CAST(len(list_intersect(ha.hv, hb.hv)) AS DOUBLE)
                    / (len(ha.hv) + len(hb.hv)
                       - len(list_intersect(ha.hv, hb.hv))), 4) >= $threshold),
              edges AS (SELECT id_a AS src, id_b AS dst FROM ibp
                UNION SELECT id_b, id_a FROM ibp),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, rc.lbl FROM reach rc JOIN edges e ON e.src = rc.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node),
              surv AS (SELECT e.id, e.text FROM exn e
                ANTI JOIN (SELECT id FROM comp WHERE component < id) l
                ON e.id = l.id),
              ${sketchCtes("baseq", "b", r)},
              cand AS (SELECT DISTINCT n.id AS new_id, bb.id AS base_id
                FROM bh_n n JOIN surv s ON s.id = n.id
                JOIN bh_b bb ON n.band = bb.band AND n.bh = bb.bh),
              est AS (SELECT c.new_id,
                  sum(CASE WHEN sn.sig = sb.sig THEN 1 ELSE 0 END)
                    / CAST($numHashes AS DOUBLE) AS est
                FROM cand c
                JOIN sig_n sn ON sn.id = c.new_id
                JOIN sig_b sb ON sb.id = c.base_id AND sb.i = sn.i
                GROUP BY c.new_id, c.base_id),
              dup AS (SELECT DISTINCT new_id FROM est WHERE est >= $threshold)
              SELECT s.id AS doc_id FROM surv s
              ANTI JOIN dup d ON s.id = d.new_id
              ORDER BY doc_id"""
  }

  /** Oracle for the span-surgery entries: first-occurrence keepers per
    * repeated 5-gram, the keeper-protected cut-index subtraction (strict =
    * keeper join carries the gram, see Dedup.cutRepeatedSpans), and the
    * per-doc post-cut text rebuild compared by md5.
    */
  private def repeatedCutOracleSql(strict: Boolean): String = {
    val keeperJoin =
      if (strict) "k.id = n.id AND k.ti = n.ti AND k.gram = n.gram"
      else "k.id = n.id AND k.ti = n.ti"
    s"""WITH tk AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              g AS (SELECT id, r.pos,
                  array_to_string(t[r.pos:r.pos+4], ' ') AS gram
                FROM tk, LATERAL unnest(range(1, len(t) - 3)) AS r(pos)
                WHERE len(t) >= 5),
              occ AS (SELECT id, pos, gram,
                  count(*) OVER (PARTITION BY gram) AS c,
                  row_number() OVER (PARTITION BY gram ORDER BY id, pos) AS rn
                FROM g),
              rep AS (SELECT * FROM occ WHERE c > 1),
              nk AS (SELECT id, gram, unnest(range(pos - 1, pos + 4)) AS ti
                FROM rep WHERE rn > 1),
              kp AS (SELECT id, gram, unnest(range(pos - 1, pos + 4)) AS ti
                FROM rep WHERE rn = 1),
              cut AS (SELECT DISTINCT n.id, n.ti FROM nk n
                ANTI JOIN kp k ON $keeperJoin),
              tokpos AS (SELECT id, p.pos, t[p.pos] AS tok
                FROM tk, LATERAL unnest(range(1, len(t) + 1)) AS p(pos)),
              kept AS (SELECT tp.id,
                  string_agg(tp.tok, ' ' ORDER BY tp.pos) AS text_cut
                FROM tokpos tp
                ANTI JOIN cut c ON c.id = tp.id AND c.ti = tp.pos - 1
                GROUP BY tp.id),
              ncut AS (SELECT id, count(*) AS n FROM cut GROUP BY id)
              SELECT t.id AS doc_id, coalesce(ncut.n, 0) AS n_cut_tokens,
                md5(coalesce(k.text_cut, '')) AS digest
              FROM tk t
              LEFT JOIN kept k ON k.id = t.id
              LEFT JOIN ncut ON ncut.id = t.id
              ORDER BY doc_id"""
  }

  /** The BPE training chain as DuckDB CTEs: word-freq table, character
    * symbol arrays, then `rounds` unrolled merge rounds — weighted pair
    * counts (p), total-order argmax (m), and the greedy left-to-right
    * apply via the window-parity closed form (consecutive-match runs
    * merge at offsets 0, 2, 4…; e/g/o/c stages), producing v{r}. Round
    * CTEs are MATERIALIZED: v/m are multi-referenced and DuckDB's
    * inlining otherwise re-evaluates the chain exponentially (hit as fd
    * exhaustion before it was slow). Shared by q_bpe_merges (reads m1..8)
    * and q_bpe_token_counts (reads v8).
    */
  private def bpeChainCtes(rounds: Int): String = {
    val rs = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT s[i] AS a, s[i + 1] AS b,
                  CAST(sum(freq) AS BIGINT) AS cnt
                FROM v${r - 1}, LATERAL unnest(range(1, len(s))) t(i)
                GROUP BY 1, 2),
              m$r AS MATERIALIZED (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
              e$r AS MATERIALIZED (SELECT w, freq, CAST(i AS BIGINT) AS i, s[i] AS sym,
                  coalesce(i < len(s)
                    AND s[i] = (SELECT a FROM m$r)
                    AND s[i + 1] = (SELECT b FROM m$r), FALSE) AS mt
                FROM v${r - 1}, LATERAL unnest(range(1, len(s) + 1)) t(i)),
              g$r AS (SELECT *, i - row_number()
                  OVER (PARTITION BY w, mt ORDER BY i) AS grp FROM e$r),
              o$r AS (SELECT *, CASE WHEN mt THEN
                  (i - min(i) OVER (PARTITION BY w, mt, grp)) % 2 = 0
                  ELSE FALSE END AS mstart FROM g$r),
              c$r AS (SELECT *, coalesce(lag(mstart)
                  OVER (PARTITION BY w ORDER BY i), FALSE) AS consumed FROM o$r),
              v$r AS MATERIALIZED (SELECT w, any_value(freq) AS freq,
                  list(CASE WHEN mstart THEN sym || (SELECT b FROM m$r)
                       ELSE sym END ORDER BY i)
                    FILTER (WHERE NOT consumed) AS s
                FROM c$r GROUP BY w)"""
    }.mkString(",\n              ")
    s"""w0 AS MATERIALIZED (SELECT x.w AS w, count(*) AS freq FROM (
                  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
                  FROM documents) x GROUP BY 1),
              v0 AS MATERIALIZED (SELECT w, freq,
                  list_append([substr(w, i, 1) FOR i IN range(1, length(w) + 1)],
                    '</w>') AS s
                FROM w0),
              $rs"""
  }

  /** The BATCHED BPE chain ([[graft.operators.TextAnalysis.bpeTrainBatched]])
    * as DuckDB CTEs: per round, pair counts (p), ranked top-k candidates
    * (t), the one-shot non-conflicting acceptance (acc — NOT EXISTS a
    * higher-ranked candidate sharing a symbol), and the SIMULTANEOUS
    * greedy apply of all accepted rules against the round-start arrays —
    * the single-merge window-parity closed form generalized to a
    * symbol-disjoint rule set (each position left-joins its matching rule;
    * runs of consecutive matches are necessarily one (x,x) rule, so the
    * parity logic is untouched; the merged symbol appends the MATCHED
    * rule's b). Same MATERIALIZED discipline as [[bpeChainCtes]].
    */
  private def bpeBatchChainCtes(rounds: Int, k: Int): String = {
    val rs = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT s[i] AS a, s[i + 1] AS b,
                  CAST(sum(freq) AS BIGINT) AS cnt
                FROM v${r - 1}, LATERAL unnest(range(1, len(s))) t(i)
                GROUP BY 1, 2),
              t$r AS MATERIALIZED (SELECT a, b, cnt,
                  row_number() OVER (ORDER BY cnt DESC, a, b) AS rk
                FROM p$r ORDER BY cnt DESC, a, b LIMIT $k),
              acc$r AS MATERIALIZED (SELECT a, b, cnt,
                  row_number() OVER (ORDER BY rk) AS rank FROM t$r t
                WHERE NOT EXISTS (SELECT 1 FROM t$r h WHERE h.rk < t.rk
                  AND (h.a = t.a OR h.a = t.b OR h.b = t.a OR h.b = t.b))),
              x$r AS MATERIALIZED (SELECT w, freq, CAST(i AS BIGINT) AS i,
                  s[i] AS sym,
                  CASE WHEN i < len(s) THEN s[i + 1] END AS nxt
                FROM v${r - 1}, LATERAL unnest(range(1, len(s) + 1)) t(i)),
              e$r AS MATERIALIZED (SELECT x.w, x.freq, x.i, x.sym,
                  ru.b AS rb, ru.a IS NOT NULL AS mt
                FROM x$r x LEFT JOIN acc$r ru
                  ON x.sym = ru.a AND x.nxt = ru.b),
              g$r AS (SELECT *, i - row_number()
                  OVER (PARTITION BY w, mt ORDER BY i) AS grp FROM e$r),
              o$r AS (SELECT *, CASE WHEN mt THEN
                  (i - min(i) OVER (PARTITION BY w, mt, grp)) % 2 = 0
                  ELSE FALSE END AS mstart FROM g$r),
              c$r AS (SELECT *, coalesce(lag(mstart)
                  OVER (PARTITION BY w ORDER BY i), FALSE) AS consumed FROM o$r),
              v$r AS MATERIALIZED (SELECT w, any_value(freq) AS freq,
                  list(CASE WHEN mstart THEN sym || rb ELSE sym END ORDER BY i)
                    FILTER (WHERE NOT consumed) AS s
                FROM c$r GROUP BY w)"""
    }.mkString(",\n              ")
    s"""w0 AS MATERIALIZED (SELECT x.w AS w, count(*) AS freq FROM (
                  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
                  FROM documents) x GROUP BY 1),
              v0 AS MATERIALIZED (SELECT w, freq,
                  list_append([substr(w, i, 1) FOR i IN range(1, length(w) + 1)],
                    '</w>') AS s
                FROM w0),
              $rs"""
  }

  /** PageRank-over-the-trade-graph oracle (8 unrolled rounds on the 7-dp
    * grid) — shared by q_pagerank and its budget-gated twin (the gate is
    * cost-only below the ceiling, so both replay identically).
    */
  private lazy val pagerankOracleSql: String = {
    val iters = (1 to 8).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
                round((1 - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                      + CAST(0.85 AS DOUBLE) * sum(r.r / d.deg), 7) AS r
                FROM edges e JOIN r${i - 1} r ON r.node = e.src
                JOIN deg d ON d.src = e.src GROUP BY e.dst)"""
    }.mkString(",\n              ")
    s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                UNION SELECT dst AS src, src AS dst FROM e0),
              deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
              nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
              r0 AS (SELECT src AS node,
                round(CAST(1 AS DOUBLE) / (SELECT n FROM nn), 7) AS r FROM deg),
              $iters
              SELECT node, r AS rank FROM r8 ORDER BY node"""
  }

  /** One log-hist-sketch median block as DuckDB CTEs (subBits = 4, the
    * q_quantile_sketch replay verbatim): buckets `src`(g, `vc`) and emits
    * `out`(g, `outCol`) = the 6-dp bucket-midpoint disc-median estimate.
    */
  private def logHistMedianCtes(
      src: String, vc: String, out: String, outCol: String): String =
    s"""b_$out AS (SELECT g,
                  CAST(CASE WHEN c <= 0 THEN -1
                    ELSE length(bin(c)) - 1 END AS INT) AS bhi,
                  CASE WHEN c <= 0 THEN CAST(0 AS BIGINT)
                    ELSE c >> greatest(length(bin(c)) - 1 - 4, 0) END AS blo
                FROM (SELECT g, CAST(floor($vc * 100 + 0.5) AS BIGINT) AS c
                  FROM $src)),
              sk_$out AS (SELECT g, bhi, blo, count(*) AS ct
                FROM b_$out GROUP BY 1, 2, 3),
              cum_$out AS (SELECT g, bhi, blo, ct,
                  sum(ct) OVER (PARTITION BY g ORDER BY bhi, blo
                    ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(ct) OVER (PARTITION BY g) AS n
                FROM sk_$out),
              $out AS MATERIALIZED (SELECT g,
                  CASE WHEN bhi = -1 THEN 0.0 ELSE
                    round((blo * 2 * (CAST(1 AS BIGINT) << greatest(bhi - 4, 0))
                      + (CAST(1 AS BIGINT) << greatest(bhi - 4, 0)) - 1)
                      / 2.0 / 100.0, 6) END AS $outCol
                FROM cum_$out
                WHERE cum >= greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)
                  AND cum - ct < greatest(CAST(ceil(0.5 * n) AS BIGINT), 1))"""

  /** The sketch-anchored MAD chain shared by q_outlier_mad_approx and its
    * audit: vals → sketch median (me.m) → deviations dm(g, x, d) →
    * deviation-sketch MAD (ma.mad).
    */
  private lazy val madSketchCtes: String =
    s"""vals AS MATERIALIZED (SELECT l_returnflag AS g,
                  CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
              ${logHistMedianCtes("vals", "x", "me", "m")},
              dm AS MATERIALIZED (SELECT vals.g, vals.x,
                  abs(vals.x - me.m) AS d
                FROM vals JOIN me ON me.g = vals.g),
              ${logHistMedianCtes("dm", "d", "ma", "mad")}"""

  private def minhashOracleSql(numHashes: Int, threshold: Double): String =
    s"""WITH ${minhashPairCtes(numHashes, threshold)}
              SELECT id_a, id_b, jaccard FROM mh_pairs ORDER BY id_a, id_b"""

  /** Oracle for the fuzzy cluster entries: the portable minhash pairs fed
    * through a recursive-CTE transitive closure with min-label reduction,
    * singletons joined back as their own component (mirrors
    * Dedup.fuzzyDedupClusters' left-join + coalesce).
    */
  private def minhashClustersOracleSql(numHashes: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairCtes(numHashes, threshold)},
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM mh_pairs
                UNION SELECT id_b, id_a FROM mh_pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node)
              SELECT d.id AS id, coalesce(c.component, d.id) AS component,
                d.id = coalesce(c.component, d.id) AS keep
              FROM (SELECT CAST(doc_id AS BIGINT) AS id FROM documents) d
              LEFT JOIN comp c ON c.id = d.id
              ORDER BY component, d.id"""

  /** Same clustering, weights = 1/|component| on the 6-dp grid — the
    * [[graft.operators.Dedup.clusterWeights]] soft-dedup policy.
    */
  private def minhashClusterWeightsOracleSql(
      numHashes: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairCtes(numHashes, threshold)},
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM mh_pairs
                UNION SELECT id_b, id_a FROM mh_pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node),
              cl AS (SELECT d.id AS id, coalesce(c.component, d.id) AS component
                FROM (SELECT CAST(doc_id AS BIGINT) AS id FROM documents) d
                LEFT JOIN comp c ON c.id = d.id),
              sz AS (SELECT component, count(*) AS cluster_size
                FROM cl GROUP BY component)
              SELECT cl.id, cl.component, sz.cluster_size,
                round(1.0 / sz.cluster_size, 6) AS weight
              FROM cl JOIN sz USING (component)
              ORDER BY component, id"""

  /** Same clustering, keeper = per-component argmax (token count, id-min
    * tiebreak) — the [[graft.operators.Dedup.keepBest]] policy replayed
    * verbatim.
    */
  private def minhashKeepBestOracleSql(numHashes: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashPairCtes(numHashes, threshold)},
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM mh_pairs
                UNION SELECT id_b, id_a FROM mh_pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node),
              cl AS (SELECT d.id AS id, coalesce(c.component, d.id) AS component
                FROM (SELECT CAST(doc_id AS BIGINT) AS id FROM documents) d
                LEFT JOIN comp c ON c.id = d.id),
              ql AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  len(string_split_regex(trim(text), '\\s+')) AS q
                FROM documents),
              kp AS (SELECT component, id AS keeper FROM (
                  SELECT cl.component, cl.id, row_number() OVER (
                    PARTITION BY cl.component ORDER BY ql.q DESC, cl.id ASC) AS rn
                  FROM cl JOIN ql USING (id)) WHERE rn = 1)
              SELECT cl.id, cl.component, (cl.id = kp.keeper) AS keep
              FROM cl JOIN kp USING (component)
              ORDER BY component, id"""

  /** Oracle for the k-means IVF entry: Lloyd's unrolled as `iters` chained
    * CTE blocks. Replayable because every cross-engine float boundary is
    * pinned — init = portable-hash sample (same as ivfAssign), assignment
    * = rounded-cosine argmax with cid tie-break (Similarity.assignExpr),
    * and each round's means round to 7 dp before becoming the next
    * round's centroids (see kmeansCentroids scaladoc).
    */
  /** @param trainPred SQL predicate (over alias-free `emb` columns)
    *   selecting the k-means TRAINING slice; `corpusPred` selects the
    *   queryable corpus. Equal by default (the classic trained-index
    *   entry); the incremental entry trains on the base slice only and
    *   serves base + new batch through the unchanged centroids.
    */
  private def ivfKmeansOracleSql(
      k: Int, iters: Int, nProbe: Int, topK: Int, dim: Int,
      trainPred: String = "id <> 0", corpusPred: String = "id <> 0"): String = {
    val hash = graft.operators.PortableHash.duckSql("CAST(id AS VARCHAR)")
    def assign(name: String, cents: String, src: String) =
      s"""$name AS (SELECT id, cid FROM (
                  SELECT r.id, c.cid, row_number() OVER (PARTITION BY r.id
                    ORDER BY COALESCE(round(list_cosine_similarity(r.e, c.ce), 6),
                      -2.0) DESC, c.cid DESC) AS rn
                  FROM $src r, $cents c) WHERE rn = 1)"""
    val iterCtes = (1 to iters).map { n =>
      s"""${assign(s"a$n", s"c${n - 1}", "train")},
              m$n AS (SELECT a.cid, i.i AS pos, round(avg(r.e[i.i]), 7) AS m
                FROM a$n a, train r, (SELECT unnest(range(1, ${dim + 1})) AS i) i
                WHERE r.id = a.id GROUP BY a.cid, i.i),
              c$n AS (SELECT p.cid, COALESCE(nm.ml, p.ce) AS ce FROM c${n - 1} p
                LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS ml
                  FROM m$n GROUP BY cid) nm USING (cid))"""
    }.mkString(",\n              ")
    s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              train AS (SELECT * FROM emb WHERE $trainPred),
              rest AS (SELECT * FROM emb WHERE $corpusPred),
              c0 AS (SELECT CAST(row_number() OVER (ORDER BY h, id) - 1 AS BIGINT)
                  AS cid, ce FROM (
                  SELECT id, e AS ce, $hash AS h FROM train ORDER BY h, id LIMIT $k)),
              $iterCtes,
              ${assign("af", s"c$iters", "rest")},
              probes AS (SELECT cid FROM (
                  SELECT cid, round(list_cosine_similarity(ce,
                    (SELECT e FROM emb WHERE id = 0)), 6) AS sim
                  FROM c$iters) ORDER BY sim DESC, cid LIMIT $nProbe)
              SELECT id AS vec_id,
                round(list_cosine_similarity(r.e,
                  (SELECT e FROM emb WHERE id = 0)), 4) AS sim
              FROM rest r JOIN af USING (id)
              WHERE af.cid IN (SELECT cid FROM probes)
              ORDER BY sim DESC, vec_id LIMIT $topK"""
  }

  /** DuckDB replay of [[graft.operators.Scrub.scrubReport]] over `srcSql`
    * (any SELECT producing (source, text)). Regexes and placeholders are
    * SPLICED FROM THE PATTERN LIST ITSELF — the oracle cannot drift from
    * the Spark implementation when [[graft.operators.Scrub.PiiDefaults]]
    * changes. Counts replay via regexp_extract_all on the original text,
    * the redaction as the same declaration-order regexp_replace chain,
    * and the certificate hash as the portable60 fold of the scrubbed
    * text (mod 2^61−1 in DECIMAL(38,0), matching the Spark side).
    */
  private def scrubReportSql(
      srcSql: String, patterns: Seq[graft.operators.Scrub.ScrubPattern]): String = {
    val m = graft.operators.RankEval.FingerprintMod
    val counts = patterns.map(p =>
      s"len(regexp_extract_all(text, '${p.regex}')) AS h_${p.name}")
      .mkString(", ")
    val scrub = patterns.foldLeft("text") { case (acc, p) =>
      s"regexp_replace($acc, '${p.regex}', '${p.placeholder}', 'g')" }
    val hitSums = patterns.map(p =>
      s"CAST(sum(h_${p.name}) AS BIGINT) AS hits_${p.name}").mkString(", ")
    val anyHit = patterns.map(p => s"h_${p.name} > 0").mkString(" OR ")
    s"""WITH src AS ($srcSql),
            r AS (SELECT source, $counts, $scrub AS scrubbed FROM src)
          SELECT source AS grp, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN $anyHit THEN 1 ELSE 0 END) AS BIGINT)
              AS docs_affected,
            $hitSums,
            CAST(CAST(sum(${graft.operators.PortableHash.duckSql(
              "scrubbed")} % $m) AS DECIMAL(38,0)) % $m AS BIGINT)
              AS scrubbed_hash_sum
          FROM r GROUP BY source ORDER BY grp"""
  }

  // ---------------------------------------------------------------- scans,
  // filters, projections (reference SURVEY.md §2b)

  private val relational: Seq[Q] = Seq(
    Q("q_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              sum(l_quantity) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    Q("q_filter_project",
      // (l_orderkey, l_linenumber) is not unique in the synthetic data;
      // order by the full output row for engine-independent determinism
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem
              WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""")),

    Q("q_filter_compound",
      (s, dir) => t(s, dir, "lineitem")
        .filter((col("l_discount") > 0.05 || col("l_tax") < 0.03) && !(col("l_returnflag") === "R"))
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus, count(*) AS n FROM lineitem
              WHERE (l_discount > 0.05 OR l_tax < 0.03) AND NOT (l_returnflag = 'R')
              GROUP BY l_linestatus ORDER BY l_linestatus""")),

    Q("q_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------ profiling
    // (reference cells 9/12/16/21: one-pass conditional aggregates)

    Q("q_profile_negatives",
      (s, dir) => Profiling.negativeCounts(t(s, dir, "customer"), Seq("c_acctbal")),
      Some("""SELECT CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS neg_c_acctbal FROM customer""")),

    Q("q_profile_nulls",
      (s, dir) => Profiling.nullCounts(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_shipdate", "l_returnflag")),
      Some("""SELECT count(CASE WHEN l_quantity IS NULL THEN 1 END) AS null_l_quantity,
              count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS null_l_shipdate,
              count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS null_l_returnflag
              FROM lineitem""")),

    Q("q_profile_distinct",
      (s, dir) => Profiling.distinctCounts(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus", "l_orderkey", "l_quantity", "l_suppkey")),
      Some("""SELECT count(DISTINCT l_returnflag) AS dist_l_returnflag,
              count(DISTINCT l_linestatus) AS dist_l_linestatus,
              count(DISTINCT l_orderkey) AS dist_l_orderkey,
              count(DISTINCT l_quantity) AS dist_l_quantity,
              count(DISTINCT l_suppkey) AS dist_l_suppkey
              FROM lineitem""")),

    Q("q_summary_stats",
      (s, dir) => Profiling.summaryStats(t(s, dir, "lineitem"), "l_extendedprice"),
      Some("""SELECT count(l_extendedprice) AS count,
              round(avg(l_extendedprice), 4) AS mean,
              round(stddev(l_extendedprice), 4) AS stddev,
              min(l_extendedprice) AS min, max(l_extendedprice) AS max
              FROM lineitem""")),

    // multi-column describe() in ONE aggregation pass (reference cells
    // 6/27/44/94 profile several columns per call)
    Q("q_summary_multi",
      (s, dir) => Profiling.summaryStatsMulti(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .withColumn("mean", round(col("mean"), 4))
        .withColumn("stddev", round(col("stddev"), 4))
        .orderBy("col_name"),
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name, count($c) AS n,
              round(avg($c), 4) AS mean, round(stddev($c), 4) AS stddev,
              CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max
              FROM lineitem"""
        Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
      }),

    Q("q_percentiles",
      (s, dir) => Profiling.percentiles(t(s, dir, "lineitem"), "l_extendedprice",
        Seq(0.5, 0.9, 0.999)),
      Some("""SELECT round(quantile_cont(l_extendedprice, 0.5), 2) AS p500,
              round(quantile_cont(l_extendedprice, 0.9), 2) AS p900,
              round(quantile_cont(l_extendedprice, 0.999), 2) AS p999
              FROM lineitem""")),

    // robust grouped outlier profile: median/MAD anchors (exact grouped
    // percentiles — two shuffles, the honest floor for non-algebraic
    // medians), flag fence compared on the 6 dp grid
    Q("q_outlier_mad",
      (s, dir) => Profiling.madOutliers(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag"),
      Some("""WITH v AS (SELECT l_returnflag AS g,
                     CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
              m AS (SELECT g, quantile_cont(x, 0.5) AS median FROM v GROUP BY g),
              s AS (SELECT v.g, quantile_cont(abs(v.x - m.median), 0.5) AS mad,
                      any_value(m.median) AS median, count(*) AS n
                    FROM v JOIN m ON m.g = v.g GROUP BY v.g)
              SELECT v.g AS l_returnflag, any_value(s.n) AS n,
                round(any_value(s.median), 4) AS median,
                round(any_value(s.mad), 4) AS mad,
                CAST(sum(CASE WHEN round(abs(v.x - s.median), 6) >
                  round(3 * s.mad, 6) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              FROM v JOIN s ON s.g = v.g GROUP BY v.g ORDER BY v.g""")),

    // sketch-anchored MAD profile — the SCALE PATH for q_outlier_mad
    // (whose exact grouped percentiles are a measured 23.5 s full-sort
    // wall at ×1000): median/MAD anchors come from the log-histogram
    // quantile sketch (bounded bucket tables, three scans, no sort).
    // Anchors are deterministic, so the oracle replays every bucket and
    // the flag counts exactly — unlike approx_percentile there is no
    // engine-specific sketch to excuse
    Q("q_outlier_mad_approx",
      (s, dir) => Profiling.madOutliersSketch(
          t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag"),
      Some(s"""WITH $madSketchCtes
              SELECT dm.g AS l_returnflag, count(*) AS n,
                round(any_value(me.m), 4) AS median_est,
                round(any_value(ma.mad), 4) AS mad_est,
                CAST(sum(CASE WHEN round(dm.d, 6) >
                  round(3 * ma.mad, 6) THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_outliers
              FROM dm JOIN me ON me.g = dm.g JOIN ma ON ma.g = dm.g
              GROUP BY dm.g ORDER BY dm.g""")),

    // the error-bound audit for the entry above (the q_quantile_sketch
    // convention): exact disc-quantile anchors come from sketch-guided
    // selection (sorts only the winning buckets — scale-safe), and both
    // sketch anchors must sit within the published 2^-5 relative bound
    Q("q_outlier_mad_audit",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val vals = li.select(col("l_returnflag"),
          col("l_extendedprice").cast("double").as("x"))
        val prof = Profiling.madOutliersSketch(li, "l_returnflag", "l_extendedprice")
        val exMed = graft.operators.Sketches.exactQuantilesViaSketch(
            vals, col("x"), Seq("l_returnflag"), Seq(0.5), subBits = 8)
          .select(col("l_returnflag"), round(col("exact_v"), 4).as("median_exact"))
        // deviations from the SKETCH median — the same d stream the
        // profile flags on, so the MAD audit measures the MAD anchor,
        // not a different statistic
        val med = graft.operators.Sketches.logHistQuantiles(
            graft.operators.Sketches.logHistSketch(vals, col("x"), Seq("l_returnflag")),
            Seq("l_returnflag"), Seq(0.5))
          .select(col("l_returnflag"), col("est").as("m"))
        val dev = vals.join(broadcast(med), Seq("l_returnflag"))
          .withColumn("d", abs(col("x") - col("m")))
        val exMad = graft.operators.Sketches.exactQuantilesViaSketch(
            dev, col("d"), Seq("l_returnflag"), Seq(0.5), subBits = 8)
          .select(col("l_returnflag"), round(col("exact_v"), 4).as("mad_exact"))
        prof.join(exMed, Seq("l_returnflag")).join(exMad, Seq("l_returnflag"))
          .select(col("l_returnflag"), col("median_est"), col("mad_est"),
            col("median_exact"), col("mad_exact"),
            (round(abs(col("median_est") - col("median_exact"))
              / col("median_exact"), 6) <= 0.0315).as("median_within_bound"),
            (round(abs(col("mad_est") - col("mad_exact"))
              / col("mad_exact"), 6) <= 0.0315).as("mad_within_bound"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH $madSketchCtes,
              rkm AS (SELECT g, v,
                  row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                  count(*) OVER (PARTITION BY g) AS n
                FROM (SELECT g, x AS v FROM vals)),
              exm AS (SELECT g, round(v, 4) AS median_exact FROM rkm
                WHERE rn = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1)),
              rkd AS (SELECT g, v,
                  row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                  count(*) OVER (PARTITION BY g) AS n
                FROM (SELECT g, d AS v FROM dm)),
              exd AS (SELECT g, round(v, 4) AS mad_exact FROM rkd
                WHERE rn = greatest(CAST(ceil(0.5 * n) AS BIGINT), 1))
              SELECT me.g AS l_returnflag,
                round(me.m, 4) AS median_est, round(ma.mad, 4) AS mad_est,
                exm.median_exact, exd.mad_exact,
                round(abs(round(me.m, 4) - exm.median_exact)
                  / exm.median_exact, 6) <= 0.0315 AS median_within_bound,
                round(abs(round(ma.mad, 4) - exd.mad_exact)
                  / exd.mad_exact, 6) <= 0.0315 AS mad_within_bound
              FROM me JOIN ma ON ma.g = me.g
              JOIN exm ON exm.g = me.g JOIN exd ON exd.g = me.g
              ORDER BY me.g""")),

    // Poisson bootstrap confidence interval — THE distributed bootstrap
    // (per-row independent Poisson(1) weights instead of multinomial
    // resampling, so no replica ever needs a global pass): B = 100
    // replicas ride one exploded scan as (replica, Σwx, Σw) partial
    // aggregates — resamples are never materialized. Weights come from a
    // portable-hash uniform through the literal Poisson(1) inverse CDF
    // (truncated at 6, tail mass 6e-5 — deterministic and replayed
    // verbatim), so an independent engine re-derives every weight.
    // Replica means round to 6 dp BEFORE the percentile so both engines
    // interpolate identical inputs. Long→double for the uniform loses
    // bits below 2^53 identically on both engines (IEEE round-to-nearest
    // then an exact power-of-two divide).
    // Cost shape: ONE portable hash per ROW (not per row×replica — the
    // first cut hashed every exploded pair and cost 51 s at sf0.1; the
    // affine family over the row hash is pure long arithmetic, the same
    // trick minhash uses for its 64 hash functions), then B cheap
    // affine draws per row through the literal (a_b, c_b) constants.
    Q("q_bootstrap_ci",
      (s, dir) => {
        val b = 100
        val bigP = 2147483647L
        val params = graft.operators.Dedup.affineParams(b)
        val aArr = array(params.map(p => lit(p._1)): _*)
        val cArr = array(params.map(p => lit(p._2)): _*)
        val li = t(s, dir, "lineitem").select(
          pmod(graft.operators.PortableHash.portable60(
            concat_ws(":", col("l_orderkey"), col("l_linenumber"))), lit(bigP))
            .as("h"),
          col("l_quantity").cast("double").as("x"))
        val u = pmod(element_at(aArr, col("b") + 1) * col("h") +
          element_at(cArr, col("b") + 1), lit(bigP)) / lit(bigP.toDouble)
        val w = when(u < 0.36788, 0).when(u < 0.73576, 1)
          .when(u < 0.91970, 2).when(u < 0.98101, 3)
          .when(u < 0.99634, 4).when(u < 0.99941, 5).otherwise(6)
        val reps = li
          .select(col("h"), col("x"),
            explode(sequence(lit(0), lit(b - 1))).as("b"))
          .withColumn("w", w)
          .groupBy("b")
          .agg((sum(col("w") * col("x")) / sum(col("w"))).as("m0"))
          .select(round(col("m0"), 6).as("m"))
        li.agg(count(lit(1)).as("n"), round(avg("x"), 4).as("mean"))
          .crossJoin(reps.agg(
            count(lit(1)).as("n_replicas"),
            round(expr("percentile(m, 0.025)"), 4).as("ci_lo"),
            round(expr("percentile(m, 0.975)"), 4).as("ci_hi")))
      },
      Some {
        val fam = graft.operators.Dedup.affineParams(100).zipWithIndex
          .map { case ((a, c), i) => s"($i, $a, $c)" }
          .grouped(6).map(_.mkString(", ")).mkString(",\n                  ")
        s"""WITH li AS (SELECT
                  CAST(('0x' || substr(md5(
                    CAST(l_orderkey AS VARCHAR) || ':' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 2147483647 AS h,
                  CAST(l_quantity AS DOUBLE) AS x FROM lineitem),
              par(b, a, c) AS (VALUES
                  $fam),
              wt AS (SELECT x,
                  CASE WHEN u < 0.36788 THEN 0 WHEN u < 0.73576 THEN 1
                       WHEN u < 0.91970 THEN 2 WHEN u < 0.98101 THEN 3
                       WHEN u < 0.99634 THEN 4 WHEN u < 0.99941 THEN 5
                       ELSE 6 END AS w, b
                FROM (SELECT x, b,
                    ((a * h + c) % 2147483647) / 2147483647.0 AS u
                  FROM li, par)),
              reps AS (SELECT round(sum(w * x) / sum(w), 6) AS m
                FROM wt GROUP BY b)
              SELECT (SELECT count(*) FROM li) AS n,
                (SELECT round(avg(x), 4) FROM li) AS mean,
                count(*) AS n_replicas,
                round(quantile_cont(m, 0.025), 4) AS ci_lo,
                round(quantile_cont(m, 0.975), 4) AS ci_hi
              FROM reps"""
      }),

    // winsorization — the clip-at-percentile robust-preprocessing op (the
    // REPAIR complement of the MAD outlier PROBE above): per-group p01/p99
    // fences (exact interpolated percentiles, same quantile_cont contract
    // as q_percentiles), values clipped INTO the fences, and the effect
    // reported as clip counts + raw-vs-winsorized means. Two shuffles
    // (the exact-percentile floor) + one broadcast of the per-group
    // fence table back onto the scan; percentile_approx swaps in at
    // 100 TB exactly as documented for the MAD entry.
    Q("q_winsorize",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("x"))
        val fences = li.groupBy("g").agg(
          expr("percentile(x, 0.01)").as("p01"),
          expr("percentile(x, 0.99)").as("p99"))
        li.join(broadcast(fences), Seq("g"))
          .withColumn("cx",
            when(col("x") < col("p01"), col("p01"))
              .when(col("x") > col("p99"), col("p99"))
              .otherwise(col("x")))
          .groupBy("g")
          .agg(count(lit(1)).as("n"),
            sum(when(col("x") < col("p01"), 1L).otherwise(0L)).as("n_low"),
            sum(when(col("x") > col("p99"), 1L).otherwise(0L)).as("n_high"),
            round(avg("x"), 2).as("avg_raw"),
            round(avg("cx"), 2).as("avg_winsorized"))
          .orderBy("g")
      },
      Some("""WITH v AS (SELECT l_returnflag AS g,
                  CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem),
              f AS (SELECT g, quantile_cont(x, 0.01) AS p01,
                      quantile_cont(x, 0.99) AS p99
                    FROM v GROUP BY g)
              SELECT v.g, count(*) AS n,
                CAST(sum(CASE WHEN v.x < f.p01 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_low,
                CAST(sum(CASE WHEN v.x > f.p99 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_high,
                round(avg(v.x), 2) AS avg_raw,
                round(avg(CASE WHEN v.x < f.p01 THEN f.p01
                               WHEN v.x > f.p99 THEN f.p99
                               ELSE v.x END), 2) AS avg_winsorized
              FROM v JOIN f USING (g) GROUP BY v.g ORDER BY v.g""")),

    // Shannon entropy per categorical column (key-quality probe): one
    // (value, count) shuffle per column, H = log2 N − Σc·log2 c / N
    Q("q_profile_entropy",
      (s, dir) => Profiling.valueEntropy(t(s, dir, "documents"), "lang")
        .unionByName(Profiling.valueEntropy(t(s, dir, "documents"), "source"))
        .unionByName(Profiling.valueEntropy(t(s, dir, "events"), "event_type"))
        .orderBy("col_name"),
      Some {
        def one(table: String, c: String) =
          s"""SELECT '$c' AS col_name, count(*) AS n_values,
              round(log2(sum(ct)) - sum(ct * log2(ct)) / sum(ct), 4)
                AS entropy_bits
              FROM (SELECT CAST(count(*) AS DOUBLE) AS ct FROM $table
                    GROUP BY $c)"""
        Seq(one("documents", "lang"), one("documents", "source"),
          one("events", "event_type"))
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
      }),

    // mutual information between two categorical columns (dependence
    // probe for composite keys): joint + marginal count tables only
    Q("q_mutual_info",
      (s, dir) => Profiling.mutualInfo(t(s, dir, "documents"), "lang", "source"),
      Some("""WITH j AS (SELECT lang AS x, source AS y,
                     CAST(count(*) AS DOUBLE) AS cxy
                   FROM documents GROUP BY 1, 2),
              ma AS (SELECT x, sum(cxy) AS cx FROM j GROUP BY 1),
              mb AS (SELECT y, sum(cxy) AS cy FROM j GROUP BY 1),
              n AS (SELECT sum(cxy) AS n FROM j)
              SELECT 'lang' AS col_a, 'source' AS col_b,
                round(sum(cxy / n.n * log2(cxy * n.n / (cx * cy))), 4) AS mi_bits
              FROM j JOIN ma USING (x) JOIN mb USING (y), n""")),

    // join-key skew report — the pre-join probe that decides plain
    // shuffle vs AQE skew split vs salting at scale
    Q("q_skew_report",
      (s, dir) => Profiling.skewReport(t(s, dir, "events"), "user_id")
        .unionByName(Profiling.skewReport(t(s, dir, "lineitem"), "l_orderkey"))
        .orderBy("key"),
      Some {
        def one(table: String, c: String) =
          s"""SELECT '$c' AS key, count(*) AS n_keys,
              CAST(max(ct) AS BIGINT) AS max_key_rows,
              round(max(ct) / sum(ct), 6) AS max_key_share,
              round(quantile_cont(ct, 0.99) / quantile_cont(ct, 0.5), 4)
                AS p99_over_p50
              FROM (SELECT CAST(count(*) AS DOUBLE) AS ct FROM $table
                    GROUP BY $c)"""
        Seq(one("events", "user_id"), one("lineitem", "l_orderkey"))
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY key")
      }),

    // approx_percentile accuracy audit (the q_approx_distinct convention:
    // the sketch value is engine-specific and never compared — the oracle
    // recomputes the exact side and the rank-error bracket must hold, so
    // any Spark-side sketch regression breaks the boolean)
    Q("q_approx_pctl_audit",
      (s, dir) => Profiling.approxPercentileAudit(t(s, dir, "lineitem"),
        "l_extendedprice", Seq(0.5, 0.9, 0.99)).orderBy("p_mille"),
      Some("""SELECT p_mille, exact_pctl, TRUE AS pctl_within_tol FROM (
                SELECT '500' AS p_mille,
                  round(quantile_cont(l_extendedprice, 0.5), 2) AS exact_pctl
                FROM lineitem
                UNION ALL SELECT '900',
                  round(quantile_cont(l_extendedprice, 0.9), 2) FROM lineitem
                UNION ALL SELECT '990',
                  round(quantile_cont(l_extendedprice, 0.99), 2) FROM lineitem)
              ORDER BY p_mille""")),

    // grouped exact percentiles (sort-based interpolating percentile per
    // group — Spark percentile() and DuckDB quantile_cont share the linear
    // interpolation definition, so values match exactly after rounding)
    Q("q_pctl_by_lang",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang")
        .agg(round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
          round(expr("percentile(n_chars, 0.95)"), 2).as("p95"))
        .orderBy("lang"),
      Some("""SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS p50,
              round(quantile_cont(n_chars, 0.95), 2) AS p95
              FROM documents GROUP BY lang ORDER BY lang""")),

    // z-score feature standardization (the scaling pass before any
    // distance-based stage): anchors rounded to 6 dp BEFORE scaling so
    // both engines scale from identical values; audit = per-column
    // post-scale moments over every row's 4-dp z
    Q("q_feature_scale",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val scaled = Profiling.standardize(t(s, dir, "lineitem"), cols)
        cols.map { c =>
          scaled.agg(
            // + 0.0 canonicalizes IEEE negative zero (both engines)
            (round(avg(col(s"${c}_z")), 3) + 0.0).as("z_mean"),
            round(expr(s"stddev_samp(${c}_z)"), 3).as("z_std"),
            (round(min(col(s"${c}_z")), 4) + 0.0).as("z_min"),
            round(max(col(s"${c}_z")), 4).as("z_max"))
            .select(lit(c).as("col_name"), col("z_mean"), col("z_std"),
              col("z_min"), col("z_max"))
        }.reduce(_ unionByName _).orderBy("col_name")
      },
      Some {
        def one(c: String) =
          s"""SELECT '$c' AS col_name,
                round(avg(z), 3) + 0.0 AS z_mean, round(stddev_samp(z), 3) AS z_std,
                round(min(z), 4) + 0.0 AS z_min, round(max(z), 4) AS z_max
              FROM (SELECT round(($c - m) / s, 4) AS z
                FROM lineitem, (SELECT round(avg($c), 6) AS m,
                  round(stddev_samp($c), 6) AS s FROM lineitem))"""
        s"""${one("l_quantity")}
            UNION ALL ${one("l_extendedprice")}
            UNION ALL ${one("l_discount")}
            ORDER BY col_name"""
      }),

    // true Z-order (Morton) curve key — the layout math behind the
    // reference's Delta ZORDER (cell 132), driver-gated on the VALUES:
    // both engines derive the min/max grids from the data and replay the
    // exact-double normalization + 16-bit interleave; the layout payoff
    // (multi-dim file skipping) is ZOrderSpec's measured assertion
    Q("q_zorder_curve",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val st = li.agg(
          min(col("l_orderkey")).cast("long"), max(col("l_orderkey")).cast("long"),
          min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long")).head()
        val z = graft.sources.Tables.zValue(
          Seq(col("l_orderkey"), col("l_partkey")),
          Seq(st.getLong(0), st.getLong(2)), Seq(st.getLong(1), st.getLong(3)))
        li.select(col("l_orderkey"), col("l_partkey"), z.as("zval"))
          .orderBy(col("zval"), col("l_orderkey"), col("l_partkey"))
          .limit(20)
      },
      Some {
        val interleave = (0 until 16).map(j =>
          s"((((s0 >> $j) & 1) << ${2 * j}) + (((s1 >> $j) & 1) << ${2 * j + 1}))")
          .mkString(" + ")
        s"""WITH st AS (SELECT
                  CAST(min(l_orderkey) AS BIGINT) AS mn0, CAST(max(l_orderkey) AS BIGINT) AS mx0,
                  CAST(min(l_partkey) AS BIGINT) AS mn1, CAST(max(l_partkey) AS BIGINT) AS mx1
                FROM lineitem),
              sc AS (SELECT l_orderkey, l_partkey,
                  least(greatest(CAST(floor(CAST(l_orderkey - mn0 AS DOUBLE) * 65535.0
                    / CAST(greatest(mx0 - mn0, 1) AS DOUBLE)) AS BIGINT), 0), 65535) AS s0,
                  least(greatest(CAST(floor(CAST(l_partkey - mn1 AS DOUBLE) * 65535.0
                    / CAST(greatest(mx1 - mn1, 1) AS DOUBLE)) AS BIGINT), 0), 65535) AS s1
                FROM lineitem, st)
              SELECT l_orderkey, l_partkey,
                CAST($interleave AS BIGINT) AS zval
              FROM sc ORDER BY zval, l_orderkey, l_partkey LIMIT 20"""
      }),

    // ---------------------------------------------------------------- joins
    // (reference SURVEY.md §2c: capability parity — broadcast dim join,
    // shuffle join, semi/anti for lookup-filter semantics)

    Q("q_join_broadcast_dims",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("customers"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, count(*) AS customers,
              round(sum(c_acctbal), 2) AS total_bal
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    Q("q_join_shuffle_revenue",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          countDistinct("o_orderkey").as("order_count"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS order_count,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // sort-merge join PINNED via hint — the third join strategy beside
    // broadcast (q_join_broadcast_dims) and shuffle-hash: merge is what a
    // planner picks when both sides are large and sorted/bucketed
    // storage can feed it exchange-free. The hint closes the strategy
    // triad so each physical path carries its own driver row; the plan
    // shape (SortMergeJoin, no BroadcastExchange on either side) is
    // asserted in PlanShapeSpec.
    Q("q_join_sortmerge",
      (s, dir) => t(s, dir, "orders").hint("merge")
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          round(avg("l_discount"), 4).as("avg_disc"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n_lines,
              round(avg(l_discount), 4) AS avg_disc
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("q_join_semi",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders)
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    Q("q_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // null-safe equality join (<=>): null keys MATCH null keys, unlike =
    // where NULL = NULL is unknown and the row vanishes — SQL 3VL parity
    // checked against DuckDB's IS NOT DISTINCT FROM
    Q("q_join_nullsafe",
      (s, dir) => {
        val cust = t(s, dir, "customer").withColumn("nk",
          when(col("c_nationkey") === 3, lit(null)).otherwise(col("c_nationkey")))
        val nat = t(s, dir, "nation").withColumn("nk2",
          when(col("n_nationkey") === 3, lit(null)).otherwise(col("n_nationkey")))
        cust.join(nat, col("nk") <=> col("nk2"))
          .groupBy("n_name").agg(count(lit(1)).as("n"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n
              FROM (SELECT CASE WHEN c_nationkey = 3 THEN NULL
                           ELSE c_nationkey END AS nk FROM customer) c
              JOIN (SELECT n_name, CASE WHEN n_nationkey = 3 THEN NULL
                           ELSE n_nationkey END AS nk2 FROM nation) n
                ON c.nk IS NOT DISTINCT FROM n.nk2
              GROUP BY n_name ORDER BY n_name""")),

    // schema-evolution union: columns matched by NAME across different
    // orders (the multi-batch ingest shape), vs DuckDB UNION ALL BY NAME
    Q("q_union_by_name",
      (s, dir) => {
        val a = t(s, dir, "region").select(col("r_regionkey").as("k"), col("r_name").as("name"))
        val b = t(s, dir, "nation").select(col("n_name").as("name"), col("n_nationkey").as("k"))
        a.unionByName(b).orderBy("k", "name")
      },
      Some("""SELECT r_regionkey AS k, r_name AS name FROM region
              UNION ALL BY NAME
              SELECT n_name AS name, n_nationkey AS k FROM nation
              ORDER BY k, name""")),

    // salted equi-join: hot fact keys spread over 8 sub-keys, dim side
    // replicated 8x — semantics must equal the plain join (the oracle IS
    // the plain join), only the shuffle distribution changes
    Q("q_join_salted",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("okey"), col("l_quantity"), col("l_extendedprice"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        // threshold 5 on a ≤7-rows-per-key fact: some keys salt, the rest
        // take the plain path — both halves of the two-path rewrite stay
        // exercised (and benched) on TPC-H-shaped data
        SkewJoin.saltedEquiJoin(li, ord, "okey",
          discriminator = col("l_extendedprice"), salts = 8, hotThreshold = 5L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
            round(sum("l_extendedprice"), 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n, sum(l_quantity) AS qty,
                     round(sum(l_extendedprice), 2) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // salted two-phase aggregation for extreme key skew: partial on
    // (key, salt), final on key — equals the direct grouped aggregate
    Q("q_agg_salted",
      (s, dir) => SkewJoin.saltedSumCount(
          t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
        .select(col("l_returnflag"), col("sum").as("sum_qty"), col("count").as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // -------------------------------------------------------------- windows
    // (reference §2e: rank over partition; plus running agg for frames)

    Q("q_window_rank_top3",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            rank().over(w).as("rnk"))
          .filter(col("rnk") <= 3)
          .orderBy("c_nationkey", "rnk", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, CAST(rnk AS INT) AS rnk FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
              rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
              FROM customer) WHERE rnk <= 3
              ORDER BY c_nationkey, rnk, c_custkey""")),

    Q("q_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(-2, Window.currentRow)
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            round(sum("value").over(w), 4).as("run_sum"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS run_sum
              FROM events ORDER BY user_id, event_id""")),

    // value-based RANGE frame (vs the ROWS frame above): all orders within
    // the last 30 days per customer — peer rows share one frame
    Q("q_window_range_frame",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
        t(s, dir, "orders")
          .withColumn("d", datediff(col("o_orderdate"), lit("1990-01-01")))
          .select(col("o_custkey"), col("d"),
            count(lit(1)).over(w).as("n_30d"))
          .orderBy("o_custkey", "d")
      },
      Some("""SELECT o_custkey, d, count(*) OVER (PARTITION BY o_custkey
                ORDER BY d RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
              FROM (SELECT o_custkey,
                      datediff('day', DATE '1990-01-01', o_orderdate) AS d
                    FROM orders)
              ORDER BY o_custkey, d""")),

    // --------------------------------------------------------- sorts, top-k
    // (reference §2f: orderBy(desc).limit → TakeOrderedAndProject)

    Q("q_topk_pairs",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_suppkey", "l_partkey")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("cnt").desc, col("l_suppkey"), col("l_partkey"))
        .limit(10),
      Some("""SELECT l_suppkey, l_partkey, count(*) AS cnt,
              round(sum(l_quantity), 2) AS qty
              FROM lineitem GROUP BY l_suppkey, l_partkey
              ORDER BY cnt DESC, l_suppkey, l_partkey LIMIT 10""")),

    Q("q_concat_route_topk",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_suppkey", "l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("route", concat_ws(" to ", col("l_suppkey"), col("l_partkey")))
        .select("route", "cnt")
        .orderBy(col("cnt").desc, col("route"))
        .limit(10),
      Some("""SELECT concat_ws(' to ', l_suppkey, l_partkey) AS route, count(*) AS cnt
              FROM lineitem GROUP BY l_suppkey, l_partkey
              ORDER BY cnt DESC, route LIMIT 10""")),

    // ----------------------------------------------- conditionals, datetime
    // (reference §2h: when/otherwise chains, hour/dayofweek/year/month)

    Q("q_case_when_slots",
      (s, dir) => t(s, dir, "events")
        .withColumn("slot",
          when(hour(col("ts")).between(0, 5), "Night")
            .when(hour(col("ts")).between(6, 11), "Morning")
            .when(hour(col("ts")).between(12, 16), "Afternoon")
            .when(hour(col("ts")).between(17, 20), "Evening")
            .otherwise("LateNight"))
        .groupBy("slot")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
        .orderBy("slot"),
      Some("""SELECT CASE
                WHEN hour(ts) BETWEEN 0 AND 5 THEN 'Night'
                WHEN hour(ts) BETWEEN 6 AND 11 THEN 'Morning'
                WHEN hour(ts) BETWEEN 12 AND 16 THEN 'Afternoon'
                WHEN hour(ts) BETWEEN 17 AND 20 THEN 'Evening'
                ELSE 'LateNight' END AS slot,
              count(*) AS n, round(avg(value), 4) AS avg_value
              FROM events GROUP BY 1 ORDER BY slot""")),

    Q("q_date_parts",
      (s, dir) => t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("y", "m"),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS y,
              CAST(month(o_orderdate) AS INT) AS m,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
              FROM orders GROUP BY 1, 2 ORDER BY y, m""")),

    Q("q_dayofweek",
      (s, dir) => t(s, dir, "orders")
        .groupBy(dayofweek(col("o_orderdate")).as("dow"))
        .agg(count(lit(1)).as("n"))
        .orderBy("dow"),
      // Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6 → +1
      Some("""SELECT CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow, count(*) AS n
              FROM orders GROUP BY 1 ORDER BY dow""")),

    Q("q_agg_multimetric",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              round(avg(l_extendedprice), 2) AS avg_price, count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q_corr_grouped",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 4)
              AS corr_qty_price FROM lineitem
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("q_set_union",
      (s, dir) => t(s, dir, "nation").select(col("n_name").as("name"))
        .union(t(s, dir, "region").select(col("r_name").as("name")))
        .distinct()
        .orderBy("name"),
      Some("""SELECT n_name AS name FROM nation
              UNION SELECT r_name FROM region ORDER BY name""")),

    // 3VL drop-semantics (the reference's load-bearing quirk, SURVEY.md §2l
    // step 7): a NULL CASE branch makes the band predicate NULL → row drops.
    Q("q_fare_band_3vl",
      (s, dir) => {
        val expected = when(col("l_returnflag") === "A",
            greatest(col("l_quantity") * 400.0, col("l_extendedprice") * 0.3))
          .when(col("l_returnflag") === "R", lit(20000.0))
        t(s, dir, "lineitem")
          .withColumn("expected", expected)
          .filter(!(col("l_extendedprice") > col("expected") * 2.0 ||
            col("l_extendedprice") < col("expected") * 0.5))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("kept"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS kept FROM (
                SELECT l_returnflag, l_extendedprice,
                CASE WHEN l_returnflag = 'A'
                       THEN greatest(l_quantity * 400.0, l_extendedprice * 0.3)
                     WHEN l_returnflag = 'R' THEN 20000.0 END AS expected
                FROM lineitem)
              WHERE NOT (l_extendedprice > expected * 2.0
                      OR l_extendedprice < expected * 0.5)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // sign-fix when-chain (reference cell 55 shape)
    Q("q_sign_fix_agg",
      (s, dir) => t(s, dir, "customer")
        .withColumn("bal_fixed",
          when(col("c_acctbal") < 0 && col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"),
            -col("c_acctbal")).otherwise(col("c_acctbal")))
        .groupBy("c_mktsegment")
        .agg(round(sum("bal_fixed"), 2).as("total_bal"), count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, round(sum(CASE
                WHEN c_acctbal < 0 AND c_mktsegment IN ('AUTOMOBILE','BUILDING')
                THEN -c_acctbal ELSE c_acctbal END), 2) AS total_bal,
              count(*) AS n FROM customer
              GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )

  // ------------------------------------------------- extended relational II
  // (window variants, multi-dim aggs, set ops, string funcs, pivot,
  //  limit/offset, as-of join, batch sessionization)

  private val relational2: Seq[Q] = Seq(
    Q("q_window_funcs",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            row_number().over(w).as("rn"),
            dense_rank().over(w).as("drnk"),
            lag("c_acctbal", 1).over(w).as("prev_bal"),
            lead("c_acctbal", 1).over(w).as("next_bal"))
          .filter(col("rn") <= 5)
          .orderBy("c_nationkey", "rn")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INT) AS rn,
              CAST(drnk AS INT) AS drnk, prev_bal, next_bal FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER w AS rn, dense_rank() OVER w AS drnk,
                lag(c_acctbal, 1) OVER w AS prev_bal,
                lead(c_acctbal, 1) OVER w AS next_bal
                FROM customer
                WINDOW w AS (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey))
              WHERE rn <= 5 ORDER BY c_nationkey, rn""")),

    Q("q_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
              count(*) AS n FROM lineitem
              GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // explicit GROUPING SETS with grouping() markers (the general form
    // rollup/cube specialize; via SQL text — the DSL path is exercised by
    // q_rollup/q_cube, and GROUPING SETS is SQL-first in both engines)
    Q("q_grouping_sets",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
        s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                 round(sum(l_quantity), 2) AS qty,
                 CAST(grouping(l_returnflag) AS INT) AS g_rf,
                 CAST(grouping(l_linestatus) AS INT) AS g_ls
                 FROM li_gs
                 GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                   (l_returnflag), ())
                 ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""")
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              round(sum(l_quantity), 2) AS qty,
              CAST(grouping(l_returnflag) AS INT) AS g_rf,
              CAST(grouping(l_linestatus) AS INT) AS g_ls
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                (l_returnflag), ())
              ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
                l_linestatus NULLS FIRST""")),

    // distribution-window family (complements q_window_funcs' ranking
    // family): ntile bucketing, percent_rank, cume_dist — the quantile-
    // assignment shapes a training-mixture pipeline uses for per-group
    // banding; filter applied AFTER the window so ranks see full groups
    Q("q_window_dist",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            ntile(4).over(w).as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"))
          .filter(col("c_custkey") % 7 === 0)
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, CAST(quartile AS INT) AS quartile,
              pr, cd FROM (
                SELECT c_nationkey, c_custkey,
                ntile(4) OVER w AS quartile,
                round(percent_rank() OVER w, 4) AS pr,
                round(cume_dist() OVER w, 4) AS cd
                FROM customer
                WINDOW w AS (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey))
              WHERE c_custkey % 7 = 0
              ORDER BY c_nationkey, c_custkey""")),

    Q("q_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_extendedprice"), 2).as("total"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              round(sum(l_extendedprice), 2) AS total, count(*) AS n
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    Q("q_intersect",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_nationkey AS k FROM customer
              INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""")),

    Q("q_except",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy("k"),
      Some("""SELECT c_nationkey AS k FROM customer
              EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""")),

    Q("q_string_funcs",
      (s, dir) => t(s, dir, "part")
        .filter(col("p_partkey") <= 50)
        .select(col("p_partkey"),
          upper(col("p_type")).as("type_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          regexp_replace(col("p_brand"), "Brand#", "B").as("brand_s"),
          col("p_name").like("%red%").as("has_red"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_type) AS type_u,
              substring(p_name, 1, 5) AS name5,
              replace(p_brand, 'Brand#', 'B') AS brand_s,
              p_name LIKE '%red%' AS has_red,
              coalesce(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word
              FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""")),

    // coalesce the pivot cells: Spark yields NULL for an empty
    // (returnflag, linestatus) combo where the oracle's count(CASE) is 0
    Q("q_pivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
              count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
              count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // unpivot/melt — pivot's inverse (Dataset.unpivot, Spark 3.4+): a
    // wide per-group metric row melted to (group, metric, value) long
    // form, the reshape every metrics sink wants. Narrow op after the
    // aggregation: row count multiplies by the melted column count, no
    // extra shuffle.
    Q("q_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("price"),
          round(sum("l_discount"), 2).as("disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("price"), col("disc")), "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some("""WITH agg AS (SELECT l_returnflag,
                  round(sum(l_quantity), 2) AS qty,
                  round(sum(l_extendedprice), 2) AS price,
                  round(sum(l_discount), 2) AS disc
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_returnflag, metric, value
              FROM (UNPIVOT agg ON qty, price, disc
                    INTO NAME metric VALUE value)
              ORDER BY l_returnflag, metric""")),

    // list aggregation: sorted-distinct collect rendered to a csv string so
    // the value compares bytewise across engines (list encodings differ)
    Q("q_list_agg",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang")
        .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          count(lit(1)).as("n"))
        .orderBy("lang"),
      Some("""SELECT lang,
                string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
                count(*) AS n
              FROM documents GROUP BY lang ORDER BY lang""")),

    Q("q_token_freq",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20),
      Some("""SELECT tok, count(*) AS n FROM (
                SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
              WHERE tok <> '' GROUP BY tok ORDER BY n DESC, tok LIMIT 20""")),

    Q("q_limit_offset",
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by enough columns to make the offset window deterministic
      (s, dir) => t(s, dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .offset(5).limit(5),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
              LIMIT 5 OFFSET 5""")),

    // As-of join composed from union + running max over a window (Spark has
    // no native as-of): each click matched to the latest purchase second
    // ≤ its own, per user. Oracle uses DuckDB's native ASOF JOIN — two
    // completely different implementations, same semantics. Timestamps are
    // second-truncated in both engines (the raw column is nanos).
    Q("q_asof_join",
      (s, dir) => asOfClickPurchase(s, dir)
        .select(col("event_id"), col("purchase_sec"))
        .orderBy("event_id"),
      Some("""WITH clicks AS (
                SELECT event_id, user_id, date_trunc('second', ts) AS sec
                FROM events WHERE event_type = 'click'),
              purch AS (
                SELECT DISTINCT user_id, date_trunc('second', ts) AS sec
                FROM events WHERE event_type = 'purchase')
              SELECT c.event_id, p.sec AS purchase_sec
              FROM clicks c ASOF LEFT JOIN purch p
                ON c.user_id = p.user_id AND p.sec <= c.sec
              ORDER BY c.event_id""")),

    // as-of with a tolerance horizon (inner flavor): a click matches only
    // if the latest preceding purchase happened within 10 minutes — the
    // time-series engine's `asof ... tolerance` knob, composed from the
    // same single-shuffle union+window plan plus one filter
    Q("q_asof_tolerance",
      (s, dir) => asOfClickPurchase(s, dir)
        .filter(unix_timestamp(col("sec")) - unix_timestamp(col("purchase_sec")) <= 600)
        .select(col("event_id"), col("purchase_sec"))
        .orderBy("event_id"),
      Some("""WITH clicks AS (
                SELECT event_id, user_id, date_trunc('second', ts) AS sec
                FROM events WHERE event_type = 'click'),
              purch AS (
                SELECT DISTINCT user_id, date_trunc('second', ts) AS sec
                FROM events WHERE event_type = 'purchase')
              SELECT c.event_id, p.sec AS purchase_sec
              FROM clicks c ASOF JOIN purch p
                ON c.user_id = p.user_id AND p.sec <= c.sec
              WHERE epoch(c.sec) - epoch(p.sec) <= 600
              ORDER BY c.event_id""")),

    // Range join composed as bucket + equi-join + band filter (Spark has no
    // native range join; the naive inequality join is a nested loop).
    // Oracle uses DuckDB's native inequality (IE) join — different
    // algorithm, same semantics: lineitems shipped within 90 days of each
    // order's date.
    Q("q_range_join",
      (s, dir) => {
        // interval side must be selective: every order's 90-day window
        // would make the TRUE result itself quadratic (~324M pairs at
        // sf0.1) — the high-value filter keeps the demo linear-sized
        val li = t(s, dir, "lineitem")
          .select(col("l_shipdate"), datediff(col("l_shipdate"), lit("1970-01-01")).as("ship_day"))
        val ord = t(s, dir, "orders")
          .filter(col("o_totalprice") > 499000)
          .select(col("o_orderpriority"),
            datediff(col("o_orderdate"), lit("1970-01-01")).as("start_day"))
          .withColumn("end_day", col("start_day") + 90)
        graft.operators.RangeJoin.intervalJoin(
            li, col("ship_day"), ord, col("start_day"), col("end_day"), bucketSize = 7)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n
              FROM orders JOIN lineitem
                ON l_shipdate >= o_orderdate
               AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
              WHERE o_totalprice > 499000
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // The scale mitigation for interval-join aggregates over a FIXED time
    // domain (BENCH_SF10.md note 3): q_range_join's TRUE output grows
    // quadratically at x100 because both sides grow over the same
    // calendar window (100x orders x 100x lineitems per day). When the
    // downstream consumer is an aggregate, pre-aggregate the point side
    // to per-day counts FIRST: the interval join then runs against a
    // constant-size day table (the date domain, ~2.5k rows, at ANY corpus
    // scale), the quadratic collapses into one map-side-combined groupBy,
    // and the weighted rollup reproduces the pair counts exactly — same
    // result, same oracle, join work linear in the interval side only.
    Q("q_range_join_bucketed",
      (s, dir) => {
        val dayCounts = t(s, dir, "lineitem")
          .select(datediff(col("l_shipdate"), lit("1970-01-01")).as("ship_day"))
          .groupBy("ship_day").agg(count(lit(1)).as("day_n"))
        val ord = t(s, dir, "orders")
          .filter(col("o_totalprice") > 499000)
          .select(col("o_orderpriority"),
            datediff(col("o_orderdate"), lit("1970-01-01")).as("start_day"))
          .withColumn("end_day", col("start_day") + 90)
        graft.operators.RangeJoin.intervalJoin(
            dayCounts, col("ship_day"), ord, col("start_day"), col("end_day"),
            bucketSize = 7)
          .groupBy("o_orderpriority")
          .agg(sum("day_n").as("n"))
          .orderBy("o_orderpriority")
      },
      // the rewrite is result-identical, so the oracle is q_range_join's
      // verbatim — the independent engine computing the UN-aggregated
      // pair count is itself the equivalence proof
      Some("""SELECT o_orderpriority, count(*) AS n
              FROM orders JOIN lineitem
                ON l_shipdate >= o_orderdate
               AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
              WHERE o_totalprice > 499000
              GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Batch sessionization via window functions (the batch analog of
    // streaming.EventStreams.sessionize): session starts where the gap to
    // the previous event of the same user exceeds 30 min.
    Q("q_sessionize_batch",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        val ev = t(s, dir, "events")
          .withColumn("sec", date_trunc("second", col("ts")))
        val flagged = ev.withColumn("gap_s",
            unix_timestamp(col("sec")) - unix_timestamp(lag("sec", 1).over(w)))
          .withColumn("new_session",
            when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        flagged
          .withColumn("session_id", sum("new_session").over(
            Window.partitionBy("user_id").orderBy("sec", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id")
          .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH flagged AS (
                SELECT user_id,
                  CASE WHEN date_diff('second',
                    lag(date_trunc('second', ts)) OVER w,
                    date_trunc('second', ts)) > 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id
                             ORDER BY date_trunc('second', ts), event_id))
              SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                count(*) AS n_events
              FROM flagged GROUP BY user_id ORDER BY user_id""")),

    // event-type transition matrix (first-order Markov counts): lead()
    // over the per-user time order, then the (from, to) contingency table
    // with row-normalized probabilities — the path-analysis primitive
    Q("q_event_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = t(s, dir, "events")
          .withColumn("next_type", lead("event_type", 1).over(w))
          .filter(col("next_type").isNotNull)
        ev.groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n") / sum("n")
            .over(Window.partitionBy("from_type")), 4))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS next_type
                   FROM events),
              m AS (SELECT event_type AS from_type, next_type AS to_type,
                      count(*) AS n
                    FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
              SELECT from_type, to_type, n,
                round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4)
                  AS p
              FROM m ORDER BY from_type, to_type""")),

    // rolling-window anomaly detection — the streaming-adjacent QA probe:
    // each event scored against its user's TRAILING 20-event window
    // (frame excludes the current row, so the score is a true one-step
    // forecast residual), |value − μ| / σ > 3 flags it. One window
    // shuffle on user_id; the z is rounded to 4 dp BEFORE the threshold
    // so the flag is decided over bit-identical values on both engines
    // (sliding stddev accumulates in different orders across engines;
    // ~1e-12 against the 5e-5 grid). Aggregated per event type so the
    // audit output is bounded at any corpus size.
    Q("q_rolling_anomaly",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-20, -1)
        t(s, dir, "events")
          .withColumn("mu", avg("value").over(w))
          .withColumn("sd", stddev_samp(col("value")).over(w))
          .filter(col("sd").isNotNull && col("sd") > 0)
          .withColumn("z", round(abs(col("value") - col("mu")) / col("sd"), 4))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_scored"),
            sum(when(col("z") > 3.0, 1L).otherwise(0L)).as("n_anomalies"),
            round(max("z"), 4).as("max_z"))
          .orderBy("event_type")
      },
      Some("""WITH scored AS (SELECT event_type,
                  abs(value - avg(value) OVER w) / stddev_samp(value) OVER w AS z0,
                  stddev_samp(value) OVER w AS sd
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
              z AS (SELECT event_type, round(z0, 4) AS z FROM scored
                    WHERE sd IS NOT NULL AND sd > 0)
              SELECT event_type, count(*) AS n_scored,
                CAST(sum(CASE WHEN z > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_anomalies,
                round(max(z), 4) AS max_z
              FROM z GROUP BY event_type ORDER BY event_type""")),

    // ordered conversion funnel (view → click-after-view →
    // purchase-after-click) over the first 3 days: three chained
    // conditional-min window passes over ONE user_id partitioning (a
    // single shuffle — each stage's threshold is the previous stage's
    // window column), then a global stage-count roll-up
    Q("q_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val ev = t(s, dir, "events").filter(col("ts") < lit("2024-01-04"))
        ev.withColumn("tv",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("tc",
            min(when(col("event_type") === "click" && col("ts") >= col("tv"),
              col("ts"))).over(w))
          .withColumn("tp",
            min(when(col("event_type") === "purchase" && col("ts") >= col("tc"),
              col("ts"))).over(w))
          .groupBy()
          .agg(
            countDistinct(when(col("tv").isNotNull, col("user_id"))).as("n_view"),
            countDistinct(when(col("tc").isNotNull, col("user_id"))).as("n_click"),
            countDistinct(when(col("tp").isNotNull, col("user_id"))).as("n_purchase"))
          .withColumn("conversion",
            round(col("n_purchase").cast("double") / col("n_view"), 4))
      },
      Some("""WITH ev AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04'),
              u AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view' THEN ts END) AS tv
                    FROM ev GROUP BY 1),
              c AS (SELECT e.user_id, min(e.ts) AS tc
                    FROM ev e JOIN u USING (user_id)
                    WHERE e.event_type = 'click' AND e.ts >= u.tv GROUP BY 1),
              p AS (SELECT e.user_id, min(e.ts) AS tp
                    FROM ev e JOIN c USING (user_id)
                    WHERE e.event_type = 'purchase' AND e.ts >= c.tc GROUP BY 1)
              SELECT (SELECT count(*) FROM u WHERE tv IS NOT NULL) AS n_view,
                     (SELECT count(*) FROM c) AS n_click,
                     (SELECT count(*) FROM p) AS n_purchase,
                     round((SELECT count(*) FROM p) /
                       CAST((SELECT count(*) FROM u WHERE tv IS NOT NULL)
                         AS DOUBLE), 4) AS conversion""")),

    // cohort retention: users cohorted by FIRST-purchase day, then the
    // (cohort_day, day_offset) activity matrix over later purchases —
    // one user_id window for the cohort anchor, one distinct-agg shuffle
    Q("q_cohort_retention",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .withColumn("day", to_date(col("ts")))
          .withColumn("cohort", min("day").over(w))
          .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort", "day_offset")
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day
                         FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, min(day) AS cohort FROM p GROUP BY 1)
              SELECT c.cohort, date_diff('day', c.cohort, p.day) AS day_offset,
                     count(DISTINCT p.user_id) AS n_users
              FROM p JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // dense time-series gap-fill: an hourly spine (sequence() from the
    // corpus min/max hour, a 1-row broadcast) cross-joined with the type
    // dimension, left-joined with hourly counts, zeros filled — the
    // resample-to-calendar shape every metrics pipeline needs; emits only
    // the filled gaps plus a checksum row count to keep the dump bounded
    Q("q_timeseries_gapfill",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("hour", date_trunc("hour", col("ts")))
        val span = ev.agg(min("hour").as("lo"), max("hour").as("hi"))
        val spine = broadcast(span)
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 hour"))).as("hour"))
          .crossJoin(ev.select("event_type").distinct())
        val counts = ev.groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
        spine.join(counts, Seq("hour", "event_type"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_gap_hours"),
            sum("n").as("n_events"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS hour
                          FROM events),
              span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
              spine AS (SELECT t.event_type, h.hour
                        FROM (SELECT DISTINCT event_type FROM ev) t,
                          span, LATERAL unnest(generate_series(span.lo, span.hi,
                            INTERVAL '1 hour')) AS h(hour)),
              counts AS (SELECT event_type, hour, count(*) AS n
                         FROM ev GROUP BY 1, 2)
              SELECT s.event_type, count(*) AS n_hours,
                     CAST(sum(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_gap_hours,
                     CAST(coalesce(sum(c.n), 0) AS BIGINT) AS n_events
              FROM spine s LEFT JOIN counts c USING (event_type, hour)
              GROUP BY 1 ORDER BY 1""")),

    // Batch time-bucketed aggregation (the batch twin of the streaming
    // windowed counts): window() struct's start == DuckDB's time_bucket
    Q("q_time_window_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("total"))
        .orderBy("bucket", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
              count(*) AS n, round(sum(value), 2) AS total
              FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""")),

    // a REAL Structured Streaming run, driver-gated: file-source stream
    // over the events parquet (executors read splits; no driver-side
    // MemoryStream), tumbling 1-hour windowed agg with a watermark,
    // complete-mode memory sink, Trigger.AvailableNow — the stream drains
    // everything available and stops, and complete mode emits every
    // window, so the result equals the batch aggregation the DuckDB
    // oracle computes. This gates the streaming path's ARITHMETIC
    // (q_ingest_neardup gates the foreachBatch dedup composition;
    // EventStreamsSpec covers late-data/watermark semantics MemoryStream
    // can exercise and a batch oracle cannot).
    Q("q_stream_window_agg",
      (s, dir) => {
        val agg = graft.streaming.EventStreams.windowedCounts(
          Tables.loadEventsStream(s, dir),
          window = "1 hour", slide = "1 hour", watermark = "2 hours")
        val qname = "graft_stream_window_" + math.abs(dir.hashCode).toString
        val query = agg.writeStream.format("memory").queryName(qname)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        s.table(qname)
          .orderBy("window_start", "event_type")
      },
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
              time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
              event_type, count(*) AS n, round(avg(value), 4) AS avg_value
              FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""")),

    // second driver-gated streaming pattern: stream-STREAM interval join
    // (click → purchase attribution within 30 min per user), both sides
    // file-source streams, append-mode memory sink, AvailableNow drain.
    // Inner stream-stream joins emit on match (the watermark only bounds
    // join STATE), so the drained sink holds exactly the batch interval
    // join the oracle computes; the entry aggregates the sink to a
    // content-checksummed single row so the dump stays bounded
    Q("q_stream_stream_join",
      (s, dir) => {
        val ev = Tables.loadEventsStream(s, dir)
        val joined = graft.streaming.EventStreams.streamStreamJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          withinMinutes = 30)
        val qname = "graft_ss_join_" + math.abs(dir.hashCode).toString
        s.catalog.dropTempView(qname) // append-mode sink: clear prior runs
        // per-query ON-HEAP state store (GraftSession.withStateStore doc):
        // the dual-sided join state is read-heavy per row and
        // watermark-BOUNDED, so heap wins 3:1 over the session's RocksDB
        // robustness default at ×1000 with no OOM exposure; an explicit
        // SPARK_GRAFT_STATESTORE pin overrides the hint
        graft.GraftSession.withStateStore(s, graft.GraftSession.HeapStateStore) {
          val q = joined.writeStream.format("memory").queryName(qname)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.table(qname).agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          sum(pmod(col("l_id") * 31 + col("r_id"), lit(1000000007L)))
            .as("pair_hash_sum"))
      },
      Some("""SELECT count(*) AS n_pairs,
                count(DISTINCT c.user_id) AS n_users,
                CAST(sum((c.event_id * 31 + p.event_id) % 1000000007) AS BIGINT)
                  AS pair_hash_sum
              FROM events c JOIN events p
                ON c.event_type = 'click' AND p.event_type = 'purchase'
                AND p.user_id = c.user_id AND p.ts >= c.ts
                AND p.ts <= c.ts + INTERVAL '30 minutes'""")),

    // SEVENTH driver-gated streaming pattern: LEFT-OUTER stream-stream
    // join — the one streaming-join semantics where output is driven by
    // STATE EVICTION, not by data: an unmatched click null-emits only
    // when the global watermark strictly passes its match horizon
    // (l_ts + 30 min), proving no purchase can still arrive; clicks
    // inside the final lateness horizon never null-emit. With an
    // AvailableNow drain the final watermark is
    // least(max click ts, max purchase ts) − 1 h (two watermarked
    // operators; Spark's multipleWatermarkPolicy=min is the default),
    // so the emitted set is exactly: all interval matches + the
    // unmatched clicks whose horizon < that watermark — which is what
    // the oracle computes. Timestamps are second-truncated BEFORE the
    // watermark so the strict-inequality boundary (pinned by
    // EventStreamsSpec at wm == horizon → no emit) is exercised on
    // clean instants in both engines. Same per-query on-heap hint as
    // the inner entry (read-heavy, watermark-bounded dual-sided state).
    Q("q_stream_left_join",
      (s, dir) => {
        val ev = Tables.loadEventsStream(s, dir)
          .withColumn("ts", date_trunc("second", col("ts")))
        val joined = graft.streaming.EventStreams.streamStreamJoin(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          withinMinutes = 30, joinType = "left_outer")
        // FILE sink, not a memory sink: null-emits scale with |clicks|
        // (~20M rows at ×1000), and a memory sink would materialize all
        // of them on the driver — executors write the parquet sink and
        // the read-back aggregation stays distributed (the
        // q_stream_sessionize precedent)
        val sink = s"/tmp/graft-ssleft-sink-${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(sink)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(sink), true)
        fs.delete(new org.apache.hadoop.fs.Path(sink + "-ckpt"), true)
        graft.GraftSession.withStateStore(s, graft.GraftSession.HeapStateStore) {
          val q = joined.writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", sink + "-ckpt")
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        s.read.parquet(sink).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("r_id").isNull, 1L).otherwise(0L)).as("n_null_emits"),
          countDistinct(col("user_id")).as("n_users"),
          sum(pmod(col("l_id") * 31 + coalesce(col("r_id"), lit(0L)),
            lit(1000000007L))).as("pair_hash_sum"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
                           date_trunc('second', ts) AS sec FROM events),
              c AS (SELECT event_id, user_id, sec FROM e
                    WHERE event_type = 'click'),
              p AS (SELECT event_id, user_id, sec FROM e
                    WHERE event_type = 'purchase'),
              wm AS (SELECT least((SELECT max(sec) FROM c),
                                  (SELECT max(sec) FROM p))
                            - INTERVAL '1 hour' AS w),
              matched AS (
                SELECT c.event_id AS l_id, p.event_id AS r_id, c.user_id
                FROM c JOIN p ON p.user_id = c.user_id
                  AND p.sec >= c.sec
                  AND p.sec <= c.sec + INTERVAL '30 minutes'),
              nulls AS (
                SELECT c.event_id AS l_id, CAST(NULL AS BIGINT) AS r_id,
                       c.user_id
                FROM c, wm
                WHERE c.sec + INTERVAL '30 minutes' < wm.w
                  AND NOT EXISTS (SELECT 1 FROM p
                    WHERE p.user_id = c.user_id AND p.sec >= c.sec
                      AND p.sec <= c.sec + INTERVAL '30 minutes')),
              allr AS (SELECT * FROM matched UNION ALL SELECT * FROM nulls)
              SELECT count(*) AS n_rows,
                CAST(sum(CASE WHEN r_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_null_emits,
                count(DISTINCT user_id) AS n_users,
                CAST(sum((l_id * 31 + coalesce(r_id, 0)) % 1000000007)
                  AS BIGINT) AS pair_hash_sum
              FROM allr""")),

    // EIGHTH driver-gated streaming pattern: keyed upsert (streaming
    // SCD1) — foreachBatch folds each batch's per-user winner (max of
    // struct(ts, event_id): lexicographic, ASSOCIATIVE, so the final
    // state table is independent of micro-batch splits and arrival
    // order) into a bucket-partitioned parquet state table, rewriting
    // only the buckets the batch touches via dynamic partition
    // overwrite — the Delta-less streaming MERGE whose per-batch I/O is
    // proportional to touched buckets, not to the table. The oracle
    // replays last-row-per-user with a (ts DESC, event_id DESC) window
    // and aggregates the same winner set. SPARK_GRAFT_UPSERT_BATCH_FILES
    // caps files per micro-batch (maxFilesPerTrigger) to force a
    // MULTI-batch AvailableNow drain: the winner fold is associative, so
    // the oracle stays green under ANY batch split — the determinism
    // contract proven end-to-end, not just in the spec.
    Q("q_stream_upsert",
      (s, dir) => {
        val sink = s"/tmp/graft-upsert-${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(sink)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(sink), true)
        fs.delete(new org.apache.hadoop.fs.Path(sink + "-ckpt"), true)
        val srcOpts = sys.env.get("SPARK_GRAFT_UPSERT_BATCH_FILES")
          .map(n => Map("maxFilesPerTrigger" -> n)).getOrElse(Map.empty)
        val q = graft.streaming.EventStreams.upsertLatest(
          Tables.loadEventsStream(s, dir, srcOpts), sink, sink + "-ckpt",
          nBuckets = 16, availableNow = true)
        q.awaitTermination()
        s.read.parquet(sink)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            sum(pmod(col("user_id") * 31 + col("event_id"),
              lit(1000000007L))).as("winner_hash_sum"),
            round(sum("value"), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""WITH w AS (SELECT user_id, event_id, event_type, value,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
              SELECT event_type, count(*) AS n_users,
                CAST(sum((user_id * 31 + event_id) % 1000000007) AS BIGINT)
                  AS winner_hash_sum,
                round(sum(value), 2) AS sum_value
              FROM w WHERE rn = 1
              GROUP BY event_type ORDER BY event_type""")),

    // NINTH driver-gated streaming pattern: windowed approx-distinct
    // users via HLL++ — O(sketch) state per (window, type) group where
    // dedup-then-count state grows one entry per distinct id. The raw
    // estimate is engine-specific (never hash-compared); the entry is
    // the q_approx_distinct AUDIT shape — the streamed sketch joins the
    // batch-exact count per window and the 3·rsd (15%) band must hold,
    // so a Spark-side sketch regression breaks the boolean while DuckDB
    // independently replays the exact side. Complete-mode memory sink is
    // bounded: one row per (window, event_type).
    Q("q_stream_approx_distinct",
      (s, dir) => {
        val agg = graft.streaming.EventStreams.windowedApproxDistinct(
          Tables.loadEventsStream(s, dir),
          window = "1 hour", watermark = "2 hours", rsd = 0.05)
        val qname = "graft_stream_hll_" + math.abs(dir.hashCode).toString
        val query = agg.writeStream.format("memory").queryName(qname)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val sk = s.table(qname)
        val exact = t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(countDistinct("user_id").as("exact_users"))
          .select(col("window.start").as("window_start"),
            col("event_type"), col("exact_users"))
        sk.join(exact, Seq("window_start", "event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_windows"),
            sum("exact_users").as("sum_exact_users"),
            (sum(when(abs(col("approx_users") - col("exact_users")) <=
                greatest(lit(5.0), col("exact_users") * lit(0.15)), 1L)
              .otherwise(0L)) === count(lit(1))).as("hll_within_tol"))
          .orderBy("event_type")
      },
      Some("""WITH w AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
                event_type, count(DISTINCT user_id) AS exact_users
              FROM events GROUP BY 1, 2)
              SELECT event_type, count(*) AS n_windows,
                CAST(sum(exact_users) AS BIGINT) AS sum_exact_users,
                TRUE AS hll_within_tol
              FROM w GROUP BY event_type ORDER BY event_type""")),

    // third driver-gated streaming pattern: exactly-once-style dedup.
    // The stream is the events source UNIONED WITH ITSELF (two
    // independent file-source reads — a replayed-ingest simulation with
    // every event guaranteed duplicated), so dropDuplicatesWithinWatermark
    // must collapse 2N arrivals to N. The oracle is the plain distinct
    // profile of the batch table; any state-machinery failure (missed
    // dedup, dropped id) breaks the count or the id checksum
    Q("q_stream_dedup",
      (s, dir) => {
        val doubled = Tables.loadEventsStream(s, dir)
          .unionByName(Tables.loadEventsStream(s, dir))
        val deduped = graft.streaming.EventStreams.dedupStream(doubled)
        val qname = "graft_stream_dedup_" + math.abs(dir.hashCode).toString
        s.catalog.dropTempView(qname)
        val q = deduped.writeStream.format("memory").queryName(qname)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname).agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("event_id")).as("n_distinct"),
          sum(pmod(col("event_id"), lit(1000000007L))).as("id_hash_sum"))
      },
      Some("""SELECT count(*) AS n_events,
                count(DISTINCT event_id) AS n_distinct,
                CAST(sum(event_id % 1000000007) AS BIGINT) AS id_hash_sum
              FROM events""")),

    // fourth driver-gated streaming pattern: stateful sessionization
    // (flatMapGroupsWithState + event-time timeout). Sessions are emitted
    // ONLY when the watermark passes session_end + gap, and with an
    // AvailableNow drain the final watermark is max(ts) - 1h (the no-data
    // micro-batch fires the pending state timeouts before termination), so
    // the emitted set is exactly the batch gap-sessionization restricted to
    // watermark-closable sessions — which is what the oracle computes.
    // Events are second-truncated BEFORE the watermark so both engines
    // reason about identical instants (ms vs micros floors differ).
    Q("q_stream_sessionize",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.loadEventsStream(s, dir)
          .withColumn("ts", date_trunc("second", col("ts")))
          .select("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.EventStreams.Event]
        val sessions = graft.streaming.EventStreams.sessionize(
          ev, gapMinutes = 30, watermark = "1 hour")
        // FILE sink, not a memory sink: a sparse corpus emits ~one session
        // per event (measured: 9.5M sessions from 10M ×100 events), and a
        // memory sink materializes all of them on the driver — executors
        // write the parquet sink, and the read-back stays distributed
        val sink = s"/tmp/graft-sess-sink-${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(sink)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(sink), true)
        fs.delete(new org.apache.hadoop.fs.Path(sink + "-ckpt"), true)
        val q = sessions.writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", sink + "-ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .withColumn("total_value", round(col("total_value"), 2))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('second', ts) AS sec, value
                         FROM events),
              mx AS (SELECT max(sec) AS m FROM e),
              flag AS (SELECT user_id, sec, value,
                         CASE WHEN lag(sec) OVER w IS NULL
                              OR date_diff('second', lag(sec) OVER w, sec) > 1800
                         THEN 1 ELSE 0 END AS ns
                       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
              sess AS (SELECT user_id, sec, value,
                         sum(ns) OVER (PARTITION BY user_id ORDER BY sec
                                       ROWS UNBOUNDED PRECEDING) AS sid
                       FROM flag),
              agg AS (SELECT user_id, min(sec) AS session_start,
                        max(sec) AS session_end, count(*) AS n_events,
                        round(sum(value), 2) AS total_value
                      FROM sess GROUP BY user_id, sid)
              SELECT user_id, session_start, session_end, n_events, total_value
              FROM agg, mx
              WHERE session_end + INTERVAL '30 minutes' <= m - INTERVAL '1 hour'
              ORDER BY user_id, session_start""")),

    // fifth driver-gated streaming pattern: stream-STATIC broadcast
    // enrichment (the streaming form of the reference's implied dimension
    // lookup). The static customer side re-resolves per micro-batch and
    // broadcasts, so the stream side never shuffles; the per-segment
    // aggregation runs INSIDE the stream (complete-mode state = one row
    // per (segment, type) — bounded however large the stream; sinking the
    // raw enriched stream instead was measured dead at ×100: 6M rows
    // through a driver-side memory sink blow maxResultSize), and the
    // batch join+agg oracle replays the drained result
    Q("q_stream_enrich",
      (s, dir) => {
        val dim = t(s, dir, "customer")
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
        val enriched = graft.streaming.EventStreams.enriched(
          Tables.loadEventsStream(s, dir), dim, "user_id")
        val agg = enriched.groupBy("c_mktsegment", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        val qname = "graft_stream_enrich_" + math.abs(dir.hashCode).toString
        s.catalog.dropTempView(qname)
        val q = agg.writeStream.format("memory").queryName(qname)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname).orderBy("c_mktsegment", "event_type")
      },
      Some("""SELECT c_mktsegment, event_type, count(*) AS n,
                round(sum(value), 2) AS total
              FROM events e JOIN customer c ON c.c_custkey = e.user_id
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // sixth driver-gated streaming pattern: NATIVE session_window
    // aggregation — the built-in state-store twin of the
    // flatMapGroupsWithState entry above. Same gap-merge semantics, same
    // watermark-closable emission set under the AvailableNow drain, but
    // the session state lives in Spark's session-window state store
    // (merging windows on update) instead of user code. The window END is
    // last-event + gap by definition, so the entry subtracts the gap back
    // to report the fMGWS-convention session_end and the SAME oracle
    // applies — any divergence between the two engines' session-merge or
    // eviction rules lands as a driver hash mismatch. File sink for the
    // same ×100 reason as q_stream_sessionize (one session per sparse
    // event; a memory sink would driver-materialize millions).
    Q("q_stream_session_native",
      (s, dir) => {
        val ev = Tables.loadEventsStream(s, dir)
          .withColumn("ts", date_trunc("second", col("ts")))
        val sess = ev.withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("total_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            (col("session_window.end").cast("long") - 1800L)
              .cast("timestamp").as("session_end"),
            col("n_events"), col("total_value"))
        val sink = s"/tmp/graft-sessnat-sink-${math.abs(dir.hashCode)}"
        val fs = new org.apache.hadoop.fs.Path(sink)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(sink), true)
        fs.delete(new org.apache.hadoop.fs.Path(sink + "-ckpt"), true)
        val q = sess.writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", sink + "-ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(sink)
          .withColumn("total_value", round(col("total_value"), 2))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH e AS (SELECT user_id, date_trunc('second', ts) AS sec, value
                         FROM events),
              mx AS (SELECT max(sec) AS m FROM e),
              flag AS (SELECT user_id, sec, value,
                         CASE WHEN lag(sec) OVER w IS NULL
                              OR date_diff('second', lag(sec) OVER w, sec) > 1800
                         THEN 1 ELSE 0 END AS ns
                       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
              sess AS (SELECT user_id, sec, value,
                         sum(ns) OVER (PARTITION BY user_id ORDER BY sec
                                       ROWS UNBOUNDED PRECEDING) AS sid
                       FROM flag),
              agg AS (SELECT user_id, min(sec) AS session_start,
                        max(sec) AS session_end, count(*) AS n_events,
                        round(sum(value), 2) AS total_value
                      FROM sess GROUP BY user_id, sid)
              SELECT user_id, session_start, session_end, n_events, total_value
              FROM agg, mx
              WHERE session_end + INTERVAL '30 minutes' <= m - INTERVAL '1 hour'
              ORDER BY user_id, session_start""")),

    // JSON column extraction (events.props holds JSON documents)
    Q("q_json_extract",
      (s, dir) => t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
              CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
              round(avg(CAST(json_extract(props, '$.k') AS INT)), 4) AS avg_k
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // HLL++ sketch profiling — the 100 TB path for exact countDistinct.
    // DuckDB's approx sketch differs by construction, so the raw estimate
    // can't hash-match; the catalog entry is the AUDIT shape instead:
    // exact counts + a deterministic bounded-error assertion on the HLL
    // estimate, which an independent engine CAN verify (it recomputes the
    // exact side and the bound must hold — Spark's HLL at the default
    // rsd=0.05 with a 3·rsd (15%) band; see approxDistinctAudit).
    Q("q_approx_distinct",
      (s, dir) => Profiling.approxDistinctAudit(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity"))
        .orderBy("col_name"),
      Some("""SELECT col_name, exact_distinct, TRUE AS hll_within_tol FROM (
                SELECT 'l_orderkey' AS col_name,
                  count(DISTINCT l_orderkey) AS exact_distinct FROM lineitem
                UNION ALL SELECT 'l_partkey', count(DISTINCT l_partkey) FROM lineitem
                UNION ALL SELECT 'l_suppkey', count(DISTINCT l_suppkey) FROM lineitem
                UNION ALL SELECT 'l_quantity', count(DISTINCT l_quantity) FROM lineitem)
              ORDER BY col_name""")),

    // Custom physical operator (graftnative.TopKPerKeyExec): bounded-heap
    // grouped top-k, oracled against the window row_number formulation
    Q("q_topk_per_key",
      (s, dir) => org.apache.spark.sql.graftnative.TopKPerKey(
          t(s, dir, "customer"),
          keyCols = Seq("c_nationkey"),
          orderCols = Seq(col("c_acctbal").desc, col("c_custkey")), k = 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "c_custkey"),
      Some("""SELECT c_nationkey, c_custkey, c_acctbal FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS rn
                FROM customer) WHERE rn <= 3
              ORDER BY c_nationkey, c_custkey""")),

    // EP3 parity (SURVEY.md §3): SQL text through the ANTLR parser +
    // catalog resolution, not the DataFrame DSL
    Q("q_sql_text",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("li_v")
        t(s, dir, "orders").createOrReplaceTempView("ord_v")
        s.sql("""SELECT o_orderstatus, count(*) AS n,
                 round(sum(l_extendedprice), 2) AS total
                 FROM ord_v JOIN li_v ON o_orderkey = l_orderkey
                 WHERE o_totalprice > 100000
                 GROUP BY o_orderstatus ORDER BY o_orderstatus""")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
              round(sum(l_extendedprice), 2) AS total
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              WHERE o_totalprice > 100000
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // per-group ordinary least squares via the SQL-standard REGR_ family —
    // one partial-aggregable pass (sums of x, y, x², xy per key), no
    // per-group collect: the shape that lets a 100-TB fit run as a single
    // map-side-combined shuffle. Built-in codegen'd aggregates on both
    // engines; corr's round-4 precedent applies (error ~1e-12 relative).
    Q("q_regr_per_key",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4)
            .as("r2"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
              count(*) AS n,
              round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
              round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
              round(regr_r2(l_extendedprice, l_quantity), 4) AS r2
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // snapshot diff — the dataset-version audit every recurring crawl /
    // ingest pipeline runs: classify every key across two table versions
    // as added / removed / changed / unchanged and aggregate the drift.
    // Both versions derive deterministically from `orders` (no fixture
    // mutation): the old snapshot is missing keys ≡0 mod 13 (→ "added"),
    // carries a stale price on keys ≡1 mod 7 (→ "changed"), and the new
    // snapshot drops keys ≡3 mod 11 (→ "removed"). ONE full-outer shuffle
    // join on the key then a partial-aggregated rollup — at 100 TB this
    // is two bucketed scans + a zero-exchange join when both snapshots
    // share the key bucketing (Tables.writeBucketed path).
    Q("q_snapshot_diff",
      (s, dir) => {
        val ord = t(s, dir, "orders")
        val old = ord.filter(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 7 === 1, col("o_totalprice") - 50.0)
              .otherwise(col("o_totalprice")).as("old_price"))
        val nw = ord.filter(col("o_orderkey") % 11 =!= 3)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("new_price"))
        old.join(nw, Seq("k"), "full_outer")
          .withColumn("change",
            when(col("old_price").isNull, lit("added"))
              .when(col("new_price").isNull, lit("removed"))
              .when(col("old_price") =!= col("new_price"), lit("changed"))
              .otherwise(lit("unchanged")))
          .groupBy("change")
          .agg(count(lit(1)).as("n"),
            round(coalesce(sum(col("new_price") - col("old_price")), lit(0.0)), 2)
              .as("price_drift"))
          .orderBy("change")
      },
      Some("""WITH old AS (
                SELECT o_orderkey AS k,
                  CASE WHEN o_orderkey % 7 = 1 THEN o_totalprice - 50.0
                       ELSE o_totalprice END AS old_price
                FROM orders WHERE o_orderkey % 13 <> 0),
              nw AS (
                SELECT o_orderkey AS k, o_totalprice AS new_price
                FROM orders WHERE o_orderkey % 11 <> 3)
              SELECT CASE WHEN old_price IS NULL THEN 'added'
                          WHEN new_price IS NULL THEN 'removed'
                          WHEN old_price <> new_price THEN 'changed'
                          ELSE 'unchanged' END AS change,
                count(*) AS n,
                round(coalesce(sum(new_price - old_price), 0.0), 2)
                  AS price_drift
              FROM old FULL OUTER JOIN nw USING (k)
              GROUP BY 1 ORDER BY change""")),

    // blocked entity resolution — the string-similarity complement of the
    // token/vector dedup families: candidate pairs come from an equi-join
    // on a cheap blocking key (here the head noun of the name), the
    // expensive edit-distance verify runs only inside blocks. The classic
    // ER scale contract: candidates are Σ|block|², so block choice (plus
    // a maxDf-style cap on hub blocks, same lever as ngramJaccard) is
    // what keeps 100 TB feasible — never the all-pairs cross join.
    Q("q_entity_match",
      (s, dir) => {
        val names = t(s, dir, "part").select(col("p_name")).distinct()
          .withColumn("blk", regexp_extract(col("p_name"), "[a-z]+$", 0))
        val a = names.select(col("p_name").as("name_a"), col("blk"))
        val b = names.select(col("p_name").as("name_b"), col("blk"))
        a.join(b, Seq("blk"))
          .filter(col("name_a") < col("name_b"))
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 3)
          .select(col("name_a"), col("name_b"), col("dist").cast("int").as("dist"))
          .orderBy("name_a", "name_b")
      },
      Some("""WITH names AS (
                SELECT DISTINCT p_name,
                  regexp_extract(p_name, '[a-z]+$') AS blk FROM part)
              SELECT a.p_name AS name_a, b.p_name AS name_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
              FROM names a JOIN names b
                ON a.blk = b.blk AND a.p_name < b.p_name
              WHERE levenshtein(a.p_name, b.p_name) <= 3
              ORDER BY name_a, name_b""")),

    // full ER pipeline: block → edit-distance verify → connected
    // components → one canonical entity id per name group. Reuses the
    // SAME min-label CC machinery the dedup family oracles (recursive-CTE
    // closure); singleton names (no match edge) stay their own entity via
    // the left join + coalesce — the contract a downstream keyed join
    // needs (every name resolves to exactly one entity, matched or not).
    Q("q_entity_clusters",
      (s, dir) => {
        val nameIds = t(s, dir, "part").groupBy("p_name")
          .agg(min("p_partkey").as("nid"))
        val names = nameIds
          .withColumn("blk", regexp_extract(col("p_name"), "[a-z]+$", 0))
        val a = names.select(col("nid").as("id_a"), col("p_name").as("name_a"),
          col("blk"))
        val b = names.select(col("nid").as("id_b"), col("p_name").as("name_b"),
          col("blk"))
        val pairs = a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b") &&
            levenshtein(col("name_a"), col("name_b")) <= 3)
          .select("id_a", "id_b")
        val cc = Dedup.connectedComponents(pairs)
        nameIds.join(cc.withColumnRenamed("id", "nid"), Seq("nid"), "left")
          .withColumn("entity", coalesce(col("component"), col("nid")))
          .groupBy("entity")
          .agg(count(lit(1)).as("n_names"), min("p_name").as("first_name"))
          .orderBy("entity")
      },
      Some("""WITH RECURSIVE nameids AS (
                SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS nid
                FROM part GROUP BY p_name),
              names AS (
                SELECT p_name, nid,
                  regexp_extract(p_name, '[a-z]+$') AS blk FROM nameids),
              pairs AS (
                SELECT a.nid AS id_a, b.nid AS id_b
                FROM names a JOIN names b
                  ON a.blk = b.blk AND a.nid < b.nid
                WHERE levenshtein(a.p_name, b.p_name) <= 3),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node, min(lbl) AS component
                FROM reach GROUP BY node)
              SELECT coalesce(c.component, n.nid) AS entity,
                count(*) AS n_names, min(n.p_name) AS first_name
              FROM nameids n LEFT JOIN comp c ON c.node = n.nid
              GROUP BY 1 ORDER BY entity""")),

    // residual-outlier detection on top of the per-key OLS fit: the
    // two-pass anomaly shape (coefficients are a 3-row broadcast, the
    // residual scan is map-only) that stays one-shuffle at any corpus
    // size. Residuals are rounded to 2 dp BEFORE the ordering so the
    // top-k frontier is decided over bit-identical values on both
    // engines (raw slope/intercept differ ~1e-12 relative across
    // summation orders; at |resid| ~ 1e5 the rounded value is exact).
    Q("q_regr_residuals",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val coef = li.groupBy("l_returnflag").agg(
          regr_slope(col("l_extendedprice"), col("l_quantity")).as("slope"),
          regr_intercept(col("l_extendedprice"), col("l_quantity")).as("icept"))
        li.join(broadcast(coef), Seq("l_returnflag"))
          .withColumn("resid", round(col("l_extendedprice") -
            (col("slope") * col("l_quantity") + col("icept")), 2))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            col("resid"))
          .orderBy(abs(col("resid")).desc, col("l_orderkey"), col("l_linenumber"))
          .limit(10)
      },
      Some("""WITH coef AS (
                SELECT l_returnflag,
                  regr_slope(l_extendedprice, l_quantity) AS slope,
                  regr_intercept(l_extendedprice, l_quantity) AS icept
                FROM lineitem GROUP BY l_returnflag)
              SELECT l_orderkey, l_linenumber, l_returnflag,
                round(l_extendedprice - (slope * l_quantity + icept), 2)
                  AS resid
              FROM lineitem JOIN coef USING (l_returnflag)
              ORDER BY abs(round(l_extendedprice - (slope * l_quantity + icept),
                2)) DESC, l_orderkey, l_linenumber
              LIMIT 10"""))
  )

  // ------------------------------------------------------------- text/docs
  // (training-data pipeline surface; `documents` table)

  private val text: Seq[Q] = Seq(
    Q("q_dedup_exact",
      (s, dir) => Dedup.exactGroups(t(s, dir, "documents")).orderBy("h"),
      Some("""SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id,
              count(*) AS copies FROM documents GROUP BY md5(text) ORDER BY h""")),

    // C4-style span-level global dedup: segment each document into 10-token
    // windows ("lines" of unbroken web text), keep each distinct window only
    // at its first (doc_id, position) occurrence corpus-wide, reassemble.
    // The oracle replays the same md5-keyed first-occurrence rule with a
    // window function — rank over (doc_id, line_idx) within each digest.
    Q("q_dedup_lines",
      (s, dir) => {
        val linesC = Dedup.tokenWindowLines(col("text"), 10)
        Dedup.lineDedup(t(s, dir, "documents"), linesC)
          .select("doc_id", "n_lines", "n_kept", "text_dedup")
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
              lines AS (
                SELECT doc_id, CAST(i AS INT) AS line_idx,
                       array_to_string(t[(10 * i + 1):(10 * i + 10)], ' ') AS line
                FROM tk, LATERAL unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
                     AS r(i)),
              ranked AS (
                SELECT doc_id, line_idx, line,
                       row_number() OVER (PARTITION BY md5(line)
                                          ORDER BY doc_id, line_idx) AS rn
                FROM lines)
              SELECT doc_id, CAST(count(*) AS INT) AS n_lines,
                     CAST(coalesce(count(*) FILTER (WHERE rn = 1), 0) AS INT) AS n_kept,
                     coalesce(string_agg(line, chr(10) ORDER BY line_idx)
                              FILTER (WHERE rn = 1), '') AS text_dedup
              FROM ranked GROUP BY doc_id ORDER BY doc_id""")),

    // incremental line dedup: the re-crawl (docs % 3 != 0) probed against
    // the base corpus's persisted line-digest table — base-owned windows
    // are struck everywhere, fresh windows keep first occurrence in-batch
    Q("q_dedup_lines_incr",
      (s, dir) => {
        val linesC = Dedup.tokenWindowLines(col("text"), 10)
        val docs = t(s, dir, "documents")
        val base = Dedup.lineDigests(docs.filter(col("doc_id") % 3 === 0), linesC)
        Dedup.lineDedupIncremental(
            docs.filter(col("doc_id") % 3 =!= 0), base, linesC)
          .select("doc_id", "n_lines", "n_kept", "text_dedup")
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
              lines AS (
                SELECT doc_id, CAST(i AS INT) AS line_idx,
                       array_to_string(t[(10 * i + 1):(10 * i + 10)], ' ') AS line
                FROM tk, LATERAL unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
                     AS r(i)),
              base AS (SELECT DISTINCT md5(line) AS lh FROM lines
                       WHERE doc_id % 3 = 0),
              nw AS (SELECT * FROM lines WHERE doc_id % 3 <> 0),
              fresh AS (SELECT * FROM nw
                        WHERE md5(line) NOT IN (SELECT lh FROM base)),
              ranked AS (
                SELECT doc_id, line_idx,
                       row_number() OVER (PARTITION BY md5(line)
                                          ORDER BY doc_id, line_idx) AS rn
                FROM fresh)
              SELECT n.doc_id, CAST(count(*) AS INT) AS n_lines,
                     CAST(coalesce(count(*) FILTER (WHERE r.rn = 1), 0) AS INT)
                       AS n_kept,
                     coalesce(string_agg(n.line, chr(10) ORDER BY n.line_idx)
                              FILTER (WHERE r.rn = 1), '') AS text_dedup
              FROM nw n LEFT JOIN ranked r
                ON r.doc_id = n.doc_id AND r.line_idx = n.line_idx
              GROUP BY n.doc_id ORDER BY n.doc_id""")),

    // PII / denylist scrub certificate per source: five PII classes
    // (email/SSN/phone/IPv4/card-run) + one denylist term, counted on the
    // original text and redacted with stable placeholders in ONE codegen
    // projection (no shuffle beyond the bounded source roll-up). On this
    // synthetic word-soup corpus the PII classes certify ZERO (the clean
    // certificate is the product — a crawl corpus would light them up)
    // while the denylist class hits, so both the zero path and the
    // replace path execute; the scrubbed-text portable hash-sum proves
    // the redaction is deterministic — the DuckDB oracle replays the
    // same chained replaces and must land on the same fold. Patterns
    // stay in the Java-regex ∩ RE2 subset (no lookaround/backrefs).
    Q("q_pii_scrub",
      (s, dir) => graft.operators.Scrub.scrubReport(
        t(s, dir, "documents"), col("source"), col("text"),
        graft.operators.Scrub.PiiDefaults :+
          graft.operators.Scrub.ScrubPattern(
            "term", "\\bcustomer\\b", "<TERM>")),
      Some(scrubReportSql("SELECT source, text FROM documents",
        graft.operators.Scrub.PiiDefaults :+
          graft.operators.Scrub.ScrubPattern(
            "term", "\\bcustomer\\b", "<TERM>")))),

    // the NON-ZERO scrub path, driver-oracled: PII is PLANTED onto the
    // word-soup corpus by both engines from the same deterministic recipe
    // (doc_id-keyed emails; separated vs bare card forms by parity;
    // parenthesized vs dashed phone forms by mod 3; an SSN+IP tail on
    // every 5th doc), so every class counts nonzero, the chained
    // replacement is non-identity on every row, and the scrubbed-text
    // portable hash fold certifies the two engines' redactions are
    // BYTE-IDENTICAL — exactly the surface (alternation order, chained
    // replaces, word boundaries around separators) where regex engines
    // can diverge. q_pii_scrub keeps the zero-hit clean-certificate path;
    // this entry is its hit-dense twin.
    Q("q_pii_scrub_planted",
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("source"), concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          when(col("doc_id") % 2 === 0, lit(" card 4111-1111-1111-1111"))
            .otherwise(lit(" card 4111111111111111")),
          when(col("doc_id") % 3 === 0, lit(" call (212) 555-0187"))
            .otherwise(lit(" call 212-555-0187")),
          when(col("doc_id") % 5 === 0, lit(" ssn 987-65-4320 at 10.0.0.1"))
            .otherwise(lit(""))).as("text"))
        graft.operators.Scrub.scrubReport(planted, col("source"), col("text"))
      },
      Some(scrubReportSql(
        """SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com'
               || CASE WHEN doc_id % 2 = 0 THEN ' card 4111-1111-1111-1111'
                       ELSE ' card 4111111111111111' END
               || CASE WHEN doc_id % 3 = 0 THEN ' call (212) 555-0187'
                       ELSE ' call 212-555-0187' END
               || CASE WHEN doc_id % 5 = 0 THEN ' ssn 987-65-4320 at 10.0.0.1'
                       ELSE '' END AS text
           FROM documents""",
        graft.operators.Scrub.PiiDefaults))),

    Q("q_text_quality",
      (s, dir) => TextAnalysis.qualityMetrics(t(s, dir, "documents"))
        .select("doc_id", "n_char", "n_tokens", "alpha_ratio", "digit_ratio")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_char,
              CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
              round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                    / CAST(length(text) AS DOUBLE), 4) AS alpha_ratio,
              round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    / CAST(length(text) AS DOUBLE), 4) AS digit_ratio
              FROM documents ORDER BY doc_id""")),

    Q("q_token_stats_by_lang",
      (s, dir) => TextAnalysis.tokenCounts(t(s, dir, "documents"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum("n_ws_tokens").as("total_tokens"),
          round(avg("n_ws_tokens"), 2).as("avg_tokens"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS docs,
              CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
                AS total_tokens,
              round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 2) AS avg_tokens
              FROM documents GROUP BY lang ORDER BY lang""")),

    Q("q_lang_source_dist",
      (s, dir) => t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, count(*) AS n FROM documents
              GROUP BY lang, source ORDER BY lang, source""")),

    Q("q_doc_len_histogram",
      (s, dir) => t(s, dir, "documents")
        .groupBy((floor(col("n_chars") / 100.0) * 100).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(n_chars / 100.0) * 100 AS INT) AS bucket,
              count(*) AS n FROM documents GROUP BY 1 ORDER BY bucket""")),

    // higher-order array functions (filter/exists/aggregate/zip_with) as a
    // driver-gated row — the codegen-friendly array algebra the LLM
    // operators build on, on integer outputs so the compare is exact.
    // DuckDB replays with list_filter/list_contains/list_sum and a
    // positional comprehension
    Q("q_higher_order_funcs",
      (s, dir) => {
        val tk = split(trim(col("text")), "\\s+")
        t(s, dir, "documents").select(
          col("doc_id"),
          size(filter(tk, x => length(x) > 5)).cast("long").as("n_long"),
          exists(tk, x => x === "spark").cast("int").as("has_spark"),
          aggregate(tk, lit(0L), (a, x) => a + length(x)).as("chars_sum"),
          aggregate(zip_with(tk, sequence(lit(1), size(tk)),
              (x, i) => length(x).cast("long") * i),
            lit(0L), (a, y) => a + y).as("pos_weighted"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id,
                  regexp_split_to_array(trim(text), '\s+') AS t FROM documents)
              SELECT doc_id,
                CAST(len(list_filter(t, x -> length(x) > 5)) AS BIGINT) AS n_long,
                CAST(list_contains(t, 'spark') AS INT) AS has_spark,
                CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT)
                  AS chars_sum,
                CAST(list_sum([length(t[i]) * i FOR i IN range(1, len(t) + 1)])
                  AS BIGINT) AS pos_weighted
              FROM tk ORDER BY doc_id""")),

    // map-typed columns: per-doc token→count map via map_from_entries,
    // probed with element_at / size — deterministic OUTPUTS (the map's
    // internal order is not) so the compare stays exact
    Q("q_map_funcs",
      (s, dir) => {
        val tk = split(trim(col("text")), "\\s+")
        t(s, dir, "documents")
          .select(col("doc_id"), explode(tk).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(map_from_entries(collect_list(struct(col("w"), col("c"))))
            .as("m"))
          .select(col("doc_id"),
            size(col("m")).cast("long").as("n_distinct_tokens"),
            coalesce(element_at(col("m"), "the"), lit(0L)).as("the_count"),
            coalesce(element_at(col("m"), "spark"), lit(0L)).as("spark_count"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                count(DISTINCT w) AS n_distinct_tokens,
                CAST(count(*) FILTER (WHERE w = 'the') AS BIGINT) AS the_count,
                CAST(count(*) FILTER (WHERE w = 'spark') AS BIGINT) AS spark_count
              FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                    FROM documents)
              GROUP BY doc_id ORDER BY doc_id""")),

    // one-row corpus report card — the health summary a pipeline run
    // logs before/after each stage: cardinalities, exact-dup mass, token
    // volume. Single scan, one aggregate; every field independently
    // replayable
    Q("q_corpus_report",
      (s, dir) => {
        val tk = split(trim(col("text")), "\\s+")
        t(s, dir, "documents").agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"),
          sum(size(tk)).cast("long").as("total_tokens"),
          round(avg(size(tk)), 2).as("avg_tokens"))
      },
      Some("""SELECT count(*) AS n_docs,
                count(DISTINCT lang) AS n_langs,
                count(DISTINCT source) AS n_sources,
                count(*) - count(DISTINCT md5(text)) AS n_exact_dups,
                CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
                  AS total_tokens,
                round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 2)
                  AS avg_tokens
              FROM documents""")),

    // the end-to-end cleaning recipe as one call: PII scrub → Gopher
    // gates → global line dedup → exact dedup → domain cap → one-row
    // report. The oracle replays every stage in one CTE chain (the scrub
    // as the chained regexp_replace prologue — identity on this PII-free
    // corpus, but the replay PROVES it, and n_pii_docs certifies the
    // zero; gates as list ops, line winners as the md5 window rank,
    // exact + cap as QUALIFY ranks)
    Q("q_corpus_pipeline",
      (s, dir) => graft.operators.CorpusPipeline.cleanReport(
        t(s, dir, "documents")),
      Some {
        val cls = Seq(
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
          "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
          "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>",
          "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
          "\\b\\d{13,16}\\b" -> "<CARD>")
        val scrubExpr = cls.foldLeft("text") { case (acc, (re, ph)) =>
          s"regexp_replace($acc, '$re', '$ph', 'g')" }
        val anyHit = cls.map { case (re, _) =>
          s"len(regexp_extract_all(text, '$re')) > 0" }.mkString(" OR ")
        s"""WITH sc AS (SELECT doc_id, $scrubExpr AS text, source,
                     CASE WHEN $anyHit THEN 1 ELSE 0 END AS pii
                   FROM documents),
              m AS (SELECT doc_id, text, source,
                     regexp_split_to_array(trim(text), '\\s+') AS t
                   FROM sc),
              gated AS (SELECT doc_id, text, source FROM m
                WHERE len(t) BETWEEN 50 AND 100000
                  AND round(list_sum(list_transform(t, w -> length(w)))
                        / CAST(len(t) AS DOUBLE), 4) BETWEEN 3.0 AND 10.0
                  AND round(((length(text) - length(replace(text, '#', ''))) +
                         (length(text) - length(replace(text, '...', ''))) / 3)
                        / CAST(len(t) AS DOUBLE), 4) <= 0.1
                  AND round(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
                        / CAST(len(t) AS DOUBLE), 4) >= 0.8
                  AND len(list_intersect(
                        list_distinct(list_transform(t, w -> lower(w))),
                        ['the','be','to','of','and','that','have','with'])) >= 1),
              gtk AS (SELECT doc_id, source, str_split(text, ' ') AS t FROM gated),
              lines AS (SELECT doc_id, source, CAST(i AS INT) AS line_idx,
                       array_to_string(t[(10 * i + 1):(10 * i + 10)], ' ') AS line
                FROM gtk, LATERAL unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT)))
                     AS r(i)),
              ranked AS (SELECT doc_id, source, line_idx, line,
                       row_number() OVER (PARTITION BY md5(line)
                                          ORDER BY doc_id, line_idx) AS rn
                FROM lines),
              rebuilt AS (SELECT doc_id, any_value(source) AS source,
                       coalesce(string_agg(line, chr(10) ORDER BY line_idx)
                                FILTER (WHERE rn = 1), '') AS text_dedup,
                       count(*) FILTER (WHERE rn = 1) AS n_kept
                FROM ranked GROUP BY doc_id),
              kept2 AS (SELECT doc_id, source, text_dedup FROM rebuilt
                        WHERE n_kept > 0),
              ex AS (SELECT * FROM kept2
                QUALIFY row_number() OVER (PARTITION BY md5(text_dedup)
                                           ORDER BY doc_id) = 1),
              capped AS (SELECT * FROM ex
                QUALIFY row_number() OVER (PARTITION BY source ORDER BY
                  ${graft.operators.PortableHash.duckSql(
                    "'domaincap:' || CAST(doc_id AS VARCHAR)")}, doc_id) <= 40)
              SELECT (SELECT count(*) FROM documents) AS n_input,
                (SELECT CAST(sum(pii) AS BIGINT) FROM sc) AS n_pii_docs,
                (SELECT count(*) FROM gated) AS n_quality,
                (SELECT count(*) FROM kept2) AS n_nonempty,
                (SELECT count(*) FROM ex) AS n_exact,
                (SELECT count(*) FROM capped) AS n_final,
                (SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\\s+')))
                   AS BIGINT) FROM documents) AS tokens_in,
                (SELECT CAST(sum(len(regexp_split_to_array(text_dedup, '\\s+')))
                   AS BIGINT) FROM capped) AS tokens_out"""
      }),

    Q("q_multimodal_binary_meta",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
          md5(col("text")).as("digest"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              md5(text) AS digest FROM documents ORDER BY doc_id""")),

    // -------------------------------------------- rows-only (no SQL oracle)
    // oracle replays the stopword-profile argmax: 5 scored rows per doc
    // (lateral VALUES join), argmax via row_number over (score DESC, code
    // DESC) — the DESC code tiebreak mirrors Spark's array_max on
    // struct(score, code)
    Q("q_langid",
      (s, dir) => TextAnalysis.languageId(t(s, dir, "documents"))
        .select("doc_id", "lang_pred", "lang_conf")
        .orderBy("doc_id"),
      Some("""WITH tk AS (
                SELECT doc_id, list_transform(
                  regexp_split_to_array(trim(text), '\s+'), w -> lower(w)) AS t
                FROM documents),
              s AS (
                SELECT doc_id, t, lang.code AS code,
                  CAST(len(list_filter(t, w -> list_contains(lang.words, w)))
                    AS DOUBLE) AS score
                FROM tk, (VALUES
                  ('en', ['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be']),
                  ('es', ['el','la','los','las','de','que','y','en','un','una','es','por','con','para','del','se','no','su']),
                  ('fr', ['le','la','les','de','des','et','en','un','une','est','que','pour','dans','qui','sur','au','pas','ne']),
                  ('de', ['der','die','das','und','in','den','von','zu','mit','sich','auf','ist','im','dem','nicht','ein','eine']),
                  ('it', ['il','la','di','che','e','un','una','per','in','non','sono','con','del','della','le','si','da'])
                ) AS lang(code, words)),
              best AS (
                SELECT doc_id, code, score, len(t) AS n
                FROM s QUALIFY row_number() OVER (
                  PARTITION BY doc_id ORDER BY score DESC, code DESC) = 1)
              SELECT doc_id,
                CASE WHEN score > 0 THEN code ELSE 'und' END AS lang_pred,
                round(score / greatest(n, 1), 4) AS lang_conf
              FROM best ORDER BY doc_id""")),

    // oracle recomputes the C4/Gopher-style heuristic; intermediates are
    // rounded to 4dp BEFORE the component scores, exactly as qualityScore
    // builds on qualityMetrics' rounded columns
    // Gopher hard-gate rule battery: every rule's flag + the keep verdict,
    // each metric recomputed independently by the oracle
    Q("q_gopher_filter",
      (s, dir) => TextAnalysis.gopherFilter(t(s, dir, "documents"))
        .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
          "alpha_word_ratio", "stop_hits", "ok_n_words", "ok_mean_len",
          "ok_symbols", "ok_alpha", "ok_stops", "keep")
        .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id, text,
                  regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents),
              v AS (
                SELECT doc_id,
                  CAST(len(t) AS INT) AS n_words,
                  round(list_sum(list_transform(t, w -> length(w)))
                        / CAST(len(t) AS DOUBLE), 4) AS mean_word_len,
                  round(((length(text) - length(replace(text, '#', ''))) +
                         (length(text) - length(replace(text, '...', ''))) / 3)
                        / CAST(len(t) AS DOUBLE), 4) AS symbol_ratio,
                  round(len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
                        / CAST(len(t) AS DOUBLE), 4) AS alpha_word_ratio,
                  CAST(len(list_intersect(
                    list_distinct(list_transform(t, w -> lower(w))),
                    ['the','be','to','of','and','that','have','with']))
                    AS INT) AS stop_hits
                FROM m)
              SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                alpha_word_ratio, stop_hits,
                n_words BETWEEN 50 AND 100000 AS ok_n_words,
                mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_len,
                symbol_ratio <= 0.1 AS ok_symbols,
                alpha_word_ratio >= 0.8 AS ok_alpha,
                stop_hits >= 2 AS ok_stops,
                (n_words BETWEEN 50 AND 100000) AND
                (mean_word_len BETWEEN 3.0 AND 10.0) AND
                (symbol_ratio <= 0.1) AND (alpha_word_ratio >= 0.8) AND
                (stop_hits >= 2) AS keep
              FROM v ORDER BY doc_id""")),

    Q("q_quality_score",
      (s, dir) => TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select("doc_id", "quality_score")
        .orderBy("doc_id"),
      Some("""WITH m AS (
                SELECT doc_id,
                  CAST(length(text) AS DOUBLE) AS n_char,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'],
                      lower(w)))) AS DOUBLE) AS stop
                FROM documents)
              SELECT doc_id, round((
                (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) +
                least(round(alpha/n_char,4)/0.6, 1.0) +
                least(round(stop/n_tok,4)/0.05, 1.0) +
                (CASE WHEN round((n_char-(n_tok-1))/n_tok,4) BETWEEN 2.0 AND 12.0
                 THEN 1.0 ELSE 0.0 END)
                )/4.0, 4) AS quality_score
              FROM m ORDER BY doc_id""")),

    // the rolling chain is the portable md5-60bit hash, so the oracle
    // replays it exactly: seed prepended as the list_reduce accumulator,
    // each step re-hashing "acc:token" (see TextAnalysis.fingerprint)
    Q("q_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(t(s, dir, "documents"))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(list_reduce(
                  list_prepend('1125899906842597',
                    regexp_split_to_array(trim(text), '\s+')),
                  (acc, t) -> CAST(CAST(('0x' || substr(md5(acc || ':' || t), 1, 15))
                    AS BIGINT) AS VARCHAR)) AS BIGINT) AS fingerprint
              FROM documents ORDER BY doc_id""")),

    // unigram-LM surprisal (perplexity-filter family); DuckDB replays the
    // model exactly — same tokenizer, same corpus totals, log2 both sides
    Q("q_unigram_ppl",
      (s, dir) => TextAnalysis.unigramSurprisal(t(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                FROM documents),
              freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
              total AS (SELECT sum(cnt) AS t FROM freq)
              SELECT doc_id,
                round(avg(-log2(CAST(cnt AS DOUBLE) / (SELECT t FROM total))), 4)
                  AS surprisal
              FROM tok JOIN freq USING (w)
              GROUP BY doc_id ORDER BY doc_id""")),

    // ORC source/sink roundtrip, driver-gated: write the documents table
    // as ORC, read it back through Spark's ORC reader, aggregate — the
    // oracle computes the same aggregate from the PARQUET truth, so any
    // roundtrip corruption (row loss, encoding drift, type mangling)
    // hash-mismatches. (spark-avro is not on the unmanaged classpath —
    // gated like Delta, COVERAGE §2a.)
    Q("q_orc_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val path = System.getProperty("java.io.tmpdir") +
          "/graft-orc-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        docs.write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            // content-sensitive, order-insensitive: xor of doc text hashes
            // (the repo's portable 60-bit family, so DuckDB re-derives it)
            sum(pmod(graft.operators.PortableHash.portable60(md5(col("text"))),
                lit(1000000007L)))
              .as("text_hash_sum"))
          .orderBy("lang")
      },
      Some(s"""SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(${graft.operators.PortableHash.duckSql("md5(text)")} % 1000000007) AS BIGINT)
                  AS text_hash_sum
              FROM documents GROUP BY lang ORDER BY lang""")),

    // JSONL source/sink roundtrip, driver-gated like q_orc_roundtrip: the
    // interchange format every corpus pipeline ingests. Spark writes the
    // documents table as JSON lines and reads it back WITH AN EXPLICIT
    // SCHEMA (schema inference at 100 TB is a full extra pass over the
    // data; pinning the schema also keeps doc_id a long instead of
    // inference's widest-match). Aggregate incl. the portable text-hash
    // sum mirrors the ORC entry, so row loss / field mangling / encoding
    // drift through the JSON writer+parser hash-mismatches vs the parquet
    // truth.
    Q("q_jsonl_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val path = System.getProperty("java.io.tmpdir") +
          "/graft-jsonl-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        docs.write.mode("overwrite").json(path)
        s.read.schema(docs.schema).json(path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(pmod(graft.operators.PortableHash.portable60(md5(col("text"))),
                lit(1000000007L)))
              .as("text_hash_sum"))
          .orderBy("lang")
      },
      Some(s"""SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(${graft.operators.PortableHash.duckSql("md5(text)")} % 1000000007) AS BIGINT)
                  AS text_hash_sum
              FROM documents GROUP BY lang ORDER BY lang""")),

    // corrupt-record QUARANTINE on JSONL ingest — the crawl-robustness
    // path the roundtrip entry can't show: every doc_id % 7 == 0 line is
    // deterministically truncated (a strict prefix of minified JSON is
    // never valid JSON), the PERMISSIVE read routes those lines whole
    // into _corrupt_record with null fields, and clean rows must STILL
    // hash-match the parquet truth (JSON escaping fidelity under real
    // breakage). Oracle derives both populations from the parquet truth.
    Q("q_jsonl_quarantine",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val path = System.getProperty("java.io.tmpdir") +
          "/graft-jsonlq-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        docs.select(col("doc_id"),
            to_json(struct(col("doc_id"), col("lang"), col("text"))).as("l"))
          .select(when(col("doc_id") % 7 === 0,
              expr("substring(l, 1, length(l) - 5)"))
            .otherwise(col("l")).as("value"))
          .write.mode("overwrite").text(path)
        s.read
          .schema("doc_id LONG, lang STRING, text STRING, _corrupt_record STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)
          .groupBy(coalesce(col("lang"), lit("__quarantined")).as("lang_grp"))
          .agg(count(lit(1)).as("n_docs"),
            sum(pmod(graft.operators.PortableHash.portable60(md5(col("text"))),
                lit(1000000007L)))
              .as("text_hash_sum"))
          .orderBy("lang_grp")
      },
      Some(s"""SELECT lang AS lang_grp, count(*) AS n_docs,
                CAST(sum(${graft.operators.PortableHash.duckSql("md5(text)")} % 1000000007) AS BIGINT)
                  AS text_hash_sum
              FROM documents WHERE doc_id % 7 <> 0 GROUP BY lang
              UNION ALL
              SELECT '__quarantined', count(*), CAST(NULL AS BIGINT)
              FROM documents WHERE doc_id % 7 = 0
              ORDER BY lang_grp""")),

    // CSV sink/source roundtrip, completing the interchange matrix
    // (parquet/ORC/JSONL/CSV): quoted-header write, explicit-schema read
    // (inference is an extra pass AND widens types), same portable
    // text-hash-sum aggregate vs the parquet truth — quoting/escaping
    // bugs on comma- or quote-bearing text hash-mismatch
    Q("q_csv_roundtrip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val path = System.getProperty("java.io.tmpdir") +
          "/graft-csv-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        docs.write.mode("overwrite").option("header", "true").csv(path)
        s.read.schema(docs.schema).option("header", "true").csv(path)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(pmod(graft.operators.PortableHash.portable60(md5(col("text"))),
                lit(1000000007L)))
              .as("text_hash_sum"))
          .orderBy("lang")
      },
      Some(s"""SELECT lang, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars,
                CAST(sum(${graft.operators.PortableHash.duckSql("md5(text)")} % 1000000007) AS BIGINT)
                  AS text_hash_sum
              FROM documents GROUP BY lang ORDER BY lang""")),

    // bigram Stupid-Backoff surprisal in the CCNet shape: model trains on
    // 80% of docs, scores ALL docs, so held-out docs exercise the real
    // backoff and OOV paths. The oracle replays counts, smoothing,
    // backoff, and the rounded average
    Q("q_bigram_ppl",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextAnalysis.bigramSurprisal(docs,
            docs.filter(col("doc_id") % 5 =!= 0))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                FROM documents),
              uni AS (SELECT w, count(*) AS wc FROM (
                  SELECT unnest(t) AS w FROM tk WHERE doc_id % 5 <> 0)
                GROUP BY w),
              tot AS (SELECT sum(wc) AS n, count(*) AS v FROM uni),
              bc AS (SELECT w1, w2, count(*) AS bc FROM (
                  SELECT unnest([{'a': t[i], 'b': t[i + 1]}
                                 for i in range(1, len(t))]) AS p
                  FROM tk WHERE doc_id % 5 <> 0) q(p),
                  LATERAL (SELECT p.a AS w1, p.b AS w2) s
                GROUP BY w1, w2),
              hd AS (SELECT doc_id,
                  -log2(CAST(COALESCE(uni.wc, 0) + 1 AS DOUBLE)
                        / ((SELECT n FROM tot) + (SELECT v FROM tot) + 1)) AS nll
                FROM (SELECT doc_id, t[1] AS w FROM tk) h
                LEFT JOIN uni ON uni.w = h.w),
              bgp AS (SELECT doc_id, p.a AS w1, p.b AS w2 FROM (
                  SELECT doc_id, unnest([{'a': t[i], 'b': t[i + 1]}
                                         for i in range(1, len(t))]) AS p
                  FROM tk)),
              ps AS (SELECT bgp.doc_id,
                  -log2(CASE WHEN bc.bc IS NOT NULL
                    THEN CAST(bc.bc AS DOUBLE) / u1.wc
                    ELSE 0.4 * CAST(COALESCE(u2.wc, 0) + 1 AS DOUBLE)
                         / ((SELECT n FROM tot) + (SELECT v FROM tot) + 1)
                    END) AS nll
                FROM bgp
                LEFT JOIN bc ON bc.w1 = bgp.w1 AND bc.w2 = bgp.w2
                LEFT JOIN uni u1 ON u1.w = bgp.w1
                LEFT JOIN uni u2 ON u2.w = bgp.w2)
              SELECT doc_id, round(avg(nll), 4) AS surprisal_bo
              FROM (SELECT * FROM hd UNION ALL SELECT * FROM ps)
              GROUP BY doc_id ORDER BY doc_id""")),

    // 0.5 is the realistic fuzzy-dedup operating point: auto-banding keeps
    // ≥95% band-collision recall at the threshold (0.2 would need the
    // degenerate r<2 banding — see Dedup.minHashLsh scaladoc). Portable
    // hash families, so the oracle replays the ENTIRE sketch path in
    // DuckDB: base md5-60bit shingle hashes, the literal affine
    // permutations, banding, the modular band chain, candidate collisions,
    // and the exact-Jaccard verify.
    Q("q_dedup_minhash",
      (s, dir) => Dedup.minHashLsh(t(s, dir, "documents"), threshold = 0.5,
        portable = true).orderBy("id_a", "id_b"),
      Some(minhashOracleSql(numHashes = 64, threshold = 0.5))),

    // LSH recall AUDIT as one driver-checked row (the accuracy-audit
    // convention of q_approx_distinct / q_decontaminate_bloom_fpr): exact
    // PPJoin pairs at t = 0.5 vs verified MinHash+LSH pairs at the same
    // threshold. Banding drops pairs BEFORE verification, so lsh_pairs ⊆
    // exact_pairs (modulo the documented ~1e-8 shingle-hash-family
    // collision noise) and recall = true_pos / exact_pairs measures
    // exactly what auto-banding's 95% design target promises. The oracle
    // replays BOTH chains — the full banding CTE stack and the exact
    // shingle-set join — and the division
    Q("q_lsh_recall_audit",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // each side feeds two consumers (count + the semi-join); both
        // operators persist their sketch/prefix internals, so the
        // recomputed final joins are cheap — no entry-level persist
        val e = Dedup.ngramJaccard(docs, threshold = 0.5).select("id_a", "id_b")
        val l = Dedup.minHashLsh(docs, threshold = 0.5, portable = true)
          .select("id_a", "id_b")
        e.agg(count(lit(1)).as("exact_pairs"))
          .crossJoin(l.agg(count(lit(1)).as("lsh_pairs")))
          .crossJoin(l.join(e, Seq("id_a", "id_b"), "left_semi")
            .agg(count(lit(1)).as("true_pos")))
          .withColumn("recall",
            round(col("true_pos").cast("double") / col("exact_pairs"), 4))
      },
      Some(s"""WITH ${minhashPairCtes(64, 0.5)},
              xtk AS (SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              xsh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s FROM xtk),
              xsz AS (SELECT id, len(s) AS sz FROM xsh),
              xp AS (SELECT id, unnest(s) AS g FROM xsh),
              xcommon AS (
                SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS DOUBLE) AS inter
                FROM xp a JOIN xp b ON a.g = b.g AND a.id < b.id
                GROUP BY 1, 2),
              exact AS (
                SELECT id_a, id_b FROM xcommon
                JOIN xsz sa ON sa.id = id_a JOIN xsz sb ON sb.id = id_b
                WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5)
              SELECT
                (SELECT count(*) FROM exact) AS exact_pairs,
                (SELECT count(*) FROM mh_pairs) AS lsh_pairs,
                (SELECT count(*) FROM mh_pairs SEMI JOIN exact USING (id_a, id_b))
                  AS true_pos,
                round(CAST((SELECT count(*) FROM mh_pairs SEMI JOIN exact
                    USING (id_a, id_b)) AS DOUBLE)
                  / (SELECT count(*) FROM exact), 4) AS recall""")),

    // portable token hashes (md5 top-64, two 32-bit halves) make the whole
    // path engine-replayable: the oracle recomputes per-bit majority votes,
    // packs the fingerprint with explicit two's-complement arithmetic
    // (DuckDB's << overflow-checks the sign bit), re-derives the pigeonhole
    // blocks, and verifies bit_count(xor) — identical pair set by
    // construction, not by luck
    Q("q_dedup_simhash",
      (s, dir) => Dedup.simHashPairs(t(s, dir, "documents"), maxHamming = 4,
        portable = true).orderBy("id_a", "id_b"),
      Some {
        // same block derivation as simHashPairs: chunks = maxHamming+1
        val chunks = 5
        val base = 64 / chunks
        val rem = 64 % chunks
        val offsets = (0 until chunks).scanLeft(0)((off, i) =>
          off + base + (if (i < rem) 1 else 0))
        val chunkRows = (0 until chunks).map { i =>
          val w = base + (if (i < rem) 1 else 0)
          s"(${offsets(i)}, ${(1L << w) - 1})"
        }.mkString(", ")
        s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
                FROM documents),
              th AS (SELECT id,
                  CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS hi,
                  CAST(('0x' || substr(md5(w), 9, 8)) AS BIGINT) AS lo
                FROM tok),
              bits AS (SELECT id, bb.b,
                  CASE WHEN bb.b < 32 THEN (lo >> bb.b) & 1
                       ELSE (hi >> (bb.b - 32)) & 1 END AS bit
                FROM th, (SELECT unnest(range(0, 64)) AS b) bb),
              agg AS (SELECT id, b, sum(bit) AS s1, count(*) AS n
                FROM bits GROUP BY id, b),
              halves AS (SELECT id,
                  sum(CASE WHEN 2 * s1 > n AND b >= 32
                    THEN CAST(1 AS BIGINT) << (b - 32) ELSE 0 END) AS vhi,
                  sum(CASE WHEN 2 * s1 > n AND b < 32
                    THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS vlo
                FROM agg GROUP BY id),
              fp AS (SELECT id,
                  -- sum() yields HUGEINT: cast back to BIGINT or xor/
                  -- bit_count would count 64 sign-extension bits
                  CAST((vhi - CASE WHEN vhi >= 2147483648 THEN 4294967296 ELSE 0 END)
                    * 4294967296 + vlo AS BIGINT) AS sh
                FROM halves),
              ck AS (SELECT id, sh, c.off AS chunk, (sh >> c.off) & c.mask AS cv
                FROM fp, (SELECT * FROM (VALUES $chunkRows) v(off, mask)) c),
              cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
                FROM ck a JOIN ck b
                ON a.chunk = b.chunk AND a.cv = b.cv AND a.id < b.id)
              SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 4
              ORDER BY id_a, id_b"""
      }),

    // exact-similarity dedup IS oracle-able (unlike the sketch-based ops):
    // DuckDB rebuilds the 3-gram shingle sets from strings and replays the
    // posting-list self-join; Spark's 64-bit shingle hashing collides with
    // probability ~1e-8 at this corpus size, so |∩| matches exactly
    Q("q_dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccard(t(s, dir, "documents"), threshold = 0.15)
        .orderBy("id_a", "id_b"),
      Some("""WITH tk AS (
                SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              sh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s
                FROM tk),
              sz AS (SELECT id, len(s) AS sz FROM sh),
              p AS (SELECT id, unnest(s) AS g FROM sh),
              common AS (
                SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS DOUBLE) AS inter
                FROM p a JOIN p b ON a.g = b.g AND a.id < b.id
                GROUP BY 1, 2)
              SELECT id_a, id_b,
                round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
              FROM common JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
              WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.15
              ORDER BY id_a, id_b""")),

    // asymmetric containment pairs (small-in-big subset detection). The
    // prefix candidate filter is lossless, so the oracle is plain brute
    // force: every pair's |∩|/|small| over distinct string trigrams
    Q("q_dedup_containment",
      (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), threshold = 0.3)
        .orderBy("id_small", "id_big"),
      Some("""WITH tk AS (
                SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              sh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s
                FROM tk),
              sz AS (SELECT id, len(s) AS sz FROM sh),
              p AS (SELECT id, unnest(s) AS g FROM sh),
              pairs AS (
                SELECT a.id AS id_small, b.id AS id_big, count(*) AS inter
                FROM p a JOIN p b ON a.g = b.g AND a.id <> b.id
                JOIN sz sa ON sa.id = a.id JOIN sz sb ON sb.id = b.id
                WHERE sa.sz < sb.sz OR (sa.sz = sb.sz AND a.id < b.id)
                GROUP BY 1, 2)
              SELECT id_small, id_big,
                round(inter / CAST(sa.sz AS DOUBLE), 4) AS containment
              FROM pairs JOIN sz sa ON sa.id = id_small
              WHERE round(inter / CAST(sa.sz AS DOUBLE), 4) >= 0.3
              ORDER BY id_small, id_big""")),

    // the PRODUCTION configuration of the same operator: the opt-in
    // candidate-volume ceiling (2e7) passes every driver scale (sf0.01
    // est 2.9e4, sf0.1 est 1.7e6 — Preflight tool reproduces both, 10×
    // headroom) and fail-fasts with a sized diagnosis at ×100 (MEASURED
    // est 1.69e8 — candidates grow linearly with the corpus here, and the
    // original 2e8 ceiling let the ×100 join burn a measured 218 s; a
    // ceiling prices what one node can chew, ~25 s at this join's
    // measured ~8e5 candidates/s). Gate is cost-only below the ceiling,
    // so the oracle is q_dedup_containment's brute force unchanged.
    Q("q_containment_gated",
      (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"),
          threshold = 0.3, maxExpectedCandidates = 2e7)
        .orderBy("id_small", "id_big"),
      Some("""WITH tk AS (
                SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              sh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s
                FROM tk),
              sz AS (SELECT id, len(s) AS sz FROM sh),
              p AS (SELECT id, unnest(s) AS g FROM sh),
              pairs AS (
                SELECT a.id AS id_small, b.id AS id_big, count(*) AS inter
                FROM p a JOIN p b ON a.g = b.g AND a.id <> b.id
                JOIN sz sa ON sa.id = a.id JOIN sz sb ON sb.id = b.id
                WHERE sa.sz < sb.sz OR (sa.sz = sb.sz AND a.id < b.id)
                GROUP BY 1, 2)
              SELECT id_small, id_big,
                round(inter / CAST(sa.sz AS DOUBLE), 4) AS containment
              FROM pairs JOIN sz sa ON sa.id = id_small
              WHERE round(inter / CAST(sa.sz AS DOUBLE), 4) >= 0.3
              ORDER BY id_small, id_big""")),

    // winnowing (MOSS) fingerprint selection: the oracle replays the
    // portable gram hashes and the window-min selection verbatim with
    // DuckDB list comprehensions (same short-doc clamps as the Spark
    // slices), so every selected fingerprint value is checked
    Q("q_winnow_fingerprint",
      (s, dir) => Dedup.winnowPostings(t(s, dir, "documents"))
        .select(col("id").as("doc_id"), col("fp"))
        .orderBy("doc_id", "fp"),
      Some(s"""WITH tk AS (
                SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              g AS (SELECT id,
                  [${graft.operators.PortableHash.duckSql(
                    "array_to_string(t[i:i+3], ' ')")}
                   FOR i IN range(1, greatest(len(t) - 3, 1) + 1)] AS gh
                FROM tk),
              win AS (SELECT id, list_sort(list_distinct(
                  [list_min(gh[j:j+7])
                   FOR j IN range(1, greatest(len(gh) - 7, 1) + 1)])) AS fps
                FROM g)
              SELECT id AS doc_id, unnest(fps) AS fp FROM win
              ORDER BY doc_id, fp""")),

    // MOSS near-dup pairs over the winnowed fingerprints: df-capped
    // (ubiquitous fingerprints dropped pre-join, the ngramJaccard.maxDf
    // policy) and df>=2-filtered; oracle replays selection, cap, and the
    // posting self-join
    Q("q_winnow_neardup",
      (s, dir) => Dedup.winnowNearDupPairs(t(s, dir, "documents"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH tk AS (
                SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              g AS (SELECT id,
                  [${graft.operators.PortableHash.duckSql(
                    "array_to_string(t[i:i+3], ' ')")}
                   FOR i IN range(1, greatest(len(t) - 3, 1) + 1)] AS gh
                FROM tk),
              win AS (SELECT id, list_sort(list_distinct(
                  [list_min(gh[j:j+7])
                   FOR j IN range(1, greatest(len(gh) - 7, 1) + 1)])) AS fps
                FROM g),
              fpx AS (SELECT id, unnest(fps) AS fp FROM win),
              keep AS (SELECT fp FROM fpx GROUP BY fp
                HAVING count(*) BETWEEN 2 AND 50),
              posting AS (SELECT id, fp FROM fpx SEMI JOIN keep USING (fp))
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
              FROM posting a JOIN posting b ON a.fp = b.fp AND a.id < b.id
              GROUP BY 1, 2 HAVING count(*) >= 2
              ORDER BY id_a, id_b""")),

    // winnow clusters: MOSS pairs fed through the min-label connected
    // components — the same (pairs → CC → singletons join back) reduction
    // the minhash cluster entries use, closing the winnowing family
    // (fingerprint → pairs → incremental → clusters). Oracle: winnow pair
    // chain + recursive-CTE transitive closure
    Q("q_winnow_clusters",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.winnowNearDupPairs(docs)
          .select(col("id_a"), col("id_b"))
        val comps = Dedup.connectedComponents(pairs)
        docs.select(col("doc_id").cast("long").as("id"))
          .join(comps, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("component"), col("id")).as("component"))
          .orderBy("component", "id")
      },
      Some(s"""WITH RECURSIVE tk AS (
                SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              g AS (SELECT id,
                  [${graft.operators.PortableHash.duckSql(
                    "array_to_string(t[i:i+3], ' ')")}
                   FOR i IN range(1, greatest(len(t) - 3, 1) + 1)] AS gh
                FROM tk),
              win AS (SELECT id, list_sort(list_distinct(
                  [list_min(gh[j:j+7])
                   FOR j IN range(1, greatest(len(gh) - 7, 1) + 1)])) AS fps
                FROM g),
              fpx AS (SELECT id, unnest(fps) AS fp FROM win),
              keep AS (SELECT fp FROM fpx GROUP BY fp
                HAVING count(*) BETWEEN 2 AND 50),
              posting AS (SELECT id, fp FROM fpx SEMI JOIN keep USING (fp)),
              prs AS (SELECT a.id AS id_a, b.id AS id_b
                FROM posting a JOIN posting b ON a.fp = b.fp AND a.id < b.id
                GROUP BY 1, 2 HAVING count(*) >= 2),
              edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                UNION SELECT id_b, id_a FROM prs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node)
              SELECT d.id AS id, coalesce(c.component, d.id) AS component
              FROM (SELECT CAST(doc_id AS BIGINT) AS id FROM documents) d
              LEFT JOIN comp c ON c.id = d.id
              ORDER BY component, id""")),

    // incremental winnow probe: re-crawl batch (ids +1000, every 3rd doc
    // truncated to its first half — the q_ingest_neardup fixture shape)
    // probed against the base corpus's PERSISTED fingerprint index. The
    // oracle rebuilds BOTH fingerprint sets (base + transformed batch),
    // the base-side df cap, and the probe join
    Q("q_winnow_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val base = Dedup.winnowPostings(docs)
        val newBatch = docs.select((col("doc_id") + 1000).as("doc_id"),
          when(col("doc_id") % 3 === 0,
            expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))"))
            .otherwise(col("text")).as("text"))
        Dedup.winnowIncremental(newBatch, base)
          .orderBy("new_id", "base_id")
      },
      Some(s"""WITH bt AS (
                SELECT CAST(doc_id AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents),
              bg AS (SELECT id,
                  [${graft.operators.PortableHash.duckSql(
                    "array_to_string(t[i:i+3], ' ')")}
                   FOR i IN range(1, greatest(len(t) - 3, 1) + 1)] AS gh
                FROM bt),
              bw AS (SELECT id, list_sort(list_distinct(
                  [list_min(gh[j:j+7])
                   FOR j IN range(1, greatest(len(gh) - 7, 1) + 1)])) AS fps
                FROM bg),
              bfp AS (SELECT id, unnest(fps) AS fp FROM bw),
              keep AS (SELECT fp FROM bfp GROUP BY fp HAVING count(*) <= 50),
              nt AS (SELECT CAST(doc_id + 1000 AS BIGINT) AS id,
                  regexp_split_to_array(lower(trim(
                    CASE WHEN doc_id % 3 = 0
                    THEN substring(text, 1, CAST(floor(length(text) / 2) AS INT))
                    ELSE text END)), '\\s+') AS t
                FROM documents),
              ng AS (SELECT id,
                  [${graft.operators.PortableHash.duckSql(
                    "array_to_string(t[i:i+3], ' ')")}
                   FOR i IN range(1, greatest(len(t) - 3, 1) + 1)] AS gh
                FROM nt),
              nw AS (SELECT id, list_sort(list_distinct(
                  [list_min(gh[j:j+7])
                   FOR j IN range(1, greatest(len(gh) - 7, 1) + 1)])) AS fps
                FROM ng),
              nfp AS (SELECT id, unnest(fps) AS fp FROM nw)
              SELECT n.id AS new_id, b.id AS base_id, count(*) AS shared
              FROM nfp n
              JOIN (SELECT id, fp FROM bfp SEMI JOIN keep USING (fp)) b
                ON n.fp = b.fp
              GROUP BY 1, 2 HAVING count(*) >= 2
              ORDER BY new_id, base_id""")),

    // exact repeated-span detection (substring-dedup primitive): oracle
    // rebuilds positional 5-gram strings with a lateral range unnest
    // (DuckDB slices are 1-based → pos - 1 aligns with posexplode)
    Q("q_repeated_spans",
      // the operator returns unsorted (no global range shuffle inside the
      // hot path); determinism for the compare lives here
      (s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"), n = 5)
        .orderBy("doc_id", "pos"),
      Some("""WITH tk AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              g AS (
                SELECT doc_id, r.pos, array_to_string(t[r.pos:r.pos+4], ' ') AS gram
                FROM tk, LATERAL unnest(range(1, len(t) - 3)) AS r(pos)),
              dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1)
              SELECT doc_id, CAST(g.pos - 1 AS INT) AS pos
              FROM g JOIN dup USING (gram)
              ORDER BY doc_id, pos""")),

    // portable sketch → oracle replays minhash pairs AND the connected-
    // components reduction (recursive-CTE transitive closure, min label)
    // span SURGERY made driver-visible (q_repeated_spans covers detection):
    // the oracle re-derives keepers (first occurrence per repeated gram),
    // the keeper-protected cut set, and REBUILDS the cut text per doc —
    // compared by md5 so document bodies stay out of the dump
    Q("q_repeated_cut",
      (s, dir) => Dedup.cutRepeatedSpans(t(s, dir, "documents"), n = 5)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("n_cut_tokens"), md5(col("text_cut")).as("digest"))
        .orderBy("doc_id"),
      Some(repeatedCutOracleSql(strict = false))),

    // strict mode driver-visible too: only a window's own canonical
    // occurrence shields its tokens (oracle keeper join adds the gram key)
    Q("q_repeated_cut_strict",
      (s, dir) => Dedup.cutRepeatedSpans(t(s, dir, "documents"), n = 5,
          strict = true)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("n_cut_tokens"), md5(col("text_cut")).as("digest"))
        .orderBy("doc_id"),
      Some(repeatedCutOracleSql(strict = true))),

    // the operator returns unsorted (a determinism sort inside it would be
    // a corpus-cardinality range shuffle on every composed call); the
    // row-by-row oracle compare gets its ordering HERE
    Q("q_dedup_clusters",
      (s, dir) => Dedup.fuzzyDedupClusters(t(s, dir, "documents"), threshold = 0.5,
        portable = true).orderBy("component", "id"),
      Some(minhashClustersOracleSql(numHashes = 64, threshold = 0.5))),

    // production keeper policy over the same clusters: keep each dup
    // group's BEST member (token count, id-min tiebreak) instead of its
    // smallest id — oracle replays clustering AND the argmax choice
    Q("q_dedup_keep_best",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val clusters = Dedup.fuzzyDedupClusters(docs, threshold = 0.5,
          portable = true)
        val quality = docs.select(col("doc_id").cast("long").as("id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("q"))
        Dedup.keepBest(clusters, quality).orderBy("component", "id")
      },
      Some(minhashKeepBestOracleSql(numHashes = 64, threshold = 0.5))),

    // soft-dedup policy over the same clusters: keep EVERY member at
    // weight 1/|cluster| (a 400-copy page contributes one doc of expected
    // mass; within-cluster variation survives) — oracle replays the
    // clustering, the component counts, and the 6-dp weight
    Q("q_dedup_cluster_weights",
      (s, dir) => Dedup.clusterWeights(
          Dedup.fuzzyDedupClusters(t(s, dir, "documents"), threshold = 0.5,
            portable = true))
        .orderBy("component", "id"),
      Some(minhashClusterWeightsOracleSql(numHashes = 64, threshold = 0.5))),

    // same clustering via large-star/small-star (O(log n) rounds) — labels
    // must equal q_dedup_clusters exactly (same independent oracle)
    Q("q_dedup_clusters_star",
      (s, dir) => Dedup.fuzzyDedupClusters(t(s, dir, "documents"), threshold = 0.5,
        useStar = true, portable = true).orderBy("component", "id"),
      Some(minhashClustersOracleSql(numHashes = 64, threshold = 0.5))),

    // the clustering path made oracle-able end-to-end: exact ngram-Jaccard
    // pairs (deterministic, no sketch seeds) fed through the same
    // large-star/small-star CC the fuzzy path uses, checked against a
    // DuckDB recursive-CTE transitive closure with min-label reduction
    Q("q_dedup_clusters_exact",
      (s, dir) => Dedup.connectedComponentsStar(
          Dedup.ngramJaccard(t(s, dir, "documents"), threshold = 0.15))
        .orderBy("id"),
      Some("""WITH RECURSIVE tk AS (
                SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              sh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s
                FROM tk),
              sz AS (SELECT id, len(s) AS sz FROM sh),
              p AS (SELECT id, unnest(s) AS g FROM sh),
              common AS (
                SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS DOUBLE) AS inter
                FROM p a JOIN p b ON a.g = b.g AND a.id < b.id
                GROUP BY 1, 2),
              pairs AS (
                SELECT id_a, id_b
                FROM common JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
                WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.15),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
              SELECT node AS id, min(lbl) AS component
              FROM reach GROUP BY node ORDER BY id""")),

    // the candidate-bound regime's documented escape hatch, driver-visible
    // (BENCH_SF10.md note 2): at t = 0.15 the All-Pairs prefix keeps ~85%
    // of each posting list and candidate volume is Σ df² — dominated by
    // the df head. maxDf REMOVES ubiquitous shingles from the sets before
    // similarity (deterministic, so the oracle replays it: df ≤ 4 keeps
    // every planted dup pair, whose shared grams ride at df 2, while the
    // loose transitive tail that only overlapped on common grams drops).
    Q("q_dedup_clusters_maxdf",
      (s, dir) => Dedup.connectedComponentsStar(
          Dedup.ngramJaccard(t(s, dir, "documents"), threshold = 0.15, maxDf = 4))
        .orderBy("id"),
      Some("""WITH RECURSIVE tk AS (
                SELECT doc_id AS id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents),
              sh AS (SELECT id, list_distinct(
                  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                  ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t)-1)]
                  END) AS s
                FROM tk),
              p0 AS (SELECT id, unnest(s) AS g FROM sh),
              gdf AS (SELECT g, count(*) AS df FROM p0 GROUP BY g),
              p AS (SELECT p0.id, p0.g FROM p0 JOIN gdf USING (g)
                WHERE df <= 4),
              sz AS (SELECT id, count(*) AS sz FROM p GROUP BY id),
              common AS (
                SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS DOUBLE) AS inter
                FROM p a JOIN p b ON a.g = b.g AND a.id < b.id
                GROUP BY 1, 2),
              pairs AS (
                SELECT id_a, id_b
                FROM common JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
                WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.15),
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
              SELECT node AS id, min(lbl) AS component
              FROM reach GROUP BY node ORDER BY id""")),

    // incremental ingest dedup: a simulated re-crawl batch (ids shifted by
    // 1000; every 3rd doc edited) anti-joined against the existing corpus
    // on text digest — only the edited docs survive
    Q("q_dedup_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val newBatch = docs.select(
          (col("doc_id") + 1000).as("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        Dedup.incrementalExact(newBatch, docs)
          .select("doc_id").orderBy("doc_id")
      },
      Some("""WITH newb AS (
                SELECT doc_id + 1000 AS doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
                FROM documents)
              SELECT n.doc_id FROM newb n
              ANTI JOIN documents o ON md5(n.text) = md5(o.text)
              ORDER BY doc_id""")),

    // incremental NEAR-dup ingest: the re-crawl batch (ids +1000; every
    // 3rd doc truncated to its first half, Jaccard ~1/3) probed against
    // the base corpus's PERSISTED minhash sketch table — unchanged docs
    // are near-dups (est 1.0, dropped), truncated ones fall under the 0.5
    // cut and survive. Base text is never rescanned (the sketch table has
    // no text column).
    Q("q_dedup_incr_fuzzy",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val newBatch = docs.select(
          (col("doc_id") + 1000).as("doc_id"),
          when(col("doc_id") % 3 === 0,
            expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))"))
            .otherwise(col("text")).as("text"))
        val baseSketches = Dedup.minHashSketchTable(docs, portable = true)
        Dedup.incrementalMinHash(newBatch, baseSketches, portable = true)
          .select(col("doc_id").cast("long").as("doc_id")).orderBy("doc_id")
      },
      Some(incrMinhashOracleSql(numHashes = 64, threshold = 0.5))),

    // ONE streaming-ingest foreachBatch round, batch-shaped so the driver's
    // oracle covers the streaming dedup path's arithmetic end-to-end
    // (CorpusIngest composes exactly these operators per micro-batch; the
    // MemoryStream e2e is spec'd in CorpusIngestSpec). The batch: every doc
    // re-crawled (ids +1000, every 3rd truncated to its first half), plus
    // an in-batch NEAR-dup of each truncated doc (ids +2000, one appended
    // token), plus an in-batch EXACT dup of every 5th (ids +3000). Stages:
    // within-batch exact dedup → digest probe vs base (drops unchanged
    // re-crawls) → within-batch near-dup prune (LSH pairs → CC → min-id
    // representative) → sketch-table probe vs base (truncated docs at
    // J≈1/3 survive the 0.5 cut).
    Q("q_ingest_neardup",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val half = expr("substring(text, 1, CAST(floor(length(text) / 2) AS INT))")
        val a = docs.select((col("doc_id") + 1000).as("doc_id"),
          when(col("doc_id") % 3 === 0, half).otherwise(col("text")).as("text"))
        val batch = a
          .unionByName(a.filter((col("doc_id") - 1000) % 3 === 0)
            .select((col("doc_id") + 1000).as("doc_id"),
              concat(col("text"), lit(" nearvar")).as("text")))
          .unionByName(a.filter((col("doc_id") - 1000) % 5 === 0)
            .select((col("doc_id") + 2000).as("doc_id"), col("text")))
        val fresh = Dedup.exact(batch)
        // lineage cut after the exact stages, exactly like the real
        // foreachBatch round (whose batch arrives as concrete blocks): the
        // synthesized union+dedup+anti plan otherwise rides into every
        // downstream consumer — the in-batch LSH, the CC rounds, the
        // sketch probe, the final anti-join — and Catalyst re-analysis of
        // the fanned-out tree dominates wall time (driver-side, data-
        // independent: measured ~18 s at sf0.1 AND sf1 before the cut)
        val exactNovel = Dedup.incrementalExactByDigest(fresh,
          docs.select(md5(col("text")).as("digest"))).localCheckpoint()
        val pairs = Dedup.minHashLsh(exactNovel, threshold = 0.5, portable = true)
        val losers = Dedup.connectedComponents(pairs)
          .filter(col("id") =!= col("component"))
          .select(col("id").as("__graft_nd"))
        val inBatch = exactNovel.join(losers,
          exactNovel("doc_id").cast("long") === col("__graft_nd"), "left_anti")
          .localCheckpoint()
        val baseSk = Dedup.minHashSketchTable(docs, portable = true)
        Dedup.incrementalMinHash(inBatch, baseSk, portable = true)
          .select(col("doc_id").cast("long").as("doc_id")).orderBy("doc_id")
      },
      Some(ingestNeardupOracleSql(numHashes = 64, threshold = 0.5))),

    // BPE merge training (Sennrich'16): 8 rounds over the word-frequency
    // table. The oracle unrolls every round — weighted pair counts,
    // argmax (cnt DESC, a, b), and the greedy left-to-right APPLY via the
    // window-parity closed form (consecutive-match runs merge at offsets
    // 0, 2, 4…) — cross-checking the Spark side's per-word left fold:
    // two independent derivations of the same greedy rule must agree on
    // every merge of every round
    Q("q_bpe_merges",
      (s, dir) => TextAnalysis.bpeTrain(t(s, dir, "documents"), nMerges = 8)
        .orderBy("round"),
      Some {
        val out = (1 to 8).map(r =>
          s"SELECT CAST($r AS INT) AS round, a AS sym_a, b AS sym_b, " +
            s"a || b AS merged, cnt AS pair_count FROM m$r")
          .mkString("\n              UNION ALL ")
        s"""WITH ${bpeChainCtes(8)}
              $out
              ORDER BY round"""
      }),

    // batched BPE (top-k non-conflicting merges per round — the
    // distributed-trainer shape; 3 rounds x batchK 4 covers ground the
    // sequential entry needs 8+ driver-paced rounds for). The oracle
    // replays the batch rule itself: ranked top-k, one-shot conflict
    // rejection, simultaneous round-start apply
    Q("q_bpe_batched",
      (s, dir) => TextAnalysis.bpeTrainBatched(t(s, dir, "documents"),
          rounds = 3, batchK = 4)
        .orderBy("round", "rank"),
      Some {
        val out = (1 to 3).map(r =>
          s"SELECT CAST($r AS INT) AS round, CAST(rank AS INT) AS rank, " +
            s"a AS sym_a, b AS sym_b, a || b AS merged, cnt AS pair_count " +
            s"FROM acc$r")
          .mkString("\n              UNION ALL ")
        s"""WITH ${bpeBatchChainCtes(3, 4)}
              $out
              ORDER BY round, rank"""
      }),

    // BPE ENCODE under the trained merges — the tokenizer's other half:
    // per-doc subword counts. Spark trains (collecting the 8-row merge
    // table) then applies the ranked merges once per DISTINCT word and
    // joins tokens against the (word → n_pieces) table; the oracle reuses
    // the SAME training chain and reads n_pieces as len(v8.s)
    Q("q_bpe_token_counts",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val merges = TextAnalysis.bpeTrain(docs, nMerges = 8)
          .orderBy("round").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextAnalysis.bpeTokenCounts(docs, merges = merges)
          .orderBy("doc_id")
      },
      Some(s"""WITH ${bpeChainCtes(8)},
              pieces AS (SELECT w, CAST(len(s) AS BIGINT) AS n_pieces FROM v8),
              tok AS (SELECT doc_id,
                  unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
                FROM documents)
              SELECT doc_id, count(*) AS n_ws_tokens,
                CAST(sum(n_pieces) AS BIGINT) AS n_bpe_tokens
              FROM tok JOIN pieces USING (w)
              GROUP BY doc_id ORDER BY doc_id""")),

    // PageRank over the customer↔supplier co-order graph (symmetrized
    // bipartite: node = 2·custkey / 2·suppkey+1), 8 power iterations at
    // damping 0.85. Every iteration ends on the 7-dp grid (the k-means
    // float boundary), so the oracle replays the ENTIRE iteration as 8
    // chained CTEs — every literal is CAST to DOUBLE first (DuckDB parses
    // bare 0.85 as DECIMAL; 1 - 0.85 must be the IEEE subtraction Spark
    // performs, not an exact decimal 0.15)
    Q("q_pagerank",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.pageRank(edges, iterations = 8)
          .orderBy("node")
      },
      Some(pagerankOracleSql)),

    // the BUDGET-GATED configuration of the same pageRank: the caller
    // supplies the cheap edge upper bound (2·|lineitem| — one parquet
    // metadata count, every lineitem row contributes at most one
    // symmetrized pair each way), so the rounds×edges pre-flight is pure
    // driver arithmetic. Ceiling 3e9 passes every driver scale
    // (sf0.1 est 9.6e6, ×100 est 9.6e8) and fail-fasts in milliseconds
    // at ×1000 (est 9.6e9) — the sized diagnosis that replaces
    // BENCH_SF10 addendum 40's 58-minute silent timeout. Gate is
    // cost-only below the ceiling: identical results, same oracle.
    Q("q_pagerank_gated",
      (s, dir) => {
        val liT = t(s, dir, "lineitem")
        val li = liT.select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.pageRank(edges, iterations = 8,
            maxEdgeScanRows = 3e9, estimatedEdges = Some(2L * liT.count()))
          .orderBy("node")
      },
      Some(pagerankOracleSql)),

    // synchronous label propagation over the same co-order graph: 4 fixed
    // rounds, majority label with min-label ties — integer state, so the
    // oracle unrolls the rounds with no float grid at all
    // deterministic negative sampling for link prediction: per node, 3
    // hash-drawn non-edges (real-node semi-join, edge anti-join, first-3
    // in draw order) — the oracle replays every md5 draw, both joins,
    // and the windowed cut
    Q("q_negative_samples",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.negativeSamples(edges, k = 3)
          .orderBy("src", "draw")
      },
      Some(s"""WITH pairs AS MATERIALIZED (
                SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                  SELECT src, dst FROM pairs
                  UNION ALL SELECT dst AS src, src AS dst FROM pairs)),
              nodes AS MATERIALIZED (
                SELECT DISTINCT src AS node FROM edges
                UNION SELECT DISTINCT dst FROM edges),
              mx AS (SELECT max(node) AS mx FROM nodes),
              cand AS (SELECT n.node AS src, r.j,
                  ${graft.operators.PortableHash.duckSql(
                    "'negs:' || n.node || ':' || r.j")} % (mx.mx + 1) AS dst
                FROM nodes n, range(9) r(j), mx),
              ok AS (SELECT src, dst, j FROM cand
                WHERE dst <> src AND dst IN (SELECT node FROM nodes)
                  AND NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.src = cand.src AND e.dst = cand.dst))
              SELECT src, dst AS neg_dst, j AS draw FROM ok
              QUALIFY row_number() OVER (PARTITION BY src ORDER BY j) <= 3
              ORDER BY src, draw""")),

    // user-journey path mining: each user's first-4-event-type prefix
    // (deterministic (ts, event_id) order), top-10 paths by user count —
    // the onboarding/funnel-shape probe beside q_funnel/q_event_transitions.
    // One window shuffle + two partial-aggregable counts; the path string
    // is assembled from a sorted struct array, never an unordered
    // collect_list
    Q("q_user_paths",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy("user_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_users"))
          .orderBy(col("n_users").desc, col("path"))
          .limit(10)
      },
      Some("""WITH r AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS rn
                FROM events),
              p AS (SELECT user_id,
                  string_agg(event_type, '>' ORDER BY rn) AS path
                FROM r WHERE rn <= 4 GROUP BY user_id)
              SELECT path, count(*) AS n_users FROM p GROUP BY path
              ORDER BY n_users DESC, path LIMIT 10""")),

    // multi-source BFS over the same customer-supplier graph: hop
    // distance to the nearest of the two smallest landmark nodes, 4
    // fixed rounds — the oracle unrolls frontier/visited CTEs
    // (MATERIALIZED, the kCore lesson) and must agree node-for-node
    Q("q_graph_bfs",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        val landmarks = edges.select(col("src").as("node"))
          .distinct().orderBy("node").limit(2)
        graft.operators.GraphRank.multiSourceBfs(edges, landmarks, maxHops = 4)
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 4).map { h =>
          s"""f$h AS MATERIALIZED (SELECT DISTINCT e.dst AS node
                FROM edges e JOIN f${h - 1} f ON f.node = e.src
                WHERE e.dst NOT IN (SELECT node FROM d${h - 1})),
              d$h AS MATERIALIZED (SELECT * FROM d${h - 1}
                UNION ALL SELECT node, $h AS dist FROM f$h)"""
        }.mkString(",\n              ")
        s"""WITH pairs AS MATERIALIZED (
                SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                  SELECT src, dst FROM pairs
                  UNION ALL SELECT dst AS src, src AS dst FROM pairs)),
              srcs AS MATERIALIZED (SELECT DISTINCT src AS node
                FROM edges ORDER BY node LIMIT 2),
              d0 AS MATERIALIZED (SELECT node, 0 AS dist FROM srcs),
              f0 AS MATERIALIZED (SELECT node FROM srcs),
              $rounds
              SELECT node, dist FROM d4 ORDER BY node"""
      }),

    Q("q_label_propagation",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.labelPropagation(edges, iterations = 4)
          .orderBy("node")
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""l$i AS (SELECT node, label FROM (
                SELECT e.dst AS node, l.label, count(*) AS c,
                  row_number() OVER (PARTITION BY e.dst
                    ORDER BY count(*) DESC, l.label) AS rn
                FROM edges e JOIN l${i - 1} l ON l.node = e.src
                GROUP BY e.dst, l.label) WHERE rn = 1)"""
        }.mkString(",\n              ")
        s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                UNION SELECT dst AS src, src AS dst FROM e0),
              l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
              $iters
              SELECT node, label FROM l4 ORDER BY node"""
      }),

    // exact triangle count on the part co-occurrence graph (parts sharing
    // an order), via degree-ordered relabeling — the oracle replays the
    // rank, the oriented edge set, and the wedge-close joins
    Q("q_graph_triangles",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        graft.operators.GraphRank.triangleCount(pairs)
      },
      Some("""WITH und AS (SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS a,
                     CAST(y.l_partkey AS BIGINT) AS b
                   FROM lineitem x JOIN lineitem y
                     ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              deg AS (SELECT n, count(*) AS deg FROM (
                  SELECT a AS n FROM und UNION ALL SELECT b FROM und)
                GROUP BY n),
              rk AS (SELECT n, row_number() OVER (ORDER BY deg, n) AS rk FROM deg),
              er AS (SELECT least(ra.rk, rb.rk) AS lo, greatest(ra.rk, rb.rk) AS hi
                     FROM und JOIN rk ra ON ra.n = und.a
                     JOIN rk rb ON rb.n = und.b)
              SELECT (SELECT count(*) FROM deg) AS n_nodes,
                (SELECT count(*) FROM und) AS n_edges,
                (SELECT count(*) FROM er e1
                 JOIN er e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
                 JOIN er e3 ON e3.lo = e1.hi AND e3.hi = e2.hi) AS n_triangles""")),

    // The hub-capped variant — the Σfwd² lever the exact entry's notes
    // name, implemented: nodes above the exact p90 degree quantile are
    // removed (deterministic reduced-graph semantics, the triangle twin
    // of ngramJaccard.maxDf), and the result row carries the applied cap
    // + hub count so the reduction is auditable. The oracle replays the
    // quantile (6-dp grid, the winsorize-fence convention), the node cut,
    // the within-reduced-graph re-rank, and both joins.
    Q("q_graph_triangles_capped",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        graft.operators.GraphRank.triangleCountCapped(pairs, 0.9)
      },
      Some("""WITH und AS (SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS a,
                     CAST(y.l_partkey AS BIGINT) AS b
                   FROM lineitem x JOIN lineitem y
                     ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              deg AS (SELECT n, count(*) AS deg FROM (
                  SELECT a AS n FROM und UNION ALL SELECT b FROM und)
                GROUP BY n),
              cap AS (SELECT round(quantile_cont(deg, 0.9), 6) AS c FROM deg),
              keep AS (SELECT n FROM deg, cap WHERE deg <= c),
              und2 AS (SELECT a, b FROM und
                       WHERE a IN (SELECT n FROM keep)
                         AND b IN (SELECT n FROM keep)),
              deg2 AS (SELECT n, count(*) AS deg FROM (
                  SELECT a AS n FROM und2 UNION ALL SELECT b FROM und2)
                GROUP BY n),
              rk AS (SELECT n, row_number() OVER (ORDER BY deg, n) AS rk FROM deg2),
              er AS (SELECT least(ra.rk, rb.rk) AS lo, greatest(ra.rk, rb.rk) AS hi
                     FROM und2 JOIN rk ra ON ra.n = und2.a
                     JOIN rk rb ON rb.n = und2.b)
              SELECT (SELECT count(*) FROM deg2) AS n_nodes,
                (SELECT count(*) FROM und2) AS n_edges,
                (SELECT count(*) FROM er e1
                 JOIN er e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
                 JOIN er e3 ON e3.lo = e1.hi AND e3.hi = e2.hi) AS n_triangles,
                (SELECT c FROM cap) AS deg_cap,
                (SELECT count(*) FROM deg, cap WHERE deg > c)
                  AS n_hubs_dropped""")),

    // k-core of the part co-occurrence graph (k = 80 sits inside the
    // fixture's peeling band: 6 rounds, 1,857 of 2,000 nodes survive —
    // k ≤ 70 barely peels, k ≥ 85 collapses the whole graph; the sharp
    // transition is characteristic of quasi-random dense graphs). The
    // operator requires convergence within maxIter; the oracle unrolls 8
    // rounds (≥ the 6 needed — extra rounds are fixpoint no-ops)
    Q("q_graph_kcore",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
        graft.operators.GraphRank.kCore(pairs, k = 80, maxIter = 8)
          .orderBy("node")
      },
      Some {
        // MATERIALIZED is load-bearing: each round references the previous
        // edge CTE three times, so default CTE inlining re-expands the
        // whole chain 3^8 ways (DuckDB dies on file handles before it
        // finishes planning) — the same blowup the Spark side lineage-cuts
        val rounds = (1 to 8).map { i =>
          s"""k$i AS MATERIALIZED (SELECT n, count(*) AS deg FROM (
                  SELECT a AS n FROM e${i - 1}
                  UNION ALL SELECT b FROM e${i - 1}) GROUP BY n
                HAVING count(*) >= 80),
              e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
                WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
        }.mkString(",\n              ")
        s"""WITH e0 AS MATERIALIZED (
                SELECT DISTINCT CAST(x.l_partkey AS BIGINT) AS a,
                  CAST(y.l_partkey AS BIGINT) AS b
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
              $rounds
              SELECT n AS node, deg FROM k8 ORDER BY node"""
      }),

    // bigram PMI collocations (multiword-unit mining): oracle rebuilds the
    // adjacent-pair stream, both frequency tables, and the log2 ratio —
    // count rationals divide to identical doubles in both engines, and the
    // rank ties on the ROUNDED pmi break on the words
    Q("q_pmi_collocations",
      (s, dir) => TextAnalysis.collocations(t(s, dir, "documents"), minCount = 5L),
      Some("""WITH tk AS (SELECT
                  regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM documents),
              uni AS (SELECT w, count(*) AS wc
                FROM (SELECT unnest(t) AS w FROM tk) u GROUP BY w),
              tu AS (SELECT CAST(sum(wc) AS DOUBLE) AS tu FROM uni),
              bg AS (SELECT t[r.i] AS w1, t[r.i + 1] AS w2
                FROM tk, LATERAL unnest(range(1, len(t))) AS r(i)),
              ba AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY w1, w2),
              tb AS (SELECT CAST(sum(bc) AS DOUBLE) AS tb FROM ba),
              big AS (SELECT * FROM ba WHERE bc >= 5)
              SELECT w1, w2, bc,
                -- + 0.0 canonicalizes IEEE negative zero (round of a tiny
                -- negative PMI yields -0.0 here but 0.0 in Spark)
                round(log2((bc / tb.tb) /
                  ((u1.wc / tu.tu) * (u2.wc / tu.tu))), 4) + 0.0 AS pmi
              FROM big
              JOIN uni u1 ON u1.w = big.w1
              JOIN uni u2 ON u2.w = big.w2, tu, tb
              ORDER BY pmi DESC, w1, w2""")),

    // TF-IDF: highest-salience tokens by average tf-idf across the corpus
    // ordering is on the ROUNDED score: raw float averages differ in ulps
    // between engines (summation order), which would flip near-equal ranks
    Q("q_tfidf",
      (s, dir) => TextAnalysis.tfidf(t(s, dir, "documents"))
        .groupBy("tok", "df").agg(round(avg("tfidf"), 4).as("tfidf"))
        .orderBy(col("tfidf").desc, col("tok"))
        .limit(15)
        .select("tok", "df", "tfidf"),
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
              tf AS (
                SELECT doc_id, tok, count(*) AS tf FROM toks
                WHERE tok <> '' GROUP BY doc_id, tok),
              dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
              n AS (SELECT count(*) AS n FROM documents)
              SELECT tok, df, round(avg(tf * ln((n.n + 1.0) / (df + 1.0))), 4) AS tfidf
              FROM tf JOIN dfreq USING (tok) CROSS JOIN n
              GROUP BY tok, df, n.n
              ORDER BY tfidf DESC, tok
              LIMIT 15""")),

    // context-window chunking: fixed 64-token windows, 16-token overlap;
    // chunk text compared verbatim against DuckDB's list-slice rebuild
    Q("q_doc_chunks",
      (s, dir) => TextAnalysis.chunk(t(s, dir, "documents"),
          chunkTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents),
              ex AS (
                SELECT doc_id, t,
                  unnest(generate_series(0,
                    CASE WHEN len(t) <= 64 THEN 0
                         ELSE CAST(ceil((len(t) - 64) / 48.0) AS INT) END)) AS ci
                FROM tk)
              SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
                array_to_string(t[ci*48+1 : ci*48+64], ' ') AS chunk_text,
                CAST(least(64, len(t) - ci*48) AS INT) AS n_chunk_tokens
              FROM ex ORDER BY doc_id, chunk_idx""")),

    // content-defined chunking (round 8): boundaries from LOCAL window
    // hashes (portable60 % 32 == 0), so edits re-chunk only their own
    // neighborhood — the dedup-stable alternative to q_doc_chunks' fixed
    // windows. The oracle re-derives every cut position, start/end pair,
    // and chunk slice in SQL; md5 keeps both engines on the same cuts.
    Q("q_doc_chunks_cdc",
      (s, dir) => TextAnalysis.chunkCdc(t(s, dir, "documents"),
          k = 3, divisor = 32)
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                FROM documents),
              cu AS (SELECT doc_id, t,
                  [i FOR i IN range(1, len(t) + 1)
                   IF i >= 3 AND i < len(t) AND
                     ${graft.operators.PortableHash.duckSql(
                       "array_to_string(t[i-2:i], ' ')")} % 32 = 0] AS cuts
                FROM tk),
              se AS (SELECT doc_id, t,
                  list_prepend(1, list_transform(cuts, c -> c + 1)) AS starts,
                  list_append(cuts, len(t)) AS ends
                FROM cu),
              ch AS (SELECT doc_id,
                  unnest(range(1, len(starts) + 1)) AS pos1,
                  t, starts, ends
                FROM se)
              SELECT doc_id, CAST(pos1 - 1 AS INT) AS chunk_idx,
                array_to_string(t[starts[pos1]:ends[pos1]], ' ') AS chunk_text,
                CAST(ends[pos1] - starts[pos1] + 1 AS INT) AS n_chunk_tokens
              FROM ch ORDER BY doc_id, chunk_idx""")),

    // the CDC payoff as a driver-gated number (round 8): chunk the corpus
    // and a simulated re-crawl (every 3rd doc gets a prepended edit),
    // digest the chunks, and count how many edited-crawl chunks already
    // exist in the base crawl — cross-crawl chunk dedup. CDC boundaries
    // are edit-local, so only the edited docs' FIRST chunks churn; fixed
    // windows shift every boundary after the edit, so every chunk of an
    // edited doc re-uploads. One row, both methods, same oracle.
    Q("q_chunk_reuse_cdc",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val edited = docs.select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit("edited crawl marker "), col("text")))
            .otherwise(col("text")).as("text"))
        TextAnalysis.chunkReuseStats(docs, edited, k = 3, divisor = 32,
          fixedTokens = 32)
      },
      Some(s"""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                FROM documents),
              tk2 AS (
                SELECT doc_id, string_split_regex(trim(
                  CASE WHEN doc_id % 3 = 0 THEN 'edited crawl marker ' || text
                  ELSE text END), '\\s+') AS t
                FROM documents),
              cdc1 AS (SELECT doc_id, t,
                  [i FOR i IN range(1, len(t) + 1)
                   IF i >= 3 AND i < len(t) AND
                     ${graft.operators.PortableHash.duckSql(
                       "array_to_string(t[i-2:i], ' ')")} % 32 = 0] AS cuts
                FROM tk),
              cdc2 AS (SELECT doc_id, t,
                  [i FOR i IN range(1, len(t) + 1)
                   IF i >= 3 AND i < len(t) AND
                     ${graft.operators.PortableHash.duckSql(
                       "array_to_string(t[i-2:i], ' ')")} % 32 = 0] AS cuts
                FROM tk2),
              b AS (SELECT md5(array_to_string(
                    t[list_prepend(1, list_transform(cuts, c -> c + 1))[p]
                      : list_append(cuts, len(t))[p]], ' ')) AS dg
                FROM (SELECT *, unnest(range(1, len(cuts) + 2)) AS p FROM cdc1)),
              e AS (SELECT md5(array_to_string(
                    t[list_prepend(1, list_transform(cuts, c -> c + 1))[p]
                      : list_append(cuts, len(t))[p]], ' ')) AS dg
                FROM (SELECT *, unnest(range(1, len(cuts) + 2)) AS p FROM cdc2)),
              fb AS (SELECT md5(array_to_string(t[ci*32+1 : ci*32+32], ' ')) AS dg
                FROM (SELECT doc_id, t, unnest(generate_series(0,
                    CASE WHEN len(t) <= 32 THEN 0
                         ELSE CAST(ceil((len(t) - 32) / 32.0) AS INT) END)) AS ci
                  FROM tk)),
              fe AS (SELECT md5(array_to_string(t[ci*32+1 : ci*32+32], ' ')) AS dg
                FROM (SELECT doc_id, t, unnest(generate_series(0,
                    CASE WHEN len(t) <= 32 THEN 0
                         ELSE CAST(ceil((len(t) - 32) / 32.0) AS INT) END)) AS ci
                  FROM tk2))
              SELECT (SELECT count(*) FROM b) AS n_base_chunks,
                (SELECT count(*) FROM e) AS n_edited_chunks,
                (SELECT count(*) FROM e WHERE dg IN (SELECT dg FROM b)) AS n_reused_cdc,
                (SELECT count(*) FROM fe WHERE dg IN (SELECT dg FROM fb)) AS n_reused_fixed""")),

    // benchmark decontamination: every 20th doc plays the eval set; corpus
    // docs sharing >=1 distinct 5-gram with it are flagged with hit counts
    Q("q_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.decontaminate(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0),
            n = 5)
          .orderBy("id")
      },
      Some("""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                FROM documents),
              gr AS (
                SELECT doc_id,
                  unnest([array_to_string(t[i:i+4], ' ')
                          for i in range(1, greatest(len(t)-4, 1) + 1)]) AS g
                FROM tk),
              bench AS (SELECT DISTINCT g FROM gr WHERE doc_id % 20 = 0),
              corp AS (SELECT DISTINCT doc_id, g FROM gr WHERE doc_id % 20 <> 0)
              SELECT CAST(corp.doc_id AS BIGINT) AS id, count(*) AS n_hits
              FROM corp WHERE g IN (SELECT g FROM bench)
              GROUP BY 1 ORDER BY id""")),

    // Bloom-filter decontamination: the benchmark gram set compressed to
    // a 2^20-bit filter held as a distinct-position TABLE (bounded
    // broadcast however large the benchmark); membership = all-3-positions
    // join. Positions derive from the portable md5 gram hash, so the
    // oracle rebuilds the filter and replays every probe
    Q("q_decontaminate_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.decontaminateBloom(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0),
            n = 5)
          .orderBy("id")
      },
      Some(s"""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM documents),
              gr AS (
                SELECT doc_id,
                  unnest([array_to_string(t[i:i+4], ' ')
                          for i in range(1, greatest(len(t)-4, 1) + 1)]) AS gs
                FROM tk),
              gh AS (SELECT DISTINCT doc_id,
                  ${graft.operators.PortableHash.duckSql("gs")} AS g FROM gr),
              pr(p) AS (VALUES (1000003), (1000033), (1000037)),
              bpos AS (SELECT DISTINCT (g % p) % 1048576 AS pos
                FROM gh, pr WHERE doc_id % 20 = 0),
              cpos AS (SELECT doc_id, g, (g % p) % 1048576 AS pos
                FROM gh, pr WHERE doc_id % 20 <> 0),
              hit AS (SELECT doc_id, g FROM cpos
                WHERE pos IN (SELECT pos FROM bpos)
                GROUP BY doc_id, g HAVING count(*) = 3)
              SELECT CAST(doc_id AS BIGINT) AS id, count(*) AS n_hits
              FROM hit GROUP BY 1 ORDER BY id""")),

    // the Bloom's accuracy, audited as one oracled row: exact flags are a
    // guaranteed subset (no false negatives by construction), and the
    // false-positive margin is measured against the exact operator
    Q("q_decontaminate_bloom_fpr",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val corp = docs.filter(col("doc_id") % 20 =!= 0)
        val bench = docs.filter(col("doc_id") % 20 === 0)
        val bloom = Dedup.decontaminateBloom(corp, bench, n = 5)
          .select(col("id"))
        val exact = Dedup.decontaminate(corp, bench, n = 5)
          .select(col("id"), lit(true).as("exact_hit"))
        bloom.join(exact, Seq("id"), "left")
          .agg(
            count(lit(1)).as("flagged_bloom"),
            sum(when(col("exact_hit"), 1L).otherwise(0L)).as("flagged_exact"),
            sum(when(col("exact_hit").isNull, 1L).otherwise(0L))
              .as("false_flags"))
      },
      Some(s"""WITH tk AS (
                SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM documents),
              gr AS (
                SELECT doc_id,
                  unnest([array_to_string(t[i:i+4], ' ')
                          for i in range(1, greatest(len(t)-4, 1) + 1)]) AS gs
                FROM tk),
              gh AS (SELECT DISTINCT doc_id,
                  ${graft.operators.PortableHash.duckSql("gs")} AS g FROM gr),
              pr(p) AS (VALUES (1000003), (1000033), (1000037)),
              bpos AS (SELECT DISTINCT (g % p) % 1048576 AS pos
                FROM gh, pr WHERE doc_id % 20 = 0),
              cpos AS (SELECT doc_id, g, (g % p) % 1048576 AS pos
                FROM gh, pr WHERE doc_id % 20 <> 0),
              bloom AS (SELECT doc_id FROM (
                  SELECT doc_id, g FROM cpos
                  WHERE pos IN (SELECT pos FROM bpos)
                  GROUP BY doc_id, g HAVING count(*) = 3)
                GROUP BY doc_id),
              bench AS (SELECT DISTINCT gs FROM gr WHERE doc_id % 20 = 0),
              exact AS (SELECT DISTINCT doc_id FROM gr
                WHERE doc_id % 20 <> 0 AND gs IN (SELECT gs FROM bench))
              SELECT count(*) AS flagged_bloom,
                CAST(sum(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS flagged_exact,
                CAST(sum(CASE WHEN e.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                  AS false_flags
              FROM bloom b LEFT JOIN exact e ON e.doc_id = b.doc_id""")),

    Q("q_text_repetition",
      (s, dir) => TextAnalysis.repetitionMetrics(t(s, dir, "documents"))
        .select("doc_id", "dup_token_ratio", "top_bigram_ratio")
        .orderBy("doc_id"),
      Some("""WITH toks AS (
                SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM documents),
              bg AS (
                SELECT doc_id,
                  unnest([t[i] || ' ' || t[i+1] for i in range(1, greatest(len(t), 1))]) AS b
                FROM toks),
              cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
              agg AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS nb
                      FROM cnt GROUP BY 1)
              SELECT tk.doc_id,
                round(1.0 - CAST(len(list_distinct(tk.t)) AS DOUBLE) / len(tk.t), 4)
                  AS dup_token_ratio,
                coalesce(round(CAST(agg.mx AS DOUBLE) / agg.nb, 4), 0.0)
                  AS top_bigram_ratio
              FROM toks tk LEFT JOIN agg ON tk.doc_id = agg.doc_id
              ORDER BY tk.doc_id""")),

    // URL canonicalization (Urls.canonicalize — the crawl-side identity
    // step that runs BEFORE any content dedup). Synthetic URLs are
    // derived closed-form from (doc_id, source) so every rule branch is
    // exercised: case-varied hosts, www. prefixes, default ports on both
    // schemes (:443 https / :80 http, both dropped), a kept non-default
    // :8080, trailing slashes, utm_* tracking params, UNSORTED param
    // order, fragments. The Spark side must recover the canonical form
    // VIA parse_url from the assembled string; the oracle writes the
    // canonical form closed-form from the construction — any parse or
    // normalization drift hash-mismatches. Narrow codegen'd map, zero
    // shuffle before the output sort; at 100 TB this runs at scan speed.
    Q("q_url_canonicalize",
      (s, dir) => {
        val d = col("doc_id")
        val hostCore = concat(col("source"), lit(".example.com"))
        val scheme = when(d % 2 === 0, "https").otherwise("http")
        val hostRaw = when(d % 3 === 0, upper(hostCore))
          .when(d % 3 === 1, concat(lit("www."), hostCore))
          .otherwise(hostCore)
        val port = when(d % 4 === 0, ":443") // https default (⇒ dropped)
          .when(d % 4 === 3, ":80")          // http default (⇒ dropped)
          .when(d % 4 === 1, ":8080")        // http non-default (⇒ kept)
          .otherwise(lit(""))
        val path = concat(lit("/a/"), (d % 7).cast("string"),
          when(d % 5 === 0, "/").otherwise(""))
        val query = when(d % 11 === 0, lit(""))
          .when(d % 2 === 0, concat(lit("?utm_source=feed&id="),
            (d % 13).cast("string"), lit("&utm_campaign=x")))
          .otherwise(concat(lit("?ref=rss&id="), (d % 13).cast("string")))
        val frag = when(d % 6 === 0, lit("#sec")).otherwise(lit(""))
        t(s, dir, "documents")
          .select(d.as("doc_id"),
            concat(scheme, lit("://"), hostRaw, port, path, query, frag)
              .as("url"))
          .select(col("doc_id"), col("url"),
            graft.operators.Urls.canonicalize(col("url")).as("canonical"),
            graft.operators.Urls.canonicalHost(col("url")).as("host"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
                  || '://' ||
                (CASE WHEN doc_id % 3 = 0 THEN upper(source || '.example.com')
                      WHEN doc_id % 3 = 1 THEN 'www.' || source || '.example.com'
                      ELSE source || '.example.com' END) ||
                (CASE WHEN doc_id % 4 = 0 THEN ':443'
                      WHEN doc_id % 4 = 3 THEN ':80'
                      WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
                '/a/' || (doc_id % 7) ||
                (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
                (CASE WHEN doc_id % 11 = 0 THEN ''
                      WHEN doc_id % 2 = 0 THEN
                        '?utm_source=feed&id=' || (doc_id % 13) || '&utm_campaign=x'
                      ELSE '?ref=rss&id=' || (doc_id % 13) END) ||
                (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url,
                (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
                  || '://' || lower(source) || '.example.com' ||
                (CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
                '/a/' || (doc_id % 7) ||
                (CASE WHEN doc_id % 11 = 0 THEN ''
                      WHEN doc_id % 2 = 0 THEN '?id=' || (doc_id % 13)
                      ELSE '?id=' || (doc_id % 13) || '&ref=rss' END)
                  AS canonical,
                lower(source) || '.example.com' AS host
              FROM documents ORDER BY doc_id""")),

    // The canonicalization PAYOFF as one row per host: each page is
    // fetched twice — once as a shouty tracked variant (uppercase
    // www-host, explicit default port, trailing slash, utm params), once
    // clean — and URL-level dedup on the CANONICAL form collapses the
    // pair that raw-URL dedup cannot (n_canonical ≈ n_raw / 2). The
    // explode is a narrow 1→2 map; the aggregate is one shuffle on host.
    Q("q_url_dedup",
      (s, dir) => {
        val d = col("doc_id")
        val hostCore = concat(col("source"), lit(".example.com"))
        val tracked = concat(lit("HTTPS://WWW."), upper(hostCore),
          lit(":443/p/"), (d % 7).cast("string"),
          lit("/?utm_source=feed&id="), (d % 13).cast("string"))
        val clean = concat(lit("https://"), hostCore, lit("/p/"),
          (d % 7).cast("string"), lit("?id="), (d % 13).cast("string"))
        t(s, dir, "documents")
          .select(d.as("doc_id"), explode(array(tracked, clean)).as("url"))
          .select(col("url"),
            graft.operators.Urls.canonicalHost(col("url")).as("host"),
            graft.operators.Urls.canonicalize(col("url")).as("canonical"))
          .groupBy("host")
          .agg(count(lit(1)).as("n_fetches"),
            countDistinct(col("url")).as("n_raw"),
            countDistinct(col("canonical")).as("n_canonical"))
          .orderBy("host")
      },
      Some("""WITH u AS (SELECT doc_id, source,
                  unnest(['HTTPS://WWW.' || upper(source || '.example.com')
                            || ':443/p/' || (doc_id % 7)
                            || '/?utm_source=feed&id=' || (doc_id % 13),
                          'https://' || source || '.example.com' || '/p/'
                            || (doc_id % 7) || '?id=' || (doc_id % 13)])
                    AS url,
                  lower(source) || '.example.com' AS host,
                  'https://' || source || '.example.com' || '/p/'
                    || (doc_id % 7) || '?id=' || (doc_id % 13) AS canonical
                FROM documents)
              SELECT host, count(*) AS n_fetches,
                count(DISTINCT url) AS n_raw,
                count(DISTINCT canonical) AS n_canonical
              FROM u GROUP BY host ORDER BY host""")),

    // Registered-domain (eTLD+1) extraction — the aggregation key
    // per-domain caps actually want: subdomain farms collapse to one
    // publisher. Hosts are synthesized across the shapes that matter
    // (deep subdomain on a multi-label ccTLD suffix, www on .com, bare
    // 2-label, cdn on com.au); the oracle replays the label logic
    // closed-form. Per-domain counts = one shuffle on the derived key.
    Q("q_url_domains",
      (s, dir) => {
        val d = col("doc_id")
        val host = when(d % 4 === 0, concat(lit("a.b."), col("source"), lit(".co.uk")))
          .when(d % 4 === 1, concat(lit("www."), col("source"), lit(".com")))
          .when(d % 4 === 2, concat(col("source"), lit(".org")))
          .otherwise(concat(lit("cdn."), col("source"), lit(".com.au")))
        t(s, dir, "documents")
          .select(host.as("host"))
          .select(col("host"),
            graft.operators.Urls.registeredDomain(col("host")).as("domain"))
          .groupBy("domain")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("host")).as("n_hosts"))
          .orderBy("domain")
      },
      Some("""WITH h AS (SELECT
                  CASE WHEN doc_id % 4 = 0 THEN 'a.b.' || source || '.co.uk'
                       WHEN doc_id % 4 = 1 THEN 'www.' || source || '.com'
                       WHEN doc_id % 4 = 2 THEN source || '.org'
                       ELSE 'cdn.' || source || '.com.au' END AS host,
                  CASE WHEN doc_id % 4 = 0 THEN source || '.co.uk'
                       WHEN doc_id % 4 = 1 THEN source || '.com'
                       WHEN doc_id % 4 = 2 THEN source || '.org'
                       ELSE source || '.com.au' END AS domain
                FROM documents)
              SELECT domain, count(*) AS n_docs,
                count(DISTINCT host) AS n_hosts
              FROM h GROUP BY domain ORDER BY domain""")),

    // vocabulary-coverage audit: vocab = top-30 corpus tokens
    // (count DESC, token ASC), per-lang OOV counts + rate — the
    // pre-tokenizer QA gate; oracle rebuilds the vocab cut and replays
    // every membership probe
    Q("q_vocab_coverage",
      (s, dir) => TextAnalysis.vocabCoverage(t(s, dir, "documents"), topK = 30)
        .orderBy("lang"),
      Some("""WITH tok AS (
                SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                FROM documents),
              vocab AS (
                SELECT w FROM (
                  SELECT w, count(*) AS cnt FROM tok GROUP BY w
                  QUALIFY row_number() OVER (ORDER BY cnt DESC, w) <= 30))
              SELECT lang, count(*) AS n_tokens,
                CAST(sum(CASE WHEN w NOT IN (SELECT w FROM vocab)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                round(CAST(sum(CASE WHEN w NOT IN (SELECT w FROM vocab)
                  THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS oov_rate
              FROM tok GROUP BY lang ORDER BY lang""")),

    // CCNet head/middle/tail partitioning: per-language surprisal terciles
    // over the unigram LM — the oracle retrains the LM, recomputes every
    // score, replays both quantile cuts (quantile_cont == percentile's
    // linear interpolation) and every bucket decision on the 4-dp grid
    Q("q_ccnet_buckets",
      (s, dir) => TextAnalysis.perplexityBuckets(t(s, dir, "documents"))
        .orderBy("doc_id"),
      Some("""WITH tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                FROM documents),
              freq AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
              total AS (SELECT sum(cnt) AS t FROM freq),
              surp AS (SELECT doc_id,
                  round(avg(-log2(CAST(cnt AS DOUBLE) / (SELECT t FROM total))), 4)
                    AS surprisal
                FROM tok JOIN freq USING (w) GROUP BY doc_id),
              sl AS (SELECT s.doc_id, d.lang, s.surprisal
                FROM surp s JOIN documents d USING (doc_id)),
              cuts AS (SELECT lang,
                  round(quantile_cont(surprisal, 0.3333), 4) AS p33,
                  round(quantile_cont(surprisal, 0.6667), 4) AS p66
                FROM sl GROUP BY lang)
              SELECT sl.doc_id, sl.lang, sl.surprisal, cuts.p33, cuts.p66,
                CASE WHEN surprisal <= p33 THEN 'head'
                     WHEN surprisal <= p66 THEN 'middle'
                     ELSE 'tail' END AS bucket
              FROM sl JOIN cuts ON cuts.lang = sl.lang
              ORDER BY sl.doc_id""")),

    // model-based quality/domain classifier (the fastText/WebText role) in
    // its deterministic count form: multinomial NB trained on the labeled
    // 2/3 slice, scoring the held-out 1/3 — so OOV tokens and unseen
    // (class, token) pairs actually fire. The oracle retrains the model
    // from raw counts and replays every per-class score and the rounded
    // argmax (ties → smallest label on BOTH engines).
    Q("q_nb_classifier",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextAnalysis.nbClassify(
            docs.filter(col("doc_id") % 3 =!= 0),
            docs.filter(col("doc_id") % 3 === 0))
          .orderBy("doc_id")
      },
      Some("""WITH tr AS (SELECT lang AS y, text FROM documents WHERE doc_id % 3 <> 0),
              te AS (SELECT doc_id, lang AS y_true, text FROM documents WHERE doc_id % 3 = 0),
              tokT AS (SELECT y, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM tr),
              cwc AS (SELECT y, w, count(*) AS c FROM tokT GROUP BY 1, 2),
              ct AS (SELECT y, count(*) AS n FROM tokT GROUP BY 1),
              v AS (SELECT count(DISTINCT w) AS v FROM tokT),
              pri AS (SELECT y, count(*) AS dc FROM tr GROUP BY 1),
              nd AS (SELECT count(*) AS n FROM tr),
              tokS AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM te),
              sc AS (
                SELECT s.doc_id, ct.y,
                  round(log2(CAST(pri.dc AS DOUBLE) / nd.n)
                    + sum(log2((COALESCE(cwc.c, 0) + 1) / (ct.n + v.v + 1.0))), 4) AS score
                FROM tokS s
                CROSS JOIN ct CROSS JOIN v CROSS JOIN nd
                JOIN pri ON pri.y = ct.y
                LEFT JOIN cwc ON cwc.w = s.w AND cwc.y = ct.y
                GROUP BY s.doc_id, ct.y, pri.dc, nd.n),
              best AS (
                SELECT doc_id, y AS pred, score
                FROM sc
                QUALIFY row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, y) = 1)
              SELECT b.doc_id, b.pred, b.score, te.y_true,
                CAST(b.pred = te.y_true AS INT) AS correct
              FROM best b JOIN te ON te.doc_id = b.doc_id
              ORDER BY b.doc_id"""))
  )

  private val sampling: Seq[Q] = Seq(
    Q("q_train_test_split",
      (s, dir) => graft.operators.Sampling
        .deterministicSplit(t(s, dir, "documents"), "doc_id")
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split"),
      Some("""SELECT CASE
                WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                  IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)
                  IN ('c','d') THEN 'valid'
                ELSE 'test' END AS split, count(*) AS n
              FROM documents GROUP BY 1 ORDER BY split""")),

    Q("q_stratified_sample",
      (s, dir) => graft.operators.Sampling
        .stratifiedSample(t(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 4, "de" -> 16, "es" -> 8, "fr" -> 8, "zh" -> 8))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n FROM documents
              WHERE strpos(
                CASE lang WHEN 'en' THEN '0123'
                          WHEN 'de' THEN '0123456789abcdef'
                          WHEN 'es' THEN '01234567'
                          WHEN 'fr' THEN '01234567'
                          WHEN 'zh' THEN '01234567'
                          ELSE '' END,
                substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 1)) > 0
              GROUP BY lang ORDER BY lang""")),

    // domain-mixture resampling to target weights (src0:src1:src2 =
    // 50:30:20); oracle mirrors the threshold arithmetic exactly —
    // N = min(count/w), thr = ceil(256·w·N/count) — with the 256-bucket
    // decoded via instr over the hex alphabet (DuckDB has no conv)
    Q("q_mixture_sample",
      (s, dir) => graft.operators.Sampling
        .mixtureSample(t(s, dir, "documents"), "source", "doc_id",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""WITH c AS (
                SELECT source, CAST(count(*) AS DOUBLE) AS c
                FROM documents GROUP BY source),
              w AS (SELECT * FROM (VALUES
                ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)) AS t(source, w)),
              j AS (SELECT c.source, c.c, w.w FROM c JOIN w USING (source)),
              n AS (SELECT min(c / w) AS n FROM j),
              t AS (SELECT source,
                least(256, CAST(ceil(256.0 * w * (SELECT n FROM n) / c) AS BIGINT))
                  AS thr FROM j)
              SELECT d.doc_id, d.source
              FROM documents d JOIN t ON d.source = t.source
              WHERE (strpos('0123456789abcdef',
                       substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef',
                       substring(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) < t.thr
              ORDER BY d.doc_id""")),

    // leakage-safe split: assignment keyed on the near-dup CLUSTER
    // representative so a near-duplicate of a training doc can never land
    // in test. Oracle replays the full minhash clustering (the recursive-
    // closure CTE stack) AND the md5 bucket CASE — every per-row split
    // decision checked
    Q("q_leakage_safe_split",
      (s, dir) => graft.operators.Sampling.leakageSafeSplit(
          Dedup.fuzzyDedupClusters(t(s, dir, "documents"),
            threshold = 0.5, portable = true).select("id", "component"))
        .orderBy("id"),
      Some(s"""WITH RECURSIVE ${minhashPairCtes(64, 0.5)},
              edges AS (
                SELECT id_a AS src, id_b AS dst FROM mh_pairs
                UNION SELECT id_b, id_a FROM mh_pairs),
              reach(node, lbl) AS (
                SELECT src, src FROM edges
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
              comp AS (SELECT node AS id, min(lbl) AS component
                FROM reach GROUP BY node),
              cl AS (SELECT d.id AS id, coalesce(c.component, d.id) AS component
                FROM (SELECT CAST(doc_id AS BIGINT) AS id FROM documents) d
                LEFT JOIN comp c ON c.id = d.id)
              SELECT id, component, CASE
                WHEN substring(md5('lsplit:' || CAST(component AS VARCHAR)), 1, 1)
                  IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                WHEN substring(md5('lsplit:' || CAST(component AS VARCHAR)), 1, 1)
                  IN ('c','d') THEN 'valid'
                ELSE 'test' END AS split
              FROM cl ORDER BY id""")),

    // temperature (alpha = 0.5) sampling over sources: w_s ∝ count^alpha,
    // downsample-only ⇒ keep rate = sqrt(c_min/c_s) exactly (scarcest
    // source keeps all). Row-level output so the oracle checks every keep
    // decision, not just the counts; sqrt keeps the threshold arithmetic
    // bit-identical across engines (see Sampling.temperatureMixture)
    Q("q_temperature_mixture",
      (s, dir) => graft.operators.Sampling
        .temperatureMixture(t(s, dir, "documents"), "source", "doc_id",
          alpha = 0.5)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""WITH c AS (
                SELECT source, CAST(count(*) AS DOUBLE) AS c
                FROM documents GROUP BY source),
              m AS (SELECT min(c) AS cmin FROM c),
              t AS (SELECT source, least(256, CAST(
                  ceil(256.0 * sqrt((SELECT cmin FROM m) / c)) AS BIGINT))
                  AS thr FROM c)
              SELECT d.doc_id, d.source
              FROM documents d JOIN t ON d.source = t.source
              WHERE (strpos('0123456789abcdef',
                       substring(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                  + (strpos('0123456789abcdef',
                       substring(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) < t.thr
              ORDER BY d.doc_id""")),

    // DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    // bucket models over target (lang = 'de') vs raw corpora; Gumbel-top-n
    // selection from portable-hash uniforms. The oracle replays every
    // stage: md5 feature buckets, add-one smoothing, the log-ratio table,
    // per-doc weight sums, and the Gumbel draw — the whole selection, not
    // a summary
    // count-min sketch heavy-hitter audit (the frequency member of the
    // sketch family beside HLL/Bloom): exact top-15 token counts vs the
    // portable CMS's estimates — est ≥ true by construction, the
    // overcount column IS the measured error; the oracle rebuilds the
    // whole counter table and replays every probe
    Q("q_cms_heavy_hitters",
      (s, dir) => graft.operators.Sketches.cmsHeavyHitters(
        t(s, dir, "documents")
          .select(explode(TextAnalysis.wsTokens(col("text"))).as("v")),
        col("v"), topN = 15),
      Some(s"""WITH tok AS (SELECT unnest(
                     regexp_split_to_array(trim(text), '\\s+')) AS v
                   FROM documents),
              exact AS (SELECT v, count(*) AS exact_ct FROM tok
                        GROUP BY v ORDER BY exact_ct DESC, v LIMIT 15),
              dd AS (SELECT unnest(range(0, 4)) AS d),
              cms AS (SELECT d,
                        ${graft.operators.PortableHash.duckSql(
                          "CAST(d AS VARCHAR) || ':' || v")} % 1024 AS slot,
                        count(*) AS ct
                      FROM tok, dd GROUP BY 1, 2),
              probes AS (SELECT e.v, dd.d,
                           ${graft.operators.PortableHash.duckSql(
                             "CAST(dd.d AS VARCHAR) || ':' || e.v")} % 1024
                             AS slot
                         FROM exact e, dd),
              est AS (SELECT v, min(ct) AS cms_ct
                      FROM probes JOIN cms USING (d, slot) GROUP BY v)
              SELECT v AS token, exact_ct, cms_ct,
                cms_ct - exact_ct AS overcount
              FROM exact JOIN est USING (v)
              ORDER BY exact_ct DESC, token""")),

    // per-domain document cap (the C4/RefinedWeb anti-dominance rule):
    // hash-ranked keep of at most 40 docs per source — the oracle replays
    // the rank and the cut
    Q("q_domain_cap",
      (s, dir) => graft.operators.Sampling.domainCap(
          t(s, dir, "documents"), "source", cap = 40)
        .select("doc_id", "source").orderBy("doc_id"),
      Some(s"""SELECT doc_id, source FROM (
                SELECT doc_id, source, row_number() OVER (PARTITION BY source
                  ORDER BY ${graft.operators.PortableHash.duckSql(
                    "'domaincap:' || CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
                FROM documents)
              WHERE rk <= 40 ORDER BY doc_id""")),

    // SCD Type-2 dimension merge: a versioned customer dimension takes an
    // update batch carrying changed segments, no-op re-sends, and
    // brand-new keys; changed keys close their current row and open a new
    // one, no-ops are idempotent. The oracle replays the full-join merge
    Q("q_scd2_merge",
      (s, dir) => {
        val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val dim = graft.operators.Warehouse.scd2Init(cust, "2024-01-01")
        val updates = cust.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_mktsegment", concat(col("c_mktsegment"), lit("_v2")))
          .unionByName(cust.filter(col("c_custkey") % 10 === 1))
          .unionByName(cust.filter(col("c_custkey") % 10 === 2)
            .withColumn("c_custkey", col("c_custkey") + 100000))
        graft.operators.Warehouse.scd2Merge(
            dim, updates, "c_custkey", Seq("c_mktsegment"), "2024-02-01")
          .orderBy("c_custkey", "valid_from")
      },
      Some("""WITH cur AS (SELECT c_custkey, c_mktsegment FROM customer),
              upd AS (
                SELECT c_custkey, c_mktsegment || '_v2' AS c_mktsegment
                FROM customer WHERE c_custkey % 10 = 0
                UNION ALL
                SELECT c_custkey, c_mktsegment FROM customer
                WHERE c_custkey % 10 = 1
                UNION ALL
                SELECT c_custkey + 100000, c_mktsegment FROM customer
                WHERE c_custkey % 10 = 2),
              j AS (SELECT cur.c_custkey AS ck, upd.c_custkey AS uk,
                      cur.c_mktsegment AS cseg, upd.c_mktsegment AS useg
                    FROM cur FULL JOIN upd ON upd.c_custkey = cur.c_custkey)
              SELECT * FROM (
                SELECT ck AS c_custkey, cseg AS c_mktsegment,
                  DATE '2024-01-01' AS valid_from,
                  CASE WHEN uk IS NOT NULL AND useg IS DISTINCT FROM cseg
                    THEN DATE '2024-02-01' ELSE DATE '9999-12-31' END AS valid_to,
                  NOT (uk IS NOT NULL AND useg IS DISTINCT FROM cseg)
                    AS is_current
                FROM j WHERE ck IS NOT NULL
                UNION ALL
                SELECT uk, useg, DATE '2024-02-01', DATE '9999-12-31', true FROM j
                WHERE uk IS NOT NULL AND (ck IS NULL OR useg IS DISTINCT FROM cseg))
              ORDER BY c_custkey, valid_from""")),

    // Efraimidis–Spirakis weighted sample without replacement (weight =
    // document length): the oracle re-derives the hash uniforms and Gumbel
    // keys, so the exact sampled set + scores are checked
    Q("q_weighted_sample",
      (s, dir) => graft.operators.Sampling.weightedSample(
          t(s, dir, "documents"), col("n_chars"), n = 25)
        .select("doc_id", "n_chars", "score"),
      Some(s"""SELECT doc_id, n_chars, round(ln(n_chars) - ln(-ln(u)), 4) AS score
              FROM (SELECT doc_id, n_chars,
                      (${graft.operators.PortableHash.duckSql(
                        "'wsample:' || CAST(doc_id AS VARCHAR)")} + 1)
                        / pow(2, 60) AS u
                    FROM documents WHERE n_chars > 0)
              ORDER BY score DESC, doc_id LIMIT 25""")),

    Q("q_dsir_sample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.Sampling.dsirSample(
          docs, docs.filter(col("lang") === "de"), n = 50)
      },
      Some(s"""WITH arr AS (SELECT CAST(doc_id AS BIGINT) AS id, lang,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM documents),
              feats AS (SELECT id, lang,
                  ${graft.operators.PortableHash.duckSql("f")} % 1024 AS b
                FROM (
                  SELECT id, lang, unnest(t) AS f FROM arr
                  UNION ALL
                  SELECT id, lang,
                    unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS f
                  FROM arr)),
              tgt AS (SELECT b, count(*) AS ct FROM feats
                WHERE lang = 'de' GROUP BY b),
              rw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
              tt AS (SELECT sum(ct) AS t FROM tgt),
              rt AS (SELECT sum(cr) AS r FROM rw),
              ratio AS (SELECT b,
                  ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / ((SELECT t FROM tt) + 1024)) -
                  ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE) / ((SELECT r FROM rt) + 1024))
                    AS lr
                FROM tgt FULL OUTER JOIN rw USING (b)),
              lw AS (SELECT id, round(sum(lr), 4) AS logw
                FROM feats JOIN ratio USING (b) GROUP BY id)
              SELECT id AS doc_id, logw,
                round(logw - ln(-ln(
                  (${graft.operators.PortableHash.duckSql("'dsir:' || CAST(id AS VARCHAR)")} + 1)
                    / 1152921504606846976.0)), 4) AS score
              FROM lw
              ORDER BY score DESC, doc_id LIMIT 50""")),

    // the weights' separation, aggregated: target-language docs must
    // out-score every other language on average — the audit that the
    // importance model is actually tilting toward the target domain
    Q("q_dsir_separation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.operators.Sampling
          .dsirLogWeights(docs, docs.filter(col("lang") === "de"))
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy("lang")
          .agg(round(avg("logw"), 4).as("avg_logw"),
            count(lit(1)).as("n_docs"))
          .orderBy("lang")
      },
      Some(s"""WITH arr AS (SELECT CAST(doc_id AS BIGINT) AS id, lang,
                  regexp_split_to_array(trim(lower(text)), '\\s+') AS t
                FROM documents),
              feats AS (SELECT id, lang,
                  ${graft.operators.PortableHash.duckSql("f")} % 1024 AS b
                FROM (
                  SELECT id, lang, unnest(t) AS f FROM arr
                  UNION ALL
                  SELECT id, lang,
                    unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS f
                  FROM arr)),
              tgt AS (SELECT b, count(*) AS ct FROM feats
                WHERE lang = 'de' GROUP BY b),
              rw AS (SELECT b, count(*) AS cr FROM feats GROUP BY b),
              tt AS (SELECT sum(ct) AS t FROM tgt),
              rt AS (SELECT sum(cr) AS r FROM rw),
              ratio AS (SELECT b,
                  ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / ((SELECT t FROM tt) + 1024)) -
                  ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE) / ((SELECT r FROM rt) + 1024))
                    AS lr
                FROM tgt FULL OUTER JOIN rw USING (b)),
              lw AS (SELECT id, round(sum(lr), 4) AS logw
                FROM feats JOIN ratio USING (b) GROUP BY id)
              SELECT d.lang, round(avg(logw), 4) AS avg_logw,
                count(*) AS n_docs
              FROM lw JOIN (SELECT CAST(doc_id AS BIGINT) AS id, lang
                FROM documents) d USING (id)
              GROUP BY d.lang ORDER BY d.lang""")),

    // concat-and-split sequence packing: 16 md5 shards, per-shard running
    // offset, pack = floor(start/4096 chars); compared as the pack manifest
    Q("q_seq_packing",
      (s, dir) => Packing.packSummary(t(s, dir, "documents"), capacity = 4096L),
      Some("""WITH k AS (
                SELECT doc_id, n_chars,
                       md5('pack:' || CAST(doc_id AS VARCHAR)) AS pack_key
                FROM documents),
              o AS (
                SELECT substring(pack_key, 1, 1) AS shard, n_chars,
                  coalesce(sum(n_chars) OVER (
                    PARTITION BY substring(pack_key, 1, 1) ORDER BY pack_key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
                FROM k)
              SELECT shard, CAST(start_off // 4096 AS BIGINT) AS pack_no,
                count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_len
              FROM o GROUP BY 1, 2 ORDER BY shard, pack_no""")),

    // whole-document bin packing for reader load balance (no splits):
    // portable-hash bin + the per-bin manifest stating achieved balance;
    // oracle replays hash, mod, and both aggregates
    Q("q_pack_bins",
      (s, dir) => Packing.packBins(t(s, dir, "documents"), nBins = 16),
      Some(s"""SELECT CAST(${graft.operators.PortableHash.duckSql(
                  "'bin:' || CAST(doc_id AS VARCHAR)")} % 16 AS INT) AS bin,
                count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_len
              FROM documents GROUP BY 1 ORDER BY bin""")),

    // per-label embedding centroids (the class-prototype aggregate of a
    // vector corpus): posexplode → two-level groupBy avg on the 4-dp
    // grid; oracle indexes the array with a lateral range (DuckDB has no
    // WITH ORDINALITY) — summation-order noise ~1e-15 against the 5e-5
    // boundary
    Q("q_label_centroids",
      (s, dir) => t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(Similarity.toDouble(col("embedding"))).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(round(avg("x"), 4).as("c"))
        .orderBy("label", "dim"),
      Some("""SELECT label, CAST(r.i - 1 AS INT) AS dim,
                round(avg(e[r.i]), 4) AS c
              FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings) t,
                LATERAL unnest(range(1, len(e) + 1)) AS r(i)
              GROUP BY 1, 2 ORDER BY label, dim""")),

    // deterministic epoch shuffle: md5(seed, id) permutation, first 20 rows
    Q("q_global_shuffle",
      (s, dir) => graft.operators.Sampling
        .deterministicShuffle(t(s, dir, "documents"), "doc_id", "epoch0")
        .limit(20)
        .select("doc_id", "shuffle_key"),
      Some("""SELECT doc_id,
                md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
              FROM documents ORDER BY shuffle_key LIMIT 20""")),

    Q("q_redact_pii",
      (s, dir) => TextAnalysis.redactPii(t(s, dir, "documents"))
        .select(col("doc_id"), col("pii_found"), md5(col("text_redacted")).as("digest"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
              text <> regexp_replace(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g') AS pii_found,
              md5(regexp_replace(regexp_replace(regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                '\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g')) AS digest
              FROM documents ORDER BY doc_id""")),

    // k-anonymity audit — the privacy family's second member beside PII
    // redaction: treat (lang, source) as the quasi-identifier and report,
    // per k in a ladder, how many equivalence classes and how many ROWS
    // sit below the threshold (a release gate reads the row count at its
    // k and suppresses or generalizes those classes). One grouped count
    // then a tiny re-aggregation — partial-aggregable, one shuffle on the
    // quasi-identifier, audit output is bounded by the ladder size at any
    // corpus scale.
    Q("q_k_anonymity",
      (s, dir) => {
        val classes = t(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
        val ks = Seq(2, 5, 10)
        ks.map { k =>
          classes.agg(
            lit(k).as("k"),
            count(lit(1)).as("n_classes"),
            sum(when(col("n") < k, 1L).otherwise(0L)).as("risky_classes"),
            sum(when(col("n") < k, col("n")).otherwise(lit(0L))).as("risky_rows"))
        }.reduce(_ unionByName _).orderBy("k")
      },
      Some("""WITH classes AS (
                SELECT lang, source, count(*) AS n
                FROM documents GROUP BY 1, 2)
              SELECT k, count(*) AS n_classes,
                CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
                  AS risky_classes,
                CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
                  AS risky_rows
              FROM classes, (VALUES (2), (5), (10)) ks(k)
              GROUP BY k ORDER BY k""")),

    // incremental distinct via a persisted HLL sketch TABLE: each crawl
    // (doc_id parity) contributes one bounded DataSketches sketch row per
    // lang; the corpus-lifetime distinct-page count merges sketch rows
    // only — earlier crawls' bodies are never rescanned. Sketch bytes are
    // engine-specific, so this follows the q_approx_distinct AUDIT
    // convention: the oracle recomputes the exact side and the estimate
    // must land inside the published bracket (lgK=12 → ~1.6% std err;
    // 5% + 16 absolute is ~3σ-safe at any fixture size).
    Q("q_hll_crawl_union",
      (s, dir) => {
        val pages = t(s, dir, "documents")
          .select(col("lang"), (col("doc_id") % 2).as("crawl"),
            md5(col("text")).as("pg"))
        val sketches = graft.operators.Sketches.hllSketchTable(
          pages, Seq("crawl", "lang"), col("pg"))
        val est = graft.operators.Sketches.hllMergeEstimate(sketches, Seq("lang"))
        val exact = pages.groupBy("lang")
          .agg(countDistinct("pg").as("exact_distinct"))
        est.join(exact, Seq("lang"))
          .select(col("lang"), col("exact_distinct"),
            (abs(col("approx_distinct") - col("exact_distinct").cast("double")) <=
              col("exact_distinct") * 0.05 + lit(16.0)).as("hll_within_tol"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(DISTINCT md5(text)) AS exact_distinct,
                TRUE AS hll_within_tol
              FROM documents GROUP BY lang ORDER BY lang""")),

    // token-budget-constrained selection (greedy by quality score): the
    // distributed histogram-threshold form must reproduce EXACTLY the
    // global running-sum prefix the oracle computes — bucket walk,
    // residual budget, and the boundary-bucket id-order window all
    // replayed by one DuckDB window over (score DESC, doc_id)
    Q("q_budget_select",
      (s, dir) => {
        val scored = TextAnalysis.qualityScore(t(s, dir, "documents"))
        graft.operators.Sampling.budgetSelect(
            scored, col("quality_score"), col("n_tokens"), budget = 12000L)
          .orderBy("doc_id")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                  CAST(length(text) AS DOUBLE) AS n_char,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS n_tok,
                  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
                  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                    w -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','was','at','by','be'],
                      lower(w)))) AS DOUBLE) AS stop
                FROM documents),
              c AS (SELECT doc_id, round((
                  (CASE WHEN n_tok BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) +
                  least(round(alpha/n_char,4)/0.6, 1.0) +
                  least(round(stop/n_tok,4)/0.05, 1.0) +
                  (CASE WHEN round((n_char-(n_tok-1))/n_tok,4) BETWEEN 2.0 AND 12.0
                   THEN 1.0 ELSE 0.0 END)
                  )/4.0, 4) AS score4,
                  CAST(n_tok AS BIGINT) AS cost
                FROM m),
              r AS (SELECT doc_id, score4, cost,
                  sum(cost) OVER (ORDER BY score4 DESC, doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM c)
              SELECT doc_id, score4, cost FROM r
              WHERE cum <= 12000 ORDER BY doc_id"""))
  )

  // ----------------------------------------------------------- embeddings

  private val embeddings: Seq[Q] = Seq(
    Q("q_knn_cosine",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), q, k = 10)
      },
      Some("""SELECT vec_id, round(sim_raw, 4) AS sim FROM (
                SELECT vec_id, list_cosine_similarity(
                  CAST(embedding AS DOUBLE[]),
                  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                ) AS sim_raw FROM embeddings WHERE vec_id <> 0)
              ORDER BY round(sim_raw, 4) DESC, vec_id LIMIT 10""")),

    // int8 scalar quantization (round 8): the corpus rides as
    // (tinyint[], scale) — 8x smaller than the DOUBLE[] the plain knn
    // shuffles — and is dequantized per-expression inside the scan
    // projection. Every arithmetic step is bit-deterministic (IEEE
    // division, floor half-up, clamp, multiply), so the oracle replays
    // quantize -> dequantize -> cosine verbatim with no tolerance: the
    // compare is EXACT equality of the ranked top-10 on the 4-dp grid.
    Q("q_knn_quantized",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val quant = Similarity.quantizeInt8(emb.filter(col("vec_id") =!= 0))
        Similarity.bruteForceTopK(
          quant.select(col("id").as("vec_id"),
            Similarity.dequantize(col("qv"), col("scale")).as("embedding")),
          q, k = 10)
      },
      Some("""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              rest AS (SELECT id, e,
                  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
                FROM emb WHERE id <> 0),
              dq AS (SELECT id, list_transform(e, x ->
                  CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
                  ELSE greatest(-127.0, least(127.0, floor(x / scale + 0.5))) * scale
                  END) AS d
                FROM rest)
              SELECT id AS vec_id,
                round(list_cosine_similarity(d,
                  (SELECT e FROM emb WHERE id = 0)), 4) AS sim
              FROM dq
              ORDER BY sim DESC, vec_id LIMIT 10""")),

    // 1-bit (component-sign) sketch shortlist + exact re-rank: stage 1 is
    // a hamming top-m heap over 8-byte sketches, stage 2 an exact cosine
    // over the m survivors. Both stages deterministic (hamming ASC + id,
    // then rounded cosine DESC + id), so the oracle re-derives the sketch
    // bits (CAST the HUGEINT sum to BIGINT before xor — sign-extension
    // gotcha), the shortlist cut, and the final rank
    Q("q_knn_binary",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        Similarity.binaryTopK(emb.filter(col("vec_id") =!= 0), q, k = 10, m = 100)
      },
      Some("""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              sk AS (SELECT id, CAST(sum(CASE WHEN e[j + 1] >= 0
                    THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS s
                FROM emb, range(60) r(j) WHERE id <> 0 GROUP BY id),
              qs AS (SELECT CAST(sum(CASE WHEN e[j + 1] >= 0
                    THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS s
                FROM emb, range(60) r(j) WHERE id = 0),
              short AS (SELECT sk.id FROM sk, qs
                ORDER BY bit_count(xor(sk.s, qs.s)) ASC, sk.id ASC LIMIT 100)
              SELECT e.id AS vec_id,
                round(list_cosine_similarity(e.e,
                  (SELECT e FROM emb WHERE id = 0)), 4) AS sim
              FROM short JOIN emb e USING (id)
              ORDER BY sim DESC, vec_id LIMIT 10""")),

    // signed random projection (JL, Achlioptas ±1) as a KNN pre-stage:
    // 64-dim embeddings drop to 16 dims through a seed-derived literal
    // sign matrix, then exact top-k runs on the short vectors. The oracle
    // re-derives the SAME matrix (spliced from Similarity.signMatrix —
    // parity of the portable hash, so the splice and the Spark literal
    // cannot diverge) and replays the projection as an explicit left-fold
    // sum matching functions.aggregate's order, 4-dp rounded; dims are
    // derived from the live fixture on the Spark side and guarded with a
    // pointed error() in the oracle (the q_ann_quantized lockstep rule)
    Q("q_knn_randproj",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val dimIn = emb.select(size(col("embedding"))).head().getInt(0)
        val proj = emb.select(col("vec_id"),
          Similarity.randomProject(col("embedding"), dimIn, dimOut = 16)
            .as("embedding"))
        val q = Similarity.collectQueryVec(proj, 0)
        Similarity.bruteForceTopK(proj.filter(col("vec_id") =!= 0), q, k = 10)
      },
      Some {
        val m = Similarity.signMatrix(64, 16, "rp")
          .map(_.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]"))
          .mkString("[", ",\n                  ", "]")
        s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CASE WHEN len(embedding) = 64 THEN CAST(embedding AS DOUBLE[])
                  ELSE error('q_knn_randproj oracle splices a 64x16 sign matrix; the embeddings fixture dimension changed - regenerate the catalog oracle')
                  END AS e FROM embeddings),
              sm AS (SELECT $m AS m),
              proj AS (SELECT id,
                  [round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(range(1, 65), i -> e[i] * m[j][i])),
                     (a, b) -> a + b), 4) FOR j IN range(1, 17)] AS p
                FROM emb, sm)
              SELECT id AS vec_id,
                round(list_cosine_similarity(p,
                  (SELECT p FROM proj WHERE id = 0)), 4) AS sim
              FROM proj WHERE id <> 0
              ORDER BY sim DESC, vec_id LIMIT 10"""
      }),

    // SemDeDup (cluster-partitioned pairwise semantic dedup): the oracle
    // replays the hash-sampled centroids, the rounded-cosine argmax
    // assignment (same fragment as q_ann_ivf), the keep-diverse rank
    // (lowest similarity-to-centroid first), and the within-cluster
    // dominance drop rule — the full pipeline, not a summary
    Q("q_semdedup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = Similarity.sampleCentroids(emb, 8, "vec_id", "embedding")
        Similarity.semDedup(emb, centroids, threshold = 0.3).orderBy("vec_id")
      },
      Some(s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              cent AS (SELECT id AS cid, e AS ce FROM emb
                ORDER BY ${graft.operators.PortableHash.duckSql("CAST(id AS VARCHAR)")}, id
                LIMIT 8),
              scored AS (SELECT r.id, c.cid,
                  COALESCE(round(list_cosine_similarity(r.e, c.ce), 6), -2.0) AS sim
                FROM emb r, cent c),
              assign AS (SELECT id, cid AS cluster, sim AS csim FROM (
                  SELECT id, cid, sim, row_number() OVER (PARTITION BY id
                    ORDER BY sim DESC, cid DESC) AS rn
                  FROM scored) WHERE rn = 1),
              rk AS (SELECT id, cluster, csim,
                  CAST(row_number() OVER (PARTITION BY cluster
                    ORDER BY csim ASC, id ASC) AS INT) AS "rank"
                FROM assign),
              drp AS (SELECT DISTINCT a.id FROM rk a JOIN rk b
                  ON a.cluster = b.cluster AND b."rank" < a."rank"
                JOIN emb ea ON ea.id = a.id JOIN emb eb ON eb.id = b.id
                WHERE round(list_cosine_similarity(ea.e, eb.e), 6) >= 0.3)
              SELECT r.id AS vec_id, r.cluster, r."rank",
                (d.id IS NOT NULL) AS dropped
              FROM rk r LEFT JOIN drp d ON d.id = r.id
              ORDER BY vec_id""")),

    // SemDeDup with TWO-LEVEL assignment (coarse super-cluster argmax,
    // then argmax over only that super's members — n·(s + k/s) cosines
    // instead of n·k, the 100-TB assignment shape). Approximate by
    // design; every stage is a pinned rounded argmax, so the oracle
    // replays the hash-ordered super pick, the centroid→super routing,
    // both document argmax stages, and the dominance rule exactly
    Q("q_semdedup_2level",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val centroids = Similarity.sampleCentroids(emb, 8, "vec_id", "embedding")
        Similarity.semDedup(emb, centroids, threshold = 0.3, superClusters = 3)
          .orderBy("vec_id")
      },
      Some(s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              cent AS (SELECT id AS cid, e AS ce FROM emb
                ORDER BY ${graft.operators.PortableHash.duckSql("CAST(id AS VARCHAR)")}, id
                LIMIT 8),
              sup AS (SELECT cid AS sid, ce AS se FROM cent
                ORDER BY ${graft.operators.PortableHash.duckSql("CAST(cid AS VARCHAR)")}, cid
                LIMIT 3),
              c2s AS (SELECT cid, sid FROM (
                  SELECT c.cid, s.sid, row_number() OVER (PARTITION BY c.cid
                    ORDER BY COALESCE(round(list_cosine_similarity(c.ce, s.se), 6), -2.0) DESC,
                      s.sid DESC) AS rn
                  FROM cent c, sup s) WHERE rn = 1),
              a1 AS (SELECT id, sid FROM (
                  SELECT r.id, s.sid, row_number() OVER (PARTITION BY r.id
                    ORDER BY COALESCE(round(list_cosine_similarity(r.e, s.se), 6), -2.0) DESC,
                      s.sid DESC) AS rn
                  FROM emb r, sup s) WHERE rn = 1),
              assign AS (SELECT id, cluster, csim FROM (
                  SELECT r.id, c.cid AS cluster,
                    COALESCE(round(list_cosine_similarity(r.e, c.ce), 6), -2.0) AS csim,
                    row_number() OVER (PARTITION BY r.id
                      ORDER BY COALESCE(round(list_cosine_similarity(r.e, c.ce), 6), -2.0) DESC,
                        c.cid DESC) AS rn
                  FROM emb r JOIN a1 USING (id)
                  JOIN c2s ON c2s.sid = a1.sid
                  JOIN cent c ON c.cid = c2s.cid) WHERE rn = 1),
              rk AS (SELECT id, cluster, csim,
                  CAST(row_number() OVER (PARTITION BY cluster
                    ORDER BY csim ASC, id ASC) AS INT) AS "rank"
                FROM assign),
              drp AS (SELECT DISTINCT a.id FROM rk a JOIN rk b
                  ON a.cluster = b.cluster AND b."rank" < a."rank"
                JOIN emb ea ON ea.id = a.id JOIN emb eb ON eb.id = b.id
                WHERE round(list_cosine_similarity(ea.e, eb.e), 6) >= 0.3)
              SELECT r.id AS vec_id, r.cluster, r."rank",
                (d.id IS NOT NULL) AS dropped
              FROM rk r LEFT JOIN drp d ON d.id = r.id
              ORDER BY vec_id""")),

    // the oracle replays the hyperplanes verbatim (they are deterministic
    // 4-dp literals — Similarity.hyperplanes) and independently re-derives
    // sign-bit buckets, the hamming multiprobe cut, and the cosine top-k
    Q("q_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        Similarity.annTopK(emb.filter(col("vec_id") =!= 0), q, dim = 64,
          k = 10, nPlanes = 8, probeHamming = 3)
      },
      Some {
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = 8)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings),
              b AS (SELECT vec_id,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM emb, planes GROUP BY vec_id),
              cand AS (
                SELECT m.vec_id,
                  list_cosine_similarity(m.e,
                    (SELECT e FROM emb WHERE vec_id = 0)) AS sim_raw
                FROM emb m JOIN b USING (vec_id)
                WHERE m.vec_id <> 0 AND
                  bit_count(xor(b.bucket,
                    (SELECT bucket FROM b WHERE vec_id = 0))) <= 3)
              SELECT vec_id, round(sim_raw, 4) AS sim FROM cand
              ORDER BY round(sim_raw, 4) DESC, vec_id LIMIT 10"""
      }),

    // the query-side AUTO twin (judge r6 item 4 — the last fixed-bucket
    // LSH surface): bucket width and multiprobe radius derived from
    // (simTarget, corpus size, dim) by autoAnnParams — a pure function,
    // so the oracle replays the derivation at catalog-build time for the
    // verify tier's corpus (499 non-query embeddings at sf0.01; a fixture
    // regeneration that changes the count fails this row loudly, by
    // construction) and splices the derived planes verbatim. The Spark
    // side passes n = None, exercising the count-materializes-the-cache
    // path end-to-end.
    Q("q_ann_lsh_auto",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        Similarity.annTopKAuto(emb.filter(col("vec_id") =!= 0), q, dim = 64,
          k = 10, simTarget = 0.9)
      },
      Some {
        val (w, h) = Similarity.autoAnnParams(0.9, n = 499L, dim = 64)
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = w)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings),
              b AS (SELECT vec_id,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM emb, planes GROUP BY vec_id),
              cand AS (
                SELECT m.vec_id,
                  list_cosine_similarity(m.e,
                    (SELECT e FROM emb WHERE vec_id = 0)) AS sim_raw
                FROM emb m JOIN b USING (vec_id)
                WHERE m.vec_id <> 0 AND
                  bit_count(xor(b.bucket,
                    (SELECT bucket FROM b WHERE vec_id = 0))) <= $h)
              SELECT vec_id, round(sim_raw, 4) AS sim FROM cand
              ORDER BY round(sim_raw, 4) DESC, vec_id LIMIT 10"""
      }),

    // the 100-TB serving shape, end-to-end (round 8): the corpus at rest
    // is int8-quantized (8x narrower scan), the LSH index is built over
    // the DEQUANTIZED vectors, and the query stays full-precision. The
    // oracle replays quantize -> dequantize -> sign-bit buckets ->
    // multiprobe -> cosine verbatim — every stage bit-deterministic, so
    // the compare is exact. (Bucket signs CAN differ from the
    // unquantized q_ann_lsh_auto on near-zero projections; both engines
    // quantize identically, so they differ identically.)
    Q("q_ann_quantized",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val quant = Similarity.quantizeInt8(emb.filter(col("vec_id") =!= 0))
        Similarity.annTopKAuto(
          quant.select(col("id").as("vec_id"),
            Similarity.dequantize(col("qv"), col("scale")).as("embedding")),
          q, dim = 64, k = 10, simTarget = 0.9)
      },
      Some {
        // n = 499 is LOCKSTEP with the sf0.01 fixture (500 embeddings
        // including query 0): autoAnnParams' (w, h) are spliced from it,
        // so a regenerated fixture of any other size must fail POINTEDLY,
        // not as an inscrutable hash mismatch — the guard CTE below
        // raises a named error when the live count disagrees
        val (w, h) = Similarity.autoAnnParams(0.9, n = 499L, dim = 64)
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = w)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH guard AS (SELECT CASE
                  WHEN (SELECT count(*) FROM embeddings) = 500 THEN 1
                  ELSE error('q_ann_quantized oracle is spliced for a 499-vector corpus (500 embeddings incl. query 0); the fixture size changed - regenerate the catalog oracle')
                  END AS ok),
              planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings, guard),
              rest AS (SELECT vec_id, e,
                  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
                FROM emb WHERE vec_id <> 0),
              dq AS (SELECT vec_id, list_transform(e, x ->
                  CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
                  ELSE greatest(-127.0, least(127.0, floor(x / scale + 0.5))) * scale
                  END) AS d
                FROM rest),
              bq AS (SELECT vec_id,
                  CAST(sum(CASE WHEN list_dot_product(d, pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM dq, planes GROUP BY vec_id),
              b0 AS (SELECT CAST(sum(CASE WHEN list_dot_product(
                    (SELECT e FROM emb WHERE vec_id = 0), pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM planes),
              cand AS (
                SELECT dq.vec_id,
                  list_cosine_similarity(dq.d,
                    (SELECT e FROM emb WHERE vec_id = 0)) AS sim_raw
                FROM dq JOIN bq USING (vec_id)
                WHERE bit_count(xor(bq.bucket,
                    (SELECT bucket FROM b0))) <= $h)
              SELECT vec_id, round(sim_raw, 4) AS sim FROM cand
              ORDER BY round(sim_raw, 4) DESC, vec_id LIMIT 10"""
      }),

    // oracle replays the 16 literal hyperplanes (Similarity.hyperplanes,
    // 4-dp — same splice pattern as q_ann_lsh), re-derives the 4×4-bit
    // band keys from the sign-bit bucket, the band-collision candidate
    // pairs, and the rounded-cosine threshold cut
    Q("q_embed_neardup",
      // the operator returns unsorted (no pair-cardinality range shuffle
      // inside composed pipelines); the oracle compare orders HERE
      (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"),
        dim = 64, threshold = 0.25, nPlanes = 16, bands = 4)
        .orderBy("id_a", "id_b"),
      Some {
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = 16)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              b AS (SELECT id,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM emb, planes GROUP BY id),
              bd AS (SELECT id, band, (bucket >> (band * 4)) & 15 AS bv
                FROM b, (SELECT unnest(range(0, 4)) AS band) bands),
              cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bd a JOIN bd c
                  ON a.band = c.band AND a.bv = c.bv AND a.id < c.id),
              sc AS (SELECT id_a, id_b,
                  round(list_cosine_similarity(ea.e, eb.e), 4) AS sim
                FROM cand
                JOIN emb ea ON ea.id = id_a
                JOIN emb eb ON eb.id = id_b)
              SELECT id_a, id_b, sim FROM sc WHERE sim >= 0.25
              ORDER BY id_a, id_b"""
      },
      counterExample = true), // fixed 16/4: occupancy² candidates, measured killed at x100 (BENCH_SF10.md §4)

    // the SCALE-SAFE mode behind a driver gate: nPlanes = 0 lets
    // autoCosineBanding derive (width, bands) from (threshold, corpus
    // size, dim) — the configuration BENCH_SF1 proved necessary (the fixed
    // 16/4 entry above is the one measured super-linear shape, kept for
    // continuity). The derivation is a pure function, so the oracle
    // replays it at catalog-build time for the verify tier's corpus size
    // (500 embeddings at sf0.01 — a fixture regeneration that changes the
    // count fails this row loudly, by construction) and splices the
    // derived per-band hyperplanes verbatim: band p/w's key accumulates
    // bit p%w per plane p, exactly lshBandKeys' native loop. The Spark
    // side passes n = None, exercising the count-materializes-the-cache
    // auto path end-to-end.
    Q("q_embed_neardup_auto",
      (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"),
        dim = 64, threshold = 0.25, nPlanes = 0)
        .orderBy("id_a", "id_b"),
      Some {
        val (np, nb) = Similarity.autoCosineBanding(0.25, n = 500L, dim = 64)
        val w = np / nb
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = np)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              bd AS (SELECT id, p // $w AS band,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << (p % $w) ELSE 0 END) AS BIGINT) AS bv
                FROM emb, planes GROUP BY id, p // $w),
              cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bd a JOIN bd c
                  ON a.band = c.band AND a.bv = c.bv AND a.id < c.id),
              sc AS (SELECT id_a, id_b,
                  round(list_cosine_similarity(ea.e, eb.e), 4) AS sim
                FROM cand
                JOIN emb ea ON ea.id = id_a
                JOIN emb eb ON eb.id = id_b)
              SELECT id_a, id_b, sim FROM sc WHERE sim >= 0.25
              ORDER BY id_a, id_b"""
      },
      // auto banding is scale-safe ONLY above the GW feasibility boundary;
      // at t = 0.25 no 95%-recall banding is sub-quadratic (BENCH_SF10.md
      // §5) — at x100 this entry now dies fast in the operator's
      // expectedAutoCandidatePairs gate with a diagnosis
      counterExample = true),

    // the same fixed/auto pair at t = 0.9 — the threshold real near-dup
    // dedup runs at, and the regime where the scale claims SEPARATE:
    // fixed 16/4's candidate volume is threshold-INDEPENDENT (4-bit bands
    // = 16 buckets whatever t is; occupancy n/16 squared — the measured
    // x100 timeout), while auto at t = 0.9 derives ~2-bucket-per-vector
    // band widths (feasible w tracks log2 n because GW agreement p = 0.86
    // is high) and stays near-linear. At t = 0.25 NO 95%-recall banding
    // is sub-quadratic (candidates ~ n^2/(2p)^w with 2p = 1.16 needs
    // w ~ 88 -> 3e20 bands — the GW bound, not an implementation gap), so
    // the t-0.25 entries above are the honest-but-infeasible-at-x100
    // regime and THIS pair is the scale-safe one. The synthetic
    // embeddings top out at cosine 0.60, so both entries return 0 rows on
    // the fixtures (the oracle still pins the whole banding+verify
    // machinery end-to-end; high-threshold RESULT correctness is spec'd
    // with planted dups in SimilaritySpec) — what the bench measures is
    // the candidate-generation cost, which is exactly the quantity that
    // diverges at x100 (BENCH_SF10.md).
    Q("q_embed_neardup_t90",
      (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"),
        dim = 64, threshold = 0.9, nPlanes = 16, bands = 4)
        .orderBy("id_a", "id_b"),
      Some {
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = 16)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              b AS (SELECT id,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
                FROM emb, planes GROUP BY id),
              bd AS (SELECT id, band, (bucket >> (band * 4)) & 15 AS bv
                FROM b, (SELECT unnest(range(0, 4)) AS band) bands),
              cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bd a JOIN bd c
                  ON a.band = c.band AND a.bv = c.bv AND a.id < c.id),
              sc AS (SELECT id_a, id_b,
                  round(list_cosine_similarity(ea.e, eb.e), 4) AS sim
                FROM cand
                JOIN emb ea ON ea.id = id_a
                JOIN emb eb ON eb.id = id_b)
              SELECT id_a, id_b, sim FROM sc WHERE sim >= 0.9
              ORDER BY id_a, id_b"""
      },
      counterExample = true), // fixed banding's candidate volume is threshold-independent: same x100 kill as q_embed_neardup

    Q("q_embed_neardup_auto_t90",
      (s, dir) => Similarity.cosineNearDupPairs(t(s, dir, "embeddings"),
        dim = 64, threshold = 0.9, nPlanes = 0)
        .orderBy("id_a", "id_b"),
      Some {
        val (np, nb) = Similarity.autoCosineBanding(0.9, n = 500L, dim = 64)
        val w = np / nb
        val planeValues = graft.operators.Similarity.hyperplanes(dim = 64, nPlanes = np)
          .zipWithIndex
          .map { case (p, i) => s"($i, ${p.mkString("[", ", ", "]")}::DOUBLE[])" }
          .mkString(",\n                  ")
        s"""WITH planes(p, pv) AS (VALUES
                  $planeValues),
              emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              bd AS (SELECT id, p // $w AS band,
                  CAST(sum(CASE WHEN list_dot_product(e, pv) >= 0
                    THEN 1 << (p % $w) ELSE 0 END) AS BIGINT) AS bv
                FROM emb, planes GROUP BY id, p // $w),
              cand AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b
                FROM bd a JOIN bd c
                  ON a.band = c.band AND a.bv = c.bv AND a.id < c.id),
              sc AS (SELECT id_a, id_b,
                  round(list_cosine_similarity(ea.e, eb.e), 4) AS sim
                FROM cand
                JOIN emb ea ON ea.id = id_a
                JOIN emb eb ON eb.id = id_b)
              SELECT id_a, id_b, sim FROM sc WHERE sim >= 0.9
              ORDER BY id_a, id_b"""
      }),

    // fully replayed in DuckDB: the 16 centroids are the smallest
    // portable-md5-hashed ids (PortableHash), assignment is the rounded-
    // cosine argmax with cid tie-break (Similarity.assignExpr), probes are
    // the 4 centroids nearest the query under the same rounding, and the
    // final cut is bruteForceTopK's rounded rank
    Q("q_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val (assigned, centroids) = Similarity.ivfAssign(emb.filter(col("vec_id") =!= 0))
        Similarity.ivfTopK(assigned, centroids, q, k = 10, nProbe = 4)
      },
      Some(s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              rest AS (SELECT * FROM emb WHERE id <> 0),
              cent AS (SELECT id AS cid, e AS ce FROM rest
                ORDER BY ${graft.operators.PortableHash.duckSql("CAST(id AS VARCHAR)")}, id
                LIMIT 16),
              scored AS (SELECT r.id, c.cid,
                  COALESCE(round(list_cosine_similarity(r.e, c.ce), 6), -2.0) AS sim
                FROM rest r, cent c),
              assign AS (SELECT id, cid FROM (
                  SELECT id, cid, row_number() OVER (PARTITION BY id
                    ORDER BY sim DESC, cid DESC) AS rn
                  FROM scored) WHERE rn = 1),
              probes AS (SELECT cid FROM (
                  SELECT cid, round(list_cosine_similarity(ce,
                    (SELECT e FROM emb WHERE id = 0)), 6) AS sim
                  FROM cent) ORDER BY sim DESC, cid LIMIT 4)
              SELECT id AS vec_id,
                round(list_cosine_similarity(r.e,
                  (SELECT e FROM emb WHERE id = 0)), 4) AS sim
              FROM rest r JOIN assign USING (id)
              WHERE assign.cid IN (SELECT cid FROM probes)
              ORDER BY sim DESC, vec_id LIMIT 10""")),

    // top-k similarity JOIN (every query vector against the corpus at
    // once): broadcast the 3-row query side through a nested-loop cross
    // join (narrow — no shuffle of the corpus), then the custom
    // sparse TF-IDF cosine all-pairs join (Bayardo et al.'s all-pairs
    // problem, inverted-index formulation): trigram-shingle TF-IDF vectors,
    // posting-list self-join, df cap on hub terms. The oracle rebuilds the
    // identical weighted vectors from the gram strings and replays the join
    Q("q_sim_join_sparse",
      (s, dir) => TextAnalysis.tfidfCosinePairs(
          t(s, dir, "documents"), Dedup.shinglesAll(col("text"), 3),
          threshold = 0.2, maxDf = 100)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH tk AS (SELECT doc_id AS id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                   FROM documents),
              gs AS (SELECT id, unnest(
                      CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE [array_to_string(t[i:i+2], ' ')
                            FOR i IN range(1, len(t) - 1)] END) AS term_str
                    FROM tk),
              g AS (SELECT id,
                      ${graft.operators.PortableHash.duckSql("term_str")} AS term
                    FROM gs),
              tf AS (SELECT id, term, CAST(count(*) AS DOUBLE) AS tf
                     FROM g GROUP BY id, term),
              dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
              w AS (SELECT id, term, tf * ln((n.n + 1.0) / (df + 1.0)) AS w
                    FROM tf JOIN dfq USING (term), n
                    WHERE df <= 100
                      AND tf * ln((n.n + 1.0) / (df + 1.0)) > 0),
              nrm AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
              wn AS (SELECT term, id, w / nrm AS wn FROM w JOIN nrm USING (id)),
              p AS (SELECT a.id AS id_a, b.id AS id_b,
                      round(sum(a.wn * b.wn), 6) AS cosine
                    FROM wn a JOIN wn b ON a.term = b.term AND a.id < b.id
                    GROUP BY 1, 2)
              SELECT id_a, id_b, cosine FROM p
              WHERE cosine >= 0.2 ORDER BY id_a, id_b""")),

    // TopKPerKey operator keeps a bounded heap per query instead of
    // sorting all N·Q scored pairs
    Q("q_sim_join_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"),
            Similarity.toDouble(col("embedding")).as("qv"))
        val corpus = emb.filter(col("vec_id") >= 3)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("cv"))
        // rank on the ROUNDED similarity: the raw-float cut is
        // ulp-sensitive across engines (see bruteForceTopK)
        val scored = corpus.crossJoin(broadcast(queries))
          .select(col("q_id"), col("vec_id"),
            round(Similarity.cosine(col("qv"), col("cv")), 4).as("sim"))
        org.apache.spark.sql.graftnative.TopKPerKey(
            scored, keyCols = Seq("q_id"),
            orderCols = Seq(col("sim").desc, col("vec_id")), k = 3)
          .orderBy("q_id", "vec_id")
      },
      Some("""SELECT q_id, vec_id, sim FROM (
                SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                    CAST(c.embedding AS DOUBLE[])), 4) AS sim,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                               CAST(c.embedding AS DOUBLE[])), 4) DESC,
                                  c.vec_id) AS rn
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 3 AND c.vec_id >= 3) WHERE rn <= 3
              ORDER BY q_id, vec_id""")),

    // single-pass frequent-items sketch (Karp et al. misra-gries style via
    // df.stat.freqItems): the approximate heavy-hitters pass a pipeline
    // runs before exact counting. Oracle-able HERE because support=0.1
    // allocates ceil(1/0.1)=10 counters and events has 5 distinct types —
    // Misra-Gries with more counters than distinct keys never evicts, so
    // the sketch output is EXACTLY the distinct set (deterministic, not
    // approximate). Exploded to scalar rows for the driver compare.
    Q("q_freq_items",
      (s, dir) => t(s, dir, "events").stat
        .freqItems(Seq("event_type"), 0.1)
        .select(explode(col("event_type_freqItems")).as("item"))
        .orderBy("item"),
      Some("SELECT DISTINCT event_type AS item FROM events ORDER BY item")),

    // IVF with Lloyd-trained (spherical k-means) centroids instead of the
    // hash sample — better cell balance, same partition-prunable plan. The
    // oracle unrolls the 3 Lloyd iterations in SQL (possible because init,
    // assignment, and per-round means are all pinned to engine-portable
    // values — see ivfKmeansOracleSql / kmeansCentroids)
    Q("q_ann_ivf_kmeans",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val rest = emb.filter(col("vec_id") =!= 0)
        val centroids = Similarity.kmeansCentroids(rest, k = 16, iters = 3)
        Similarity.ivfTopK(Similarity.ivfAssignWith(rest, centroids), centroids,
          q, k = 10, nProbe = 4)
      },
      Some(ivfKmeansOracleSql(k = 16, iters = 3, nProbe = 4, topK = 10, dim = 64))),

    // incremental IVF index maintenance — the production serving shape: a
    // NEW vector batch (vec_id ≥ 400) is admitted by assigning it through
    // the EXISTING centroids (trained on the base slice only, never
    // retrained); queries serve base + batch through the same partition-
    // prunable cells. Retraining cost is deferred to an offline cadence —
    // at 100 TB the assignment of a day's batch is one narrow map over
    // the batch (k·d broadcast), not a k-means pass over the corpus. The
    // oracle trains on the base predicate and assigns/probes the full
    // corpus predicate, so centroid staleness is replayed exactly.
    Q("q_ann_ivf_incremental",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val base = emb.filter(col("vec_id") =!= 0 && col("vec_id") < 400)
        val batch = emb.filter(col("vec_id") >= 400)
        val centroids = Similarity.kmeansCentroids(base, k = 16, iters = 3)
        val assigned = Similarity.ivfAssignWith(base, centroids)
          .unionByName(Similarity.ivfAssignWith(batch, centroids))
        Similarity.ivfTopK(assigned, centroids, q, k = 10, nProbe = 4)
      },
      Some(ivfKmeansOracleSql(k = 16, iters = 3, nProbe = 4, topK = 10,
        dim = 64, trainPred = "id <> 0 AND id < 400", corpusPred = "id <> 0"))),

    // product quantization ANN (Jégou et al.): 8 subspaces × 16 codewords
    // (a 64-bit code per vector), ADC scoring via the query's exact
    // codeword-distance table. The oracle re-derives the sampled
    // codebooks, replays every per-subspace argmin on the 6 dp grid, and
    // recomputes the ADC sums — code assignment and the final top-k are
    // checked end-to-end
    Q("q_ann_pq",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val q = Similarity.collectQueryVec(emb, 0)
        val rest = emb.filter(col("vec_id") =!= 0)
        val cbs = Similarity.pqSampleCodebooks(rest, m = 8, k = 16)
        Similarity.pqTopK(Similarity.pqEncode(rest, cbs), cbs, q, topK = 10)
      },
      Some(s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              rest AS (SELECT * FROM emb WHERE id <> 0),
              samp AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS c, ce
                FROM (SELECT id, e AS ce,
                    ${graft.operators.PortableHash.duckSql("CAST(id AS VARCHAR)")} AS h
                  FROM rest ORDER BY h, id LIMIT 16)),
              jj AS (SELECT unnest(range(0, 8)) AS j),
              dist AS (SELECT r.id, jj.j, s.c,
                  round(list_sum([(r.e[jj.j * 8 + i] - s.ce[jj.j * 8 + i]) *
                                  (r.e[jj.j * 8 + i] - s.ce[jj.j * 8 + i])
                                  FOR i IN range(1, 9)]), 6) AS d
                FROM rest r, jj, samp s),
              codes AS (SELECT id, j, c FROM (
                  SELECT id, j, c, row_number() OVER (PARTITION BY id, j
                    ORDER BY d, c) AS rn FROM dist) WHERE rn = 1),
              lut AS (SELECT jj.j, s.c,
                  round(list_sum([(q.e[jj.j * 8 + i] - s.ce[jj.j * 8 + i]) *
                                  (q.e[jj.j * 8 + i] - s.ce[jj.j * 8 + i])
                                  FOR i IN range(1, 9)]), 6) AS d
                FROM (SELECT e FROM emb WHERE id = 0) q, jj, samp s),
              score AS (SELECT id, round(sum(l.d), 4) AS adc_dist
                FROM codes c JOIN lut l ON l.j = c.j AND l.c = c.c
                GROUP BY id)
              SELECT id AS vec_id, adc_dist FROM score
              ORDER BY adc_dist, vec_id LIMIT 10""")),

    // embedding norm audit — the QA gate run before any cosine-based
    // stage: L2-norm distribution + degenerate-vector count. One narrow
    // per-row fold (no shuffle until the single global aggregate), so it
    // rides along with ingest at any scale. Norms are rounded to 3 dp
    // BEFORE aggregating on BOTH engines so the audit statistics are
    // computed over bit-identical inputs (the fold itself is same-order
    // double math — left fold in Spark `aggregate`, sequential list_sum
    // in DuckDB — but rounding first removes even that coupling).
    Q("q_embed_norm_audit",
      (s, dir) => {
        val nrm = round(
          sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 3)
        t(s, dir, "embeddings")
          .select(nrm.as("nrm"))
          .agg(count(lit(1)).as("n"),
            round(min(col("nrm")), 3).as("min_norm"),
            round(max(col("nrm")), 3).as("max_norm"),
            round(avg(col("nrm")), 4).as("avg_norm"),
            sum(when(col("nrm") < 0.001, 1L).otherwise(0L)).as("n_degenerate"))
      },
      Some("""WITH norms AS (
                SELECT round(sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 3) AS nrm
                FROM embeddings)
              SELECT count(*) AS n,
                round(min(nrm), 3) AS min_norm,
                round(max(nrm), 3) AS max_norm,
                round(avg(nrm), 4) AS avg_norm,
                CAST(sum(CASE WHEN nrm < 0.001 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_degenerate
              FROM norms""")),

    // SEMANTIC decontamination — the embedding-space member of the
    // decontamination family (n-gram exact: q_decontaminate; bloom:
    // q_decontaminate_bloom): flag corpus vectors within cosine t of ANY
    // benchmark vector. The scale shape mirrors the n-gram one — the
    // benchmark side is small and BROADCAST, the corpus side is map-only
    // (per-row max over the broadcast set, partial-aggregated before the
    // single shuffle), so cost is corpus × |benchmark| — LINEAR in the
    // corpus for the production case of a FIXED benchmark suite. A
    // benchmark too large to broadcast routes through the ANN bucket path
    // instead (annTopKAuto per benchmark vector — same machinery, already
    // driver-gated). NOTE the ×100 fixture grows BOTH sides (benchmark =
    // vec_id ≡ 0 mod 50 scales with the corpus), so the measured ×100
    // number is the quadratic regime by construction — see BENCH_SF10
    // addendum 11 for the arithmetic; sublinear candidate generation at
    // t = 0.4 is below the documented GW feasibility boundary, so the
    // honest scale lever is the fixed benchmark, not LSH.
    // t = 0.4 flags the planted near-dup structure without sweeping in
    // the background.
    Q("q_decontaminate_semantic",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val bench = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"))
        emb.filter(col("vec_id") % 50 =!= 0)
          .join(broadcast(bench))
          .groupBy("vec_id")
          .agg(round(max(Similarity.cosine(col("embedding"), col("bvec"))), 4)
            .as("max_cos"))
          .filter(col("max_cos") >= 0.4)
          .orderBy("vec_id")
      },
      Some("""WITH bench AS (SELECT embedding AS bvec
                FROM embeddings WHERE vec_id % 50 = 0),
              sims AS (SELECT vec_id,
                  round(max(list_cosine_similarity(embedding, bvec)), 4)
                    AS max_cos
                FROM embeddings, bench
                WHERE vec_id % 50 <> 0 GROUP BY vec_id)
              SELECT vec_id, max_cos FROM sims
              WHERE max_cos >= 0.4 ORDER BY vec_id""")),

    // hard-negative mining for contrastive training: per anchor, the 5
    // most-similar DIFFERENT-label corpus vectors — broadcast anchor
    // batch, map-side partial top-k heap (TopKPerKey), shuffle carries at
    // most k rows per (anchor, partition). Oracle brute-forces the same
    // rounded-sim ranking with the identical (sim DESC, id) tie-break.
    Q("q_hard_negatives",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb, k = 5)
          .orderBy("anchor_id", "neg_id")
      },
      Some("""SELECT anchor_id, neg_id, sim FROM (
                SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
                  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[])), 4) AS sim,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                          CAST(c.embedding AS DOUBLE[])), 4) DESC,
                             c.vec_id) AS rn
                FROM embeddings a, embeddings c
                WHERE a.vec_id < 20 AND c.label <> a.label
                  AND c.vec_id <> a.vec_id)
              WHERE rn <= 5 ORDER BY anchor_id, neg_id"""))
  )

  // ------------------------------------------------- perceptual media dedup
  // The three perceptual near-dup modalities, driver-gated THROUGH the real
  // codecs. A SQL engine cannot decode PNG/WAV/GIF, so the gate runs the
  // other way around: each entry synthesizes REAL payloads in-executor
  // whose DECODED sketch is derivable in closed form from doc_id
  // (MediaGen: planted luma walks in lossless PNG, planted RMS-level walks
  // in lossless WAV, binary-grid GIF frames from a shared pool), Spark
  // runs encode → ImageIO/JavaSound decode → perceptual sketch → pair
  // join, and the oracle recomputes the sketches ARITHMETICALLY (the
  // portable md5-60-bit convention) and brute-forces the pairs. Any drift
  // anywhere in the codec→sketch→pair path — resampler, luma weights, RMS
  // binning, banding, Jaccard — lands as a driver hash mismatch. Pair
  // structure: (2g, 2g+1) at hamming g%9 (image/audio) / frame-window
  // shift g%5 (video); see MediaGen's scaladoc.

  private val media: Seq[Q] = {
    import graft.operators.{MediaGen, Multimodal}

    /** Closed-form planted-sketch CTEs (ids → per-group flip masks → sh),
      * shared by the image and audio oracles — only the hash seed differs.
      * The brute-force pair scan is O(n²) but runs only at the verify tier
      * (500 docs = 125k comparisons); Spark runs the real banded machinery.
      */
    def plantedPairSql(seed: String): String =
      s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  CAST(doc_id AS BIGINT) // 2 AS g,
                  CAST(doc_id AS BIGINT) % 2 AS m
                FROM documents),
              msk AS (SELECT g, CAST(COALESCE(sum(CASE WHEN j < g % 9
                    THEN CAST(1 AS BIGINT) << CAST((g * 7 + j * 13) % 60 AS INT)
                    END), 0) AS BIGINT) AS mask
                FROM (SELECT DISTINCT g FROM ids), (SELECT unnest(range(0, 8)) AS j)
                GROUP BY g),
              sk AS (SELECT id,
                  CASE WHEN m = 1
                    THEN xor(CAST(('0x' || substr(md5('$seed:' || g), 1, 15)) AS BIGINT), mask)
                    ELSE CAST(('0x' || substr(md5('$seed:' || g), 1, 15)) AS BIGINT)
                  END AS sh
                FROM ids JOIN msk USING (g))
              SELECT a.id AS id_a, b.id AS id_b,
                CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
              FROM sk a JOIN sk b ON a.id < b.id
              WHERE bit_count(xor(a.sh, b.sh)) <= 6
              ORDER BY id_a, id_b"""

    Seq(
      // PNG → ImageIO decode → 9×8 bilinear luma grid → dHash →
      // value-banded hamming join. The PNG is lossless and IS the dHash
      // grid, so decode must reproduce the planted 60-bit sketch exactly.
      // header-only metadata sniff: real encoded PNG/JPEG/WAV payloads
      // whose dims/sample shape are closed-form in doc_id — sniffMeta
      // reads container headers (IHDR / SOF walk / fmt chunk), never
      // decodes, and must reproduce the construction exactly
      Q("q_media_sniff",
        (s, dir) => Multimodal.sniffMeta(MediaGen.sniffItems(t(s, dir, "documents")))
          .toDF().orderBy("media_id"),
        Some("""SELECT CAST(doc_id AS BIGINT) AS media_id,
                  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
                    WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
                  CAST(CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 8 + doc_id % 24
                    WHEN 1 THEN 16 + doc_id % 16
                    ELSE 8000 + (doc_id % 10) * 500 END AS INT) AS width,
                  CAST(CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 8 + (doc_id // 24) % 24
                    WHEN 1 THEN 16 + (doc_id * 3) % 16
                    ELSE 1 + doc_id % 2 END AS INT) AS height
                FROM documents ORDER BY media_id""")),

      Q("q_media_image_neardup",
        (s, dir) => Multimodal.imageNearDupPairs(
            MediaGen.imageItems(t(s, dir, "documents")), maxHamming = 6)
          .orderBy("id_a", "id_b"),
        Some(plantedPairSql("img"))),

      // WAV → JavaSound PCM decode → 65-bin RMS envelope → consecutive-bin
      // comparison hash → the same shared hamming join. Constant per-bin
      // levels make each RMS a dyadic rational — exact on both engines.
      Q("q_media_audio_neardup",
        (s, dir) => Multimodal.audioNearDupPairs(
            MediaGen.audioItems(t(s, dir, "documents")), maxHamming = 6)
          .orderBy("id_a", "id_b"),
        Some(plantedPairSql("aud"))),

      // 4-frame GIF → sequence decode → per-frame dHash sets → posting
      // join → exact Jaccard. Frames come from a shared pool (binary 9×8
      // grids: a 2-color palette survives GIF quantization exactly), so
      // frame-HASH Jaccard equals the closed-form frame-INDEX Jaccard —
      // a decoder drift or pool dHash collision shrinks an intersection
      // and fails the compare.
      Q("q_media_video_neardup",
        (s, dir) => Multimodal.videoNearDupPairs(
            MediaGen.videoItems(t(s, dir, "documents")), threshold = 0.5)
          .orderBy("id_a", "id_b"),
        Some("""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id,
                    CAST(doc_id AS BIGINT) // 2 AS g,
                    CAST(doc_id AS BIGINT) % 2 AS m
                  FROM documents),
                fr AS (SELECT id, g * 9 + (CASE WHEN m = 1 THEN g % 5 ELSE 0 END) + j AS fi
                  FROM ids, (SELECT unnest(range(0, 4)) AS j)),
                sz AS (SELECT id, count(*) AS sz FROM fr GROUP BY id),
                common AS (SELECT a.id AS id_a, b.id AS id_b,
                    CAST(count(*) AS DOUBLE) AS inter
                  FROM fr a JOIN fr b ON a.fi = b.fi AND a.id < b.id
                  GROUP BY 1, 2)
                SELECT id_a, id_b,
                  round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
                FROM common JOIN sz sa ON sa.id = id_a JOIN sz sb ON sb.id = id_b
                WHERE round(inter / (sa.sz + sb.sz - inter), 4) >= 0.5
                ORDER BY id_a, id_b""")),

      // the int8 quantization error bound, corpus-audited: drives the REAL
      // quantizeInt8 → dequantize path and reports, over every component
      // of every vector, the violation count of |x − x̂| ≤ scale/2 (must
      // be 0) and the worst observed err/(scale/2) ratio (≤ 1). Every
      // arithmetic step is bit-deterministic (see quantizeInt8's
      // scaladoc), so the oracle replays it exactly.
      Q("q_quant_error_bound",
        (s, dir) => {
          val emb = t(s, dir, "embeddings")
          val orig = emb.select(col("vec_id").cast("long").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          val err = orig.join(Similarity.quantizeInt8(emb), Seq("id"))
            .withColumn("max_err", aggregate(
              zip_with(col("v"), Similarity.dequantize(col("qv"), col("scale")),
                (x, r) => abs(x - r)),
              lit(0.0), (acc, e) => greatest(acc, e)))
          err.agg(
            count(lit(1)).as("n_vectors"),
            sum(when(col("max_err") > col("scale") / 2, 1L).otherwise(0L))
              .as("n_violations"),
            round(max(when(col("scale") === 0.0, 0.0)
              .otherwise(col("max_err") * 2 / col("scale"))), 4).as("worst_ratio"))
        },
        Some("""WITH qz AS (SELECT CAST(vec_id AS BIGINT) AS id,
                    CAST(embedding AS DOUBLE[]) AS v,
                    list_max(list_transform(CAST(embedding AS DOUBLE[]),
                      x -> abs(x))) / 127.0 AS scale
                  FROM embeddings),
                e AS (SELECT id, scale,
                    CASE WHEN scale = 0 THEN 0.0 ELSE
                      list_max(list_transform(v, x ->
                        abs(x - greatest(-127.0, least(127.0,
                          floor(x / scale + 0.5))) * scale)))
                    END AS max_err
                  FROM qz)
                SELECT count(*) AS n_vectors,
                  CAST(sum(CASE WHEN max_err > scale / 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
                  round(max(CASE WHEN scale = 0 THEN 0.0
                    ELSE max_err * 2 / scale END), 4) AS worst_ratio
                FROM e""")))
  }

  // ----------------------------------------------------------- taxi parity
  // The reference's own program (SURVEY.md §2l) over the deterministic
  // fixture. The fixture is not one of the driver's parquet tables, so
  // each oracle embeds it as a VALUES CTE and RE-DERIVES the cleaning
  // lineage in DuckDB SQL (TaxiOracle) — the analytics are checked
  // end-to-end against an independent engine, not just rows>0. Golden
  // values additionally asserted in TaxiPipelineSpec.

  private val taxi: Seq[Q] = {
    import graft.taxi.{Analytics, Cleaning, TaxiFixture}
    def cleanedFixture(s: SparkSession): DataFrame =
      Cleaning.pipeline(TaxiFixture.raw(s))
    Seq(
      // timestamps compared as formatted strings: the parquet dump is
      // tz-aware UTC, DuckDB's TIMESTAMP is naive — value-identical,
      // representation-different
      Q("q_taxi_pipeline",
        (s, _) => cleanedFixture(s)
          .withColumn("tpep_pickup_datetime",
            date_format(col("tpep_pickup_datetime"), "yyyy-MM-dd HH:mm:ss"))
          .withColumn("tpep_dropoff_datetime",
            date_format(col("tpep_dropoff_datetime"), "yyyy-MM-dd HH:mm:ss"))
          .orderBy("tpep_pickup_datetime", "PULocationID"),
        Some(TaxiOracle.pipeline)),
      Q("q_taxi_q1_tip_pct",
        (s, _) => Analytics.q1TipPctByAirportPickup(cleanedFixture(s))
          .withColumn("average_tip_percentage",
            round(col("average_tip_percentage"), 4))
          .orderBy("is_airport_pickup"),
        Some(TaxiOracle.q1TipPct)),
      Q("q_taxi_q2_route_duration",
        (s, _) => Analytics.q2AvgDurationByRoute(cleanedFixture(s))
          .withColumn("avg_duration_min", round(col("avg_duration_min"), 4))
          .orderBy("PULocationID", "DOLocationID"),
        Some(TaxiOracle.q2RouteDuration)),
      Q("q_taxi_q3_payment_count",
        (s, _) => Analytics.q3CountByPaymentType(cleanedFixture(s)),
        Some(TaxiOracle.q3PaymentCount)),
      Q("q_taxi_q4_payment_rank",
        (s, _) => Analytics.q4PaymentRankByRateCode(cleanedFixture(s))
          .orderBy("RatecodeID", "rank", "payment_type"),
        Some(TaxiOracle.q4PaymentRank)),
      Q("q_taxi_q5_congestion",
        (s, _) => Analytics.q5Congestion(cleanedFixture(s))
          .withColumn("avg_speed_mph", round(col("avg_speed_mph"), 4))
          .withColumn("avg_duration_min", round(col("avg_duration_min"), 4))
          .orderBy("time_of_day_slot"),
        Some(TaxiOracle.q5Congestion)),
      Q("q_taxi_q6_fare_slot_dow",
        (s, _) => Analytics.q6FareBySlotAndDow(cleanedFixture(s)),
        Some(TaxiOracle.q6FareSlotDow)),
      // re-sorted with a (PU, DO) tiebreak: the reference's bare
      // count-desc ordering is nondeterministic across engines on ties
      Q("q_taxi_q7_top_routes",
        (s, _) => Analytics.q7TopRoutes(cleanedFixture(s))
          .orderBy(col("trip_count").desc, col("PULocationID"), col("DOLocationID")),
        Some(TaxiOracle.q7TopRoutes)),
      Q("q_taxi_q8_airport_stats",
        (s, _) => Analytics.q8AirportVsNonAirport(cleanedFixture(s)),
        Some(TaxiOracle.q8AirportStats)),
      Q("q_taxi_corr_duration_tip",
        (s, _) => Analytics.corrDurationTipByPayment(cleanedFixture(s))
          .withColumn("corr_duration_tip", round(col("corr_duration_tip"), 4))
          .orderBy(col("corr_duration_tip").desc_nulls_last, col("payment_type")),
        Some(TaxiOracle.corrDurationTip)),
      // the one scalar-returning reference query (cell 101), exposed as a
      // 1-row frame; rounding matches the oracle's round(…, 4)
      Q("q_taxi_airport_share",
        (s, _) => {
          import s.implicits._
          Seq(BigDecimal(Analytics.airportPickupShare(cleanedFixture(s)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
            .toDF("airport_pickup_share_pct")
        },
        Some(TaxiOracle.airportShare)),
      // the broadcast zone-dimension join the reference implies but never
      // ships (SURVEY.md §2c) — replaces the hardcoded airport-ID list
      Q("q_taxi_zone_join",
        (s, _) => {
          import s.implicits._
          val zones = Seq(
            (1, "EWR", "Newark Airport", "EWR"),
            (132, "Queens", "JFK Airport", "Airports"),
            (138, "Queens", "LaGuardia Airport", "Airports"),
            (236, "Manhattan", "Upper East Side North", "Yellow Zone"),
            (237, "Manhattan", "Upper East Side South", "Yellow Zone"))
            .toDF("LocationID", "Borough", "Zone", "service_zone")
          val trips = cleanedFixture(s)
          trips.join(broadcast(zones), trips("PULocationID") === zones("LocationID"))
            .groupBy("Borough")
            .agg(count(lit(1)).as("trips"), round(avg("fare_amount"), 2).as("avg_fare"))
            .orderBy("Borough")
        },
        Some(TaxiOracle.zoneJoin)))
  }

  // ------------------------------------------------- round-9 session 8
  // New operator families: the quantile member of the sketch-as-a-table
  // family, BM25 retrieval + hybrid rank fusion, link-prediction scoring,
  // dictionary taxonomy tagging, time-decayed aggregates, l-diversity.

  private val session8: Seq[Q] = Seq(

    // log-linear histogram quantile sketch (HdrHistogram / DDSketch
    // family): per-(returnflag, ship-month) sketch rows MERGED to
    // per-returnflag — the Spark side exercises the incremental merge
    // path while the oracle builds the sketch directly from the data, so
    // a green row PROVES merge == direct build (counts sum per bucket)
    // on top of the bucket math itself. p50/p95/p99 estimates audited
    // against the exact disc quantile with the published relative bound
    // 2^-(subBits+1) = 0.03125 (+ half-cent grid slack).
    Q("q_quantile_sketch",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val monthly = graft.operators.Sketches.logHistSketch(
          li.withColumn("mth", month(col("l_shipdate"))),
          col("l_extendedprice"), Seq("l_returnflag", "mth"))
        val merged = graft.operators.Sketches.logHistMerge(
          monthly, Seq("l_returnflag"))
        val est = graft.operators.Sketches.logHistQuantiles(
          merged, Seq("l_returnflag"), Seq(0.5, 0.95, 0.99))
        // exact-disc audit via sketch-guided selection (two passes, sorts
        // ONLY the winning buckets — the per-group full sort this audit
        // first shipped with was a measured 90.8 s ×100 wall; the whole
        // entry now reads 11.3 s at ×100, see BENCH_SF10 addendum 28)
        // subBits = 8 here: the selection pass wants the FINEST buckets
        // (winning-bucket population ~2^-9 of the group feeds the only
        // sort); the estimate path above keeps subBits = 4 to match the
        // published 2^-5 bound the oracle asserts
        val exact = graft.operators.Sketches.exactQuantilesViaSketch(
          li, col("l_extendedprice"), Seq("l_returnflag"), Seq(0.5, 0.95, 0.99),
          subBits = 8)
        est.join(exact, Seq("l_returnflag", "q"))
          .withColumn("rel_err", round(abs(col("est") - col("exact_v")) / col("exact_v"), 6))
          .select(col("l_returnflag"), col("q"), col("est"), col("exact_v"),
            col("rel_err"), (col("rel_err") <= 0.0315).as("within_bound"))
          .orderBy("l_returnflag", "q")
      },
      Some("""WITH c AS (SELECT l_returnflag AS rf,
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
                  l_extendedprice AS v
                FROM lineitem),
              b AS (SELECT rf,
                  CAST(CASE WHEN c <= 0 THEN -1
                    ELSE length(bin(c)) - 1 END AS INT) AS bhi,
                  CASE WHEN c <= 0 THEN CAST(0 AS BIGINT)
                    ELSE c >> greatest(length(bin(c)) - 1 - 4, 0) END AS blo
                FROM c),
              sk AS (SELECT rf, bhi, blo, count(*) AS ct FROM b GROUP BY 1, 2, 3),
              cum AS (SELECT rf, bhi, blo, ct,
                  sum(ct) OVER (PARTITION BY rf ORDER BY bhi, blo
                    ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(ct) OVER (PARTITION BY rf) AS n
                FROM sk),
              qs AS (SELECT CAST(q AS DOUBLE) AS q
                FROM (VALUES (0.5), (0.95), (0.99)) t(q)),
              est AS (SELECT rf, q,
                  CASE WHEN bhi = -1 THEN 0.0 ELSE
                    round((blo * 2 * (CAST(1 AS BIGINT) << greatest(bhi - 4, 0))
                      + (CAST(1 AS BIGINT) << greatest(bhi - 4, 0)) - 1)
                      / 2.0 / 100.0, 6) END AS est
                FROM cum, qs
                WHERE cum >= greatest(CAST(ceil(q * n) AS BIGINT), 1)
                  AND cum - ct < greatest(CAST(ceil(q * n) AS BIGINT), 1)),
              rk AS (SELECT rf, v,
                  row_number() OVER (PARTITION BY rf ORDER BY v) AS rn,
                  count(*) OVER (PARTITION BY rf) AS n
                FROM c),
              ex AS (SELECT rk.rf, q, v AS exact_v FROM rk, qs
                WHERE rn = greatest(CAST(ceil(q * n) AS BIGINT), 1))
              SELECT est.rf AS l_returnflag, est.q AS q, est.est, ex.exact_v,
                round(abs(est.est - ex.exact_v) / ex.exact_v, 6) AS rel_err,
                (round(abs(est.est - ex.exact_v) / ex.exact_v, 6) <= 0.0315)
                  AS within_bound
              FROM est JOIN ex ON est.rf = ex.rf AND est.q = ex.q
              ORDER BY l_returnflag, est.q""")),

    // Okapi BM25 ranked retrieval: 'dup' is the rare high-idf
    // discriminator (df 26/500 vs ~450 for the common terms), so the
    // ranking is dominated by dup-bearing docs — a real relevance
    // ordering, not a length artifact. Constants are spliced from the
    // same Scala doubles the Spark expression uses.
    Q("q_bm25_topk",
      (s, dir) => TextAnalysis.bm25TopK(
          t(s, dir, "documents"), Seq("dup", "join", "hash"), topK = 15)
        .select(col("id").as("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")),
      Some(s"""WITH tk AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  list_filter(regexp_split_to_array(text, ' '), x -> x <> '') AS t
                FROM documents),
              dl AS (SELECT id, len(t) AS dl FROM tk
                WHERE t IS NOT NULL AND len(t) > 0),
              st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
              tf AS (SELECT id, tok, CAST(count(*) AS DOUBLE) AS tf
                FROM (SELECT id, unnest(t) AS tok FROM tk)
                WHERE tok IN ('dup', 'join', 'hash') GROUP BY id, tok),
              dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok)
              SELECT id AS doc_id,
                round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * (tf * ${1.2 + 1}) / (tf + ${1.2} * (1 - ${0.75} + ${0.75} * dl / avgdl))), 6)
                  AS bm25
              FROM tf JOIN dfq USING (tok) JOIN dl USING (id), st
              GROUP BY id ORDER BY bm25 DESC, doc_id LIMIT 15""")),

    // hybrid retrieval via reciprocal-rank fusion (Cormack et al., SIGIR
    // 2009): the BM25 lexical ranking and the embedding cosine ranking
    // fuse as Σ 1/(60 + rank) — rank arithmetic only, so the fusion is
    // exactly replayable even though the two source scores live on
    // different scales. doc_id and vec_id share the fixture id space by
    // construction (TESTDATA.md). Lists are top-50 each; absent-from-a-
    // list contributes 0 — the standard RRF convention.
    Q("q_hybrid_rrf",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val qv = Similarity.collectQueryVec(emb, 0)
        val cosTop = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") =!= 0), qv, k = 50)
          .withColumn("r_cos", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id"))))
          .select(col("vec_id").as("id"), col("r_cos"))
        val bmTop = TextAnalysis.bm25TopK(
            t(s, dir, "documents"), Seq("dup", "join", "hash"), topK = 50)
          .withColumn("r_bm", row_number().over(
            Window.orderBy(col("bm25").desc, col("id"))))
          .select(col("id"), col("r_bm"))
        cosTop.join(bmTop, Seq("id"), "full_outer")
          .withColumn("rrf", round(
            coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("r_bm")), lit(0.0)), 6))
          .select(col("id").as("doc_id"), col("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH cos AS (SELECT vec_id AS id, round(sim_raw, 4) AS sim FROM (
                  SELECT vec_id, list_cosine_similarity(
                    CAST(embedding AS DOUBLE[]),
                    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
                  ) AS sim_raw FROM embeddings WHERE vec_id <> 0)
                ORDER BY sim DESC, id LIMIT 50),
              rc AS (SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r_cos
                FROM cos),
              tk AS (SELECT CAST(doc_id AS BIGINT) AS id,
                  list_filter(regexp_split_to_array(text, ' '), x -> x <> '') AS t
                FROM documents),
              dl AS (SELECT id, len(t) AS dl FROM tk
                WHERE t IS NOT NULL AND len(t) > 0),
              st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
              tf AS (SELECT id, tok, CAST(count(*) AS DOUBLE) AS tf
                FROM (SELECT id, unnest(t) AS tok FROM tk)
                WHERE tok IN ('dup', 'join', 'hash') GROUP BY id, tok),
              dfq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
              bm AS (SELECT id,
                  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                    * (tf * ${1.2 + 1}) / (tf + ${1.2} * (1 - ${0.75} + ${0.75} * dl / avgdl))), 6)
                    AS bm25
                FROM tf JOIN dfq USING (tok) JOIN dl USING (id), st
                GROUP BY id ORDER BY bm25 DESC, id LIMIT 50),
              rb AS (SELECT id, row_number() OVER (ORDER BY bm25 DESC, id) AS r_bm
                FROM bm)
              SELECT coalesce(rc.id, rb.id) AS doc_id,
                round(coalesce(1.0 / (60 + r_cos), 0.0)
                  + coalesce(1.0 / (60 + r_bm), 0.0), 6) AS rrf
              FROM rc FULL OUTER JOIN rb ON rc.id = rb.id
              ORDER BY rrf DESC, doc_id LIMIT 10""")),

    // link-prediction scoring: supplier pairs ranked by Adamic-Adar over
    // shared customers (the customer-supplier graph q_graph_bfs walks).
    // maxDegree = 60 exercises the hub cap — customers buying from more
    // than 60 suppliers are boilerplate, all candidate volume and no
    // signal, and drop with reduced-graph semantics the oracle replays.
    // RETAINED AS A MEASURED SCALE COUNTER-EXAMPLE: all-pairs enumeration
    // is Σ deg² candidates (~1.8B at ×100 — measured heap death on the
    // 32-partition single-box bench, BENCH_SF10); the scale-safe path is
    // q_link_scores_candidates (score a bounded candidate list).
    Q("q_link_scores",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))
        graft.operators.GraphRank.linkScores(edges, maxDegree = 60)
          .orderBy(col("adamic_adar").desc, col("src_a"), col("src_b"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT DISTINCT l_suppkey AS src, o_custkey AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              deg AS (SELECT dst, count(*) AS deg FROM e GROUP BY dst
                HAVING count(*) >= 2 AND count(*) <= 60),
              p AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (dst))
              SELECT a.src AS src_a, b.src AS src_b,
                count(*) AS common,
                round(sum(1.0 / ln(a.deg)), 6) AS adamic_adar
              FROM p a JOIN p b ON a.dst = b.dst AND a.src < b.src
              GROUP BY 1, 2
              ORDER BY adamic_adar DESC, src_a, src_b LIMIT 20"""),
      counterExample = true),

    // the scale path q_link_scores' counter-example note names: score a
    // BOUNDED candidate list (here: consecutive-suppkey pairs standing in
    // for a blocking stage's output) against the graph — |candidates|·d̄
    // posting rows through two src-keyed joins, linear at any graph
    // size. Zero-common candidates come back scored (0, 0.0).
    Q("q_link_scores_candidates",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey").cast("long").as("k"))
        val cands = sup.as("a").join(sup.as("b"), col("b.k") === col("a.k") + 1)
          .select(col("a.k").as("src_a"), col("b.k").as("src_b"))
        graft.operators.GraphRank.scoreCandidatePairs(cands, edges, maxDegree = 60)
          .orderBy(col("adamic_adar").desc, col("src_a"))
          .limit(15)
      },
      Some("""WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                  CAST(o_custkey AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              deg AS (SELECT dst, count(*) AS deg FROM e GROUP BY dst
                HAVING count(*) <= 60),
              p AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (dst)),
              sup AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
              cands AS (SELECT a.k AS src_a, b.k AS src_b
                FROM sup a JOIN sup b ON b.k = a.k + 1),
              sc AS (SELECT src_a, src_b, count(*) AS common,
                  round(sum(1.0 / ln(pa.deg)), 6) AS adamic_adar
                FROM cands
                JOIN p pa ON pa.src = src_a
                JOIN p pb ON pb.src = src_b AND pb.dst = pa.dst
                GROUP BY 1, 2)
              SELECT c.src_a, c.src_b,
                coalesce(common, CAST(0 AS BIGINT)) AS common,
                coalesce(adamic_adar, 0.0) AS adamic_adar
              FROM cands c LEFT JOIN sc
                ON sc.src_a = c.src_a AND sc.src_b = c.src_b
              ORDER BY adamic_adar DESC, c.src_a LIMIT 15""")),

    // dictionary taxonomy tagging: a broadcast (term -> topic) dictionary
    // against the token stream — the flashtext/Aho-Corasick shape at
    // unigram granularity (phrase dicts swap the token stream for a
    // gram-window stream, same join). Per-topic doc and hit counts; text
    // never shuffles, only (id, topic) pairs do.
    Q("q_dict_tags",
      (s, dir) => {
        import s.implicits._
        val dict = broadcast(Seq(
          ("join", "exec"), ("hash", "exec"), ("merge", "exec"), ("sort", "exec"),
          ("scan", "storage"), ("table", "storage"), ("row", "storage"),
          ("column", "storage"), ("stream", "streaming"), ("window", "streaming"),
          ("batch", "streaming"), ("dup", "quality"), ("slow", "quality"),
          ("fast", "quality")).toDF("tok", "topic"))
        t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .join(dict, Seq("tok"))
          .groupBy("topic")
          .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_hits"))
          .orderBy("topic")
      },
      Some("""WITH dict(tok, topic) AS (VALUES
                ('join', 'exec'), ('hash', 'exec'), ('merge', 'exec'),
                ('sort', 'exec'), ('scan', 'storage'), ('table', 'storage'),
                ('row', 'storage'), ('column', 'storage'), ('stream', 'streaming'),
                ('window', 'streaming'), ('batch', 'streaming'), ('dup', 'quality'),
                ('slow', 'quality'), ('fast', 'quality')),
              tok AS (SELECT doc_id, unnest(list_filter(
                  regexp_split_to_array(text, ' '), x -> x <> '')) AS tok
                FROM documents)
              SELECT topic, count(DISTINCT doc_id) AS n_docs,
                count(*) AS n_hits
              FROM tok JOIN dict USING (tok)
              GROUP BY topic ORDER BY topic""")),

    // exponentially time-decayed aggregates (half-life 24 h against the
    // corpus max timestamp): the recency-weighted engagement metric shape.
    // Δt is an exact integer of epoch seconds, so the only float work is
    // exp and the sum — rounded on the repo's 4-dp double-sum grid.
    Q("q_decayed_value",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val tmax = broadcast(ev.agg(max(unix_timestamp(col("ts"))).as("tmax")))
        ev.crossJoin(tmax)
          .withColumn("w", exp(lit(-math.log(2.0) / 86400.0) *
            (col("tmax") - unix_timestamp(col("ts")))))
          .groupBy("event_type")
          .agg(round(sum(col("w") * col("value")), 4).as("decayed_value"),
            round(sum(col("w")), 4).as("decayed_count"))
          .orderBy("event_type")
      },
      Some(s"""WITH se AS (SELECT event_type, value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              tm AS (SELECT max(sec) AS tmax FROM se)
              SELECT event_type,
                round(sum(exp(${-math.log(2.0) / 86400.0} * (tmax - sec)) * value), 4)
                  AS decayed_value,
                round(sum(exp(${-math.log(2.0) / 86400.0} * (tmax - sec))), 4)
                  AS decayed_count
              FROM se, tm
              GROUP BY event_type ORDER BY event_type""")),

    // class-characteristic terms (the c-TF-IDF/BERTopic job on a corpus
    // whose tiny shared vocabulary makes classic idf degenerate): per
    // source, each token's share LIFT vs its corpus-wide share — what
    // characterizes this subcorpus. Two bounded aggregates + a window
    // rank over the (classes × vocab) table; the token stream shuffles
    // once.
    Q("q_class_terms",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val byClass = toks.groupBy("source", "tok").agg(count(lit(1)).as("tf"))
          .withColumn("cls_total", sum("tf").over(Window.partitionBy("source")))
        val overall = toks.groupBy("tok").agg(count(lit(1)).as("gtf"))
          .crossJoin(broadcast(toks.agg(count(lit(1)).as("gtotal"))))
        byClass.join(overall, Seq("tok"))
          .withColumn("lift", round(
            (col("tf") / col("cls_total").cast("double")) /
              (col("gtf") / col("gtotal").cast("double")), 6))
          .withColumn("rk", row_number().over(
            Window.partitionBy("source")
              .orderBy(col("lift").desc, col("tok"))))
          .filter(col("rk") <= 3)
          .select(col("source"), col("rk"), col("tok"), col("lift"))
          .orderBy("source", "rk")
      },
      Some("""WITH tok AS (SELECT source, unnest(list_filter(
                  regexp_split_to_array(text, ' '), x -> x <> '')) AS tok
                FROM documents),
              bc AS (SELECT source, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
              ct AS (SELECT source, tok, tf,
                  sum(tf) OVER (PARTITION BY source) AS cls_total FROM bc),
              ov AS (SELECT tok, count(*) AS gtf,
                  (SELECT count(*) FROM tok) AS gtotal FROM tok GROUP BY tok),
              lf AS (SELECT ct.source, ct.tok,
                  round((tf / CAST(cls_total AS DOUBLE))
                    / (gtf / CAST(gtotal AS DOUBLE)), 6) AS lift
                FROM ct JOIN ov ON ov.tok = ct.tok),
              rk AS (SELECT source, tok, lift, row_number() OVER (
                  PARTITION BY source ORDER BY lift DESC, tok) AS rk FROM lf)
              SELECT source, CAST(rk AS INT) AS rk, tok, lift FROM rk
              WHERE rk <= 3 ORDER BY source, rk""")),

    // inter-arrival-time behavior features: per event type, how long
    // since the same user's PREVIOUS event (any type) — one lag window
    // keyed by user, integer-second gaps, bounded per-type aggregate.
    Q("q_interarrival",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        t(s, dir, "events")
          .withColumn("sec", unix_timestamp(col("ts")))
          .withColumn("gap", col("sec") - lag("sec", 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            round(sum("gap") / count(lit(1)).cast("double"), 4).as("avg_gap_s"),
            max("gap").as("max_gap_s"))
          .orderBy("event_type")
      },
      Some("""WITH se AS (SELECT event_id, user_id, event_type,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              g AS (SELECT event_type,
                  sec - lag(sec) OVER (PARTITION BY user_id
                    ORDER BY sec, event_id) AS gap
                FROM se)
              SELECT event_type, count(*) AS n_gaps,
                round(sum(gap) / CAST(count(*) AS DOUBLE), 4) AS avg_gap_s,
                max(gap) AS max_gap_s
              FROM g WHERE gap IS NOT NULL
              GROUP BY event_type ORDER BY event_type""")),

    // Zipf-law audit over the token frequency table: least-squares slope
    // of ln(freq) on ln(rank) for the top-30 tokens — the corpus-
    // statistics sanity gate (natural text runs slope ≈ −1; synthetic or
    // templated corpora flatten). regr_slope/intercept over 30 rows.
    Q("q_zipf",
      (s, dir) => {
        val freq = t(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("tok").agg(count(lit(1)).as("f"))
          .orderBy(col("f").desc, col("tok")).limit(30)
          .withColumn("r", row_number().over(
            Window.orderBy(col("f").desc, col("tok"))))
        freq.agg(count(lit(1)).as("n_tokens"),
            round(expr("regr_slope(ln(f), ln(r))"), 4).as("zipf_slope"),
            round(expr("regr_intercept(ln(f), ln(r))"), 4).as("zipf_intercept"))
      },
      Some("""WITH f AS (SELECT tok, count(*) AS f FROM (
                  SELECT unnest(list_filter(regexp_split_to_array(text, ' '),
                    x -> x <> '')) AS tok FROM documents)
                GROUP BY tok ORDER BY f DESC, tok LIMIT 30),
              r AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
                FROM f)
              SELECT count(*) AS n_tokens,
                round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope,
                round(regr_intercept(ln(f), ln(r)), 4) AS zipf_intercept
              FROM r""")),

    // personalized PageRank: random walk with restart to the two smallest
    // customer nodes — proximity-to-seed features on the q_graph_bfs
    // graph. Rank state is SPARSE (starts at 2 rows, grows with the
    // frontier); 4 fixed rounds on the 7-dp grid, unrolled by the oracle
    // contrib-CTE + full-outer-teleport-stitch per round.
    Q("q_ppr",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = edges.select(col("src").as("node"))
          .distinct().orderBy("node").limit(2)
        graft.operators.GraphRank.personalizedPageRank(
            edges, seeds, iterations = 4)
          .orderBy("node")
      },
      Some {
        val rounds = (1 to 4).map { i =>
          s"""c$i AS (SELECT e.dst AS node, sum(r.r / d.deg) AS sc
                FROM edges e JOIN r${i - 1} r ON r.node = e.src
                JOIN deg d ON d.src = e.src GROUP BY e.dst),
              r$i AS (SELECT coalesce(c.node, t.node) AS node,
                  round(coalesce(t.tp, 0) + CAST(0.85 AS DOUBLE)
                    * coalesce(c.sc, 0), 7) AS r
                FROM c$i c FULL OUTER JOIN tp t ON t.node = c.node)"""
        }.mkString(",\n              ")
        s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                UNION SELECT dst AS src, src AS dst FROM e0),
              deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
              seeds AS (SELECT DISTINCT src AS node FROM edges
                ORDER BY node LIMIT 2),
              tp AS (SELECT node,
                  (1 - CAST(0.85 AS DOUBLE)) / 2 AS tp FROM seeds),
              r0 AS (SELECT node, round(CAST(1 AS DOUBLE) / 2, 7) AS r
                FROM seeds),
              $rounds
              SELECT node, r AS rank FROM r4 ORDER BY node"""
      }),

    // CUPED variance reduction (Deng et al., WSDM 2013) — the
    // experimentation-analytics shape: per-user pre/post period value
    // sums split at the corpus time midpoint, theta = cov(x,y)/var(x)
    // from 6-dp-anchored moments (the standardize convention: anchored
    // moments make every downstream adjusted value an IEEE-exact
    // function of numbers both engines agree on), adjusted post-period
    // means per deterministic variant (user_id parity). One grouped
    // pass + one single-row moment aggregate broadcast back.
    Q("q_cuped",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("sec", unix_timestamp(col("ts")))
        val mid = broadcast(ev.agg(
          ((min("sec") + max("sec")) / lit(2L)).cast("long").as("mid")))
        val byUser = ev.crossJoin(mid)
          .groupBy("user_id")
          .agg(
            round(coalesce(sum(when(col("sec") <= col("mid"), col("value"))),
              lit(0.0)), 6).as("x"),
            round(coalesce(sum(when(col("sec") > col("mid"), col("value"))),
              lit(0.0)), 6).as("y"))
        val moments = broadcast(byUser.agg(
          round(covar_samp("x", "y"), 6).as("cv"),
          round(var_samp("x"), 6).as("vx"),
          round(avg("x"), 6).as("mx")))
        byUser.crossJoin(moments)
          .withColumn("theta", col("cv") / col("vx"))
          .withColumn("y_adj", col("y") - col("theta") * (col("x") - col("mx")))
          .groupBy(pmod(col("user_id"), lit(2)).as("variant"))
          .agg(count(lit(1)).as("n_users"),
            round(avg("y"), 4).as("mean_y"),
            round(avg("y_adj"), 4).as("mean_y_adj"))
          .orderBy("variant")
      },
      Some("""WITH se AS (SELECT user_id, value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              md AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM se),
              bu AS (SELECT user_id,
                  round(coalesce(sum(CASE WHEN sec <= mid THEN value END), 0.0), 6) AS x,
                  round(coalesce(sum(CASE WHEN sec > mid THEN value END), 0.0), 6) AS y
                FROM se, md GROUP BY user_id),
              mo AS (SELECT round(covar_samp(x, y), 6) AS cv,
                  round(var_samp(x), 6) AS vx,
                  round(avg(x), 6) AS mx FROM bu)
              SELECT user_id % 2 AS variant, count(*) AS n_users,
                round(avg(y), 4) AS mean_y,
                round(avg(y - (cv / vx) * (x - mx)), 4) AS mean_y_adj
              FROM bu, mo GROUP BY 1 ORDER BY variant""")),

    // EWMA smoothing / one-step forecast per event-type hourly series:
    // the per-series state is a bounded sorted array (collect_list of
    // hourly buckets), the recursion folds on a 6-dp grid each step so
    // an independent engine's list_reduce replays it term-for-term.
    // Series parallelize across the groupBy; state never exceeds the
    // series length.
    Q("q_ewma_forecast",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).cast("double").as("n"))
        hourly.groupBy("event_type")
          .agg(sort_array(collect_list(struct(col("hr"), col("n")))).as("sl"))
          .withColumn("xs", transform(col("sl"), e => e.getField("n")))
          .select(col("event_type"), size(col("xs")).as("n_buckets"),
            aggregate(
              slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
              element_at(col("xs"), 1),
              (acc, x) => round(lit(0.3) * x + lit(0.7) * acc, 6)).as("ewma"))
          .orderBy("event_type")
      },
      Some("""WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                  CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2),
              s AS (SELECT event_type, list(n ORDER BY hr) AS xs
                FROM h GROUP BY 1)
              SELECT event_type, CAST(len(xs) AS INT) AS n_buckets,
                list_reduce(xs, (acc, x) ->
                  round(CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc, 6))
                  AS ewma
              FROM s ORDER BY event_type""")),

    // l-diversity audit (Machanavajjhala et al. 2006) — the k-anonymity
    // companion: per quasi-identifier group (mktsegment × nation), the
    // count of DISTINCT sensitive values (account-balance kilobucket);
    // groups below l = 3 are re-identification risks even when k is
    // satisfied (everyone in the group shares the sensitive value).
    Q("q_l_diversity",
      (s, dir) => t(s, dir, "customer")
        .withColumn("bal_kb", floor(col("c_acctbal") / 1000).cast("long"))
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("k"), countDistinct("bal_kb").as("l"))
        .withColumn("at_risk", col("l") < 3)
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""SELECT c_mktsegment, c_nationkey, count(*) AS k,
                count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l,
                (count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) < 3)
                  AS at_risk
              FROM customer GROUP BY 1, 2 ORDER BY 1, 2""")),

    // pairwise association rules (Apriori tier 2) over order baskets:
    // parts co-purchased in one order, support/confidence/lift, top-20
    // by lift. minPairCount = 3 is the absolute-support gate; the
    // maxItemDf hub cap stays open on the fixture (every item is rare)
    // but is the documented 100-TB lever.
    Q("q_assoc_rules",
      (s, dir) => graft.operators.Associations.pairRules(
          t(s, dir, "lineitem"), "l_orderkey", "l_partkey", minPairCount = 3)
        .orderBy(col("lift").desc, col("item_a"), col("item_b"))
        .limit(20),
      Some("""WITH bi AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS b,
                  CAST(l_partkey AS BIGINT) AS i FROM lineitem),
              dfq AS (SELECT i, count(*) AS n_i FROM bi GROUP BY i),
              p AS (SELECT bi.b, bi.i, dfq.n_i FROM bi JOIN dfq USING (i)),
              n AS (SELECT count(DISTINCT b) AS n FROM p),
              pr AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS n_ab,
                  any_value(a.n_i) AS n_a, any_value(c.n_i) AS n_b
                FROM p a JOIN p c ON a.b = c.b AND a.i < c.i
                GROUP BY 1, 2 HAVING count(*) >= 3)
              SELECT item_a, item_b, n_ab,
                round(n_ab / CAST(n AS DOUBLE), 6) AS support,
                round(n_ab / CAST(n_a AS DOUBLE), 6) AS conf_a_to_b,
                round(n_ab / CAST(n_b AS DOUBLE), 6) AS conf_b_to_a,
                round(n_ab * CAST(n AS DOUBLE) / (n_a * n_b), 6) AS lift
              FROM pr, n
              ORDER BY lift DESC, item_a, item_b LIMIT 20""")),

    // seeded differentially-private release of per-(lang, source) doc
    // counts: Laplace(1/eps) noise from the portable-hash inverse CDF —
    // reproducible release (fixed seed = fixed draw, the versioned-
    // data-release convention), replayed noise-for-noise by the oracle.
    // true_count rides beside noisy_count because this is the QA view;
    // the publishable view drops it.
    Q("q_dp_counts",
      (s, dir) => Profiling.dpNoisyCounts(
          t(s, dir, "documents"), Seq("lang", "source"), epsilon = 1.0)
        .orderBy("lang", "source"),
      Some(s"""WITH g AS (SELECT lang, source, count(*) AS true_count
                FROM documents GROUP BY 1, 2),
              u AS (SELECT lang, source, true_count,
                  (CAST(('0x' || substr(md5('dp:'
                    || coalesce(CAST(length(lang) AS VARCHAR) || '#' || lang, '~')
                    || ':'
                    || coalesce(CAST(length(source) AS VARCHAR) || '#' || source, '~')), 1, 15))
                    AS BIGINT) + 0.5) / ${math.pow(2.0, 60)} - 0.5 AS u
                FROM g)
              SELECT lang, source, true_count,
                round(true_count + ${-1.0 / 1.0} * sign(u) * ln(1.0 - abs(u) * 2), 4)
                  AS noisy_count
              FROM u ORDER BY lang, source""")),

    // sketch-driven equi-depth binning: decile boundaries come from the
    // log-hist quantile sketch (never a data sort), bin assignment is a
    // narrow map against the 9 broadcast boundary literals — the scale
    // path for feature discretization. Bin populations are equi-depth
    // within the sketch's 2^-5 relative bound; per-bin min/max audit the
    // monotone cut.
    Q("q_sketch_bins",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sk = graft.operators.Sketches.logHistSketch(
          li.withColumn("g", lit("all")), col("l_extendedprice"), Seq("g"))
        val qs = (1 to 9).map(_ / 10.0)
        val bounds = graft.operators.Sketches.logHistQuantiles(sk, Seq("g"), qs)
          .orderBy("q").collect().map(_.getDouble(2)) // 9 doubles: bounded collect
        val barr = array(bounds.map(lit): _*)
        li.select(col("l_extendedprice").as("v"))
          .withColumn("bin", size(filter(barr, b => col("v") > b)))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            round(min("v"), 2).as("lo"), round(max("v"), 2).as("hi"))
          .orderBy("bin")
      },
      Some("""WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
                  l_extendedprice AS v FROM lineitem),
              b AS (SELECT v,
                  CAST(CASE WHEN c <= 0 THEN -1
                    ELSE length(bin(c)) - 1 END AS INT) AS bhi,
                  CASE WHEN c <= 0 THEN CAST(0 AS BIGINT)
                    ELSE c >> greatest(length(bin(c)) - 1 - 4, 0) END AS blo
                FROM c),
              sk AS (SELECT bhi, blo, count(*) AS ct FROM b GROUP BY 1, 2),
              cum AS (SELECT bhi, blo, ct,
                  sum(ct) OVER (ORDER BY bhi, blo ROWS UNBOUNDED PRECEDING) AS cum,
                  sum(ct) OVER () AS n
                FROM sk),
              qs AS (SELECT CAST(q AS DOUBLE) / 10 AS q
                FROM (SELECT unnest(range(1, 10)) AS q)),
              bnd AS (SELECT q,
                  CASE WHEN bhi = -1 THEN 0.0 ELSE
                    round((blo * 2 * (CAST(1 AS BIGINT) << greatest(bhi - 4, 0))
                      + (CAST(1 AS BIGINT) << greatest(bhi - 4, 0)) - 1)
                      / 2.0 / 100.0, 6) END AS est
                FROM cum, qs
                WHERE cum >= greatest(CAST(ceil(q * n) AS BIGINT), 1)
                  AND cum - ct < greatest(CAST(ceil(q * n) AS BIGINT), 1)),
              binned AS (SELECT v,
                  (SELECT count(*) FROM bnd WHERE v > est) AS bin
                FROM (SELECT v FROM c))
              SELECT CAST(bin AS INT) AS bin, count(*) AS n,
                round(min(v), 2) AS lo, round(max(v), 2) AS hi
              FROM binned GROUP BY bin ORDER BY bin""")),

    // Newman modularity of the 4-round label-propagation communities on
    // the customer-supplier graph — the partition-quality audit. Both
    // numerators are integer aggregates, so Q is exact in any engine;
    // the oracle replays LPA round-for-round, then the two counts.
    Q("q_modularity",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        val comms = graft.operators.GraphRank.labelPropagation(edges, iterations = 4)
        graft.operators.GraphRank.modularity(edges, comms)
      },
      Some {
        val iters = (1 to 4).map { i =>
          s"""l$i AS (SELECT node, label FROM (
                SELECT e.dst AS node, l.label, count(*) AS c,
                  row_number() OVER (PARTITION BY e.dst
                    ORDER BY count(*) DESC, l.label) AS rn
                FROM edges e JOIN l${i - 1} l ON l.node = e.src
                GROUP BY e.dst, l.label) WHERE rn = 1)"""
        }.mkString(",\n              ")
        s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              edges AS (SELECT src, dst FROM e0
                UNION SELECT dst AS src, src AS dst FROM e0),
              l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
              $iters,
              und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                FROM edges WHERE src <> dst),
              lab AS (SELECT und.a, und.b, ca.label AS la, cb.label AS lb
                FROM und JOIN l4 ca ON ca.node = und.a
                JOIN l4 cb ON cb.node = und.b),
              deg AS (SELECT l, count(*) AS d FROM (
                  SELECT la AS l FROM lab UNION ALL SELECT lb FROM lab)
                GROUP BY l),
              dc2 AS (SELECT count(*) AS n_communities,
                  CAST(sum(d * d) AS BIGINT) AS sum_d2 FROM deg),
              base AS (SELECT count(*) AS m_edges,
                  CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
                    AS intra_edges
                FROM lab)
              SELECT n_communities, m_edges, intra_edges,
                round(intra_edges / CAST(m_edges AS DOUBLE)
                  - sum_d2 / CAST(m_edges * m_edges * 4 AS DOUBLE), 6)
                  AS modularity
              FROM base, dc2"""
      }))

  /** Round-9 session-9 additions: spectral/second-moment decompositions
    * over the embedding corpus (one distributed moments pass, driver-side
    * d×d eigenwork, fully unrolled DuckDB replay), HITS centrality, the
    * t-closeness member of the privacy-audit trio, Kaplan–Meier survival,
    * a two-proportion experiment z-test, and an HLL inclusion–exclusion
    * intersection audit.
    */
  private val session9: Seq[Q] = Seq(

    // HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
    // customer→supplier co-order graph — the query-dependent centrality
    // pair beside global q_pagerank. 6 rounds on the shared 7-dp grid;
    // the oracle unrolls both half-steps of every round as chained CTEs
    // (raw sums + one L2 scalar each — same replay doctrine as pagerank).
    Q("q_hits",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
        graft.operators.GraphRank.hits(edges, iterations = 6).orderBy("node")
      },
      Some {
        val rounds = (1 to 6).map { i =>
          val ph = if (i == 1) "h0" else s"h${i - 1}"
          s"""a${i}r AS MATERIALIZED (SELECT e.dst AS node, sum(h.h) AS x
                FROM e JOIN $ph h ON h.node = e.src GROUP BY e.dst),
              a$i AS MATERIALIZED (SELECT node,
                round(x / (SELECT sqrt(sum(x*x)) FROM a${i}r), 7) AS a
                FROM a${i}r),
              h${i}r AS MATERIALIZED (SELECT e.src AS node, sum(a.a) AS x
                FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src),
              h$i AS MATERIALIZED (SELECT node,
                round(x / (SELECT sqrt(sum(x*x)) FROM h${i}r), 7) AS h
                FROM h${i}r)"""
        }.mkString(",\n              ")
        s"""WITH e AS MATERIALIZED (
                SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              srcs AS (SELECT DISTINCT src FROM e),
              ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM srcs),
              h0 AS (SELECT src AS node,
                round(CAST(1 AS DOUBLE) / sqrt((SELECT n FROM ns)), 7) AS h
                FROM srcs),
              $rounds
              SELECT coalesce(h6.node, a6.node) AS node,
                coalesce(h6.h, CAST(0 AS DOUBLE)) AS hub,
                coalesce(a6.a, CAST(0 AS DOUBLE)) AS auth
              FROM h6 FULL OUTER JOIN a6 ON h6.node = a6.node
              ORDER BY node"""
      }),

    // t-closeness audit (Li et al., ICDE 2007) — the third member of the
    // privacy trio beside q_k_anonymity / q_l_diversity, on the SAME
    // quasi-identifier/sensitive attributes as l-diversity so the three
    // audits read as one release gate. EMD over the ordered global
    // support; cumulative sums run in the one canonical value order, so
    // they are bit-identical cross-engine under the 6-dp output grid.
    Q("q_t_closeness",
      (s, dir) => graft.operators.Privacy.tCloseness(
          t(s, dir, "customer"),
          Seq("c_mktsegment", "c_nationkey"),
          floor(col("c_acctbal") / 1000))
        .withColumn("t_exceeds", col("emd") > 0.2)
        .orderBy("c_mktsegment", "c_nationkey"),
      Some("""WITH vals AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS v FROM customer),
              cv AS (SELECT seg, nat, v, count(*) AS cnt
                FROM vals GROUP BY 1, 2, 3),
              cls AS (SELECT seg, nat, CAST(sum(cnt) AS BIGINT) AS n_class
                FROM cv GROUP BY 1, 2),
              g AS (SELECT v, CAST(sum(cnt) AS BIGINT) AS g_cnt
                FROM cv GROUP BY 1),
              tot AS (SELECT CAST(sum(g_cnt) AS BIGINT) AS n_total,
                  count(*) AS m_vals FROM g),
              grid AS (SELECT cls.seg, cls.nat, cls.n_class, g.v, g.g_cnt,
                  coalesce(cv.cnt, 0) AS cnt
                FROM cls CROSS JOIN g
                LEFT JOIN cv ON cv.seg = cls.seg AND cv.nat = cls.nat
                  AND cv.v = g.v),
              cum AS (SELECT seg, nat, n_class,
                  sum(cnt / CAST(n_class AS DOUBLE)
                    - g_cnt / CAST((SELECT n_total FROM tot) AS DOUBLE))
                    OVER (PARTITION BY seg, nat ORDER BY v) AS cd
                FROM grid),
              emd AS (SELECT seg, nat, n_class AS k,
                  round(sum(abs(cd))
                    / greatest((SELECT m_vals FROM tot) - 1, 1), 6) AS emd
                FROM cum GROUP BY 1, 2, 3)
              SELECT seg AS c_mktsegment, nat AS c_nationkey, k, emd,
                emd > 0.2 AS t_exceeds
              FROM emd ORDER BY 1, 2""")),

    // Kaplan–Meier survival over customer order lifetimes: duration =
    // days between first and last order, censored when the last order is
    // within 30 days of the dataset horizon (the subject may still be
    // active). The estimator the censoring makes necessary — a plain
    // duration histogram reads censored subjects as churned-early.
    Q("q_survival_km",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val mx = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
        val subj = o.groupBy("o_custkey")
          .agg(min(to_date(col("o_orderdate"))).as("fd"),
            max(to_date(col("o_orderdate"))).as("ld"))
          .crossJoin(broadcast(mx))
          .select(datediff(col("ld"), col("fd")).cast("long").as("duration"),
            when(datediff(col("maxd"), col("ld")) > 30, 1L).otherwise(0L)
              .as("event"))
        graft.operators.Survival.kaplanMeier(subj).orderBy("t")
      },
      Some("""WITH per AS (SELECT o_custkey,
                  min(CAST(o_orderdate AS DATE)) AS fd,
                  max(CAST(o_orderdate AS DATE)) AS ld
                FROM orders GROUP BY 1),
              mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
              subj AS (SELECT CAST(date_diff('day', fd, ld) AS BIGINT)
                    AS duration,
                  CASE WHEN date_diff('day', ld, (SELECT maxd FROM mx)) > 30
                    THEN 1 ELSE 0 END AS event
                FROM per),
              byt AS (SELECT duration AS t, count(*) AS n_at_t,
                  CAST(sum(event) AS BIGINT) AS d_events
                FROM subj GROUP BY 1),
              curve AS (SELECT t, d_events,
                  CAST(sum(n_at_t) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
                FROM byt),
              fac AS (SELECT t, n_risk, d_events,
                  CAST(1 AS DOUBLE) - d_events / CAST(n_risk AS DOUBLE) AS f
                FROM curve),
              lg AS (SELECT *, CASE WHEN f > 0 THEN round(ln(f), 10)
                  ELSE NULL END AS logf FROM fac),
              cum AS (SELECT t, n_risk, d_events,
                  CASE WHEN min(f) OVER w = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(exp(sum(logf) OVER w), 6) END AS survival
                FROM lg
                WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW))
              SELECT t, n_risk, d_events, survival
              FROM cum WHERE d_events > 0 ORDER BY t""")),

    // two-group log-rank test — does variant 1's retention curve differ
    // from variant 0's? The inference companion to q_survival_km on the
    // same censored order-lifetime subjects: observed vs hypergeometric-
    // expected group-1 events at each event time, all terms exact-integer
    // derived, 1-dof critical 3.841 spliced (the SRM convention).
    Q("q_logrank",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val mx = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
        val subj = o.groupBy("o_custkey")
          .agg(min(to_date(col("o_orderdate"))).as("fd"),
            max(to_date(col("o_orderdate"))).as("ld"))
          .crossJoin(broadcast(mx))
          .select(datediff(col("ld"), col("fd")).cast("long").as("duration"),
            when(datediff(col("maxd"), col("ld")) > 30, 1L).otherwise(0L)
              .as("event"),
            pmod(col("o_custkey"), lit(2)).as("g"))
        graft.operators.Survival.logRank(subj)
      },
      Some("""WITH per AS (SELECT o_custkey,
                  min(CAST(o_orderdate AS DATE)) AS fd,
                  max(CAST(o_orderdate AS DATE)) AS ld
                FROM orders GROUP BY 1),
              mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd
                FROM orders),
              subj AS (SELECT CAST(date_diff('day', fd, ld) AS BIGINT)
                    AS duration,
                  CASE WHEN date_diff('day', ld, (SELECT maxd FROM mx)) > 30
                    THEN 1 ELSE 0 END AS event,
                  o_custkey % 2 AS g
                FROM per),
              byt AS (SELECT duration AS t, count(*) AS n_at_t,
                  CAST(sum(event) AS BIGINT) AS d_t,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1_at_t,
                  CAST(sum(CASE WHEN g = 1 THEN event ELSE 0 END) AS BIGINT)
                    AS d1_t
                FROM subj GROUP BY 1),
              rk AS (SELECT t, d_t, d1_t,
                  CAST(sum(n_at_t) OVER w AS BIGINT) AS n_t,
                  CAST(sum(n1_at_t) OVER w AS BIGINT) AS n1_t
                FROM byt
                WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW
                  AND UNBOUNDED FOLLOWING)),
              tm AS (SELECT d1_t,
                  d_t * (n1_t / CAST(n_t AS DOUBLE)) AS e1_t,
                  d_t * (n1_t / CAST(n_t AS DOUBLE))
                    * (1.0 - n1_t / CAST(n_t AS DOUBLE))
                    * CAST(n_t - d_t AS DOUBLE)
                    / greatest(n_t - 1, 1) AS v_t
                FROM rk WHERE d_t > 0),
              ag AS (SELECT CAST(sum(d1_t) AS BIGINT) AS d1_obs,
                  round(sum(e1_t), 6) AS e1_exp,
                  round(sum(d1_t - e1_t) * sum(d1_t - e1_t) / sum(v_t), 6)
                    AS chi2
                FROM tm)
              SELECT d1_obs, e1_exp, chi2, chi2 > 3.841 AS significant
              FROM ag""")),

    // two-proportion z-test over an event-log experiment (variant =
    // user_id parity, conversion = a HIGH-VALUE purchase — plain "any
    // purchase" saturates at p = 1 on this fixture, collapsing se to 0):
    // the inference step the CUPED entry's variance reduction feeds.
    // Every term is a correctly-rounded function of exact integer counts
    // — the z statistic is IEEE-deterministic cross-engine; 6-dp rounding
    // is cosmetic. A degenerate pool (p ∈ {0,1}) yields NULL z by an
    // explicit guard in BOTH engines rather than an engine-specific
    // NaN/null split.
    Q("q_ab_ztest",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L))
            .as("conv"))
          .withColumn("g", col("user_id") % 2)
        per.agg(
            sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("g") === 0, col("conv")).otherwise(0L)).as("conv_a"),
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("g") === 1, col("conv")).otherwise(0L)).as("conv_b"))
          .withColumn("p_pool",
            (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")))
          .withColumn("se",
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .withColumn("z",
            when(col("se") > 0,
              round((col("conv_b") / col("n_b") - col("conv_a") / col("n_a"))
                / col("se"), 6)))
          .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
            round(col("conv_a") / col("n_a"), 6).as("p_a"),
            round(col("conv_b") / col("n_b"), 6).as("p_b"),
            col("z"), (abs(col("z")) > 1.96).as("significant"))
      },
      Some("""WITH per AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS conv,
                  user_id % 2 AS g
                FROM events GROUP BY user_id),
              st AS (SELECT
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                  CAST(sum(CASE WHEN g = 0 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_a,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_b,
                  CAST(sum(CASE WHEN g = 1 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_b
                FROM per),
              d AS (SELECT *,
                  (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS p_pool
                FROM st),
              e AS (SELECT *, sqrt(p_pool * (CAST(1 AS DOUBLE) - p_pool)
                  * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
                  AS se FROM d),
              f AS (SELECT n_a, conv_a, n_b, conv_b,
                  round(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
                  round(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
                  CASE WHEN se > 0 THEN
                    round((conv_b / CAST(n_b AS DOUBLE)
                      - conv_a / CAST(n_a AS DOUBLE)) / se, 6)
                  ELSE NULL END AS z
                FROM e)
              SELECT n_a, conv_a, n_b, conv_b, p_a, p_b, z,
                abs(z) > 1.96 AS significant
              FROM f""")),

    // HLL inclusion–exclusion intersection: |A∩B| estimated from three
    // sketch estimates (crawl A, crawl B, merged union) — the overlap
    // question the sketch TABLE answers without rescanning either crawl.
    // AUDIT convention (q_approx_distinct precedent): sketch bytes are
    // engine-specific, so the oracle recomputes the exact side and the
    // estimate must land inside the published bracket. Error compounds
    // across three ~1.6%-σ estimates, so the bracket is 10% of the exact
    // UNION (the scale of all three operands) + 48 absolute.
    Q("q_hll_intersect",
      (s, dir) => {
        val pages = t(s, dir, "documents")
          .select(col("lang"), (col("doc_id") % 2).as("crawl"),
            md5(col("text")).as("pg"))
        val sk = graft.operators.Sketches.hllSketchTable(
          pages, Seq("crawl", "lang"), col("pg"))
        val a = graft.operators.Sketches
          .hllMergeEstimate(sk.filter(col("crawl") === 0), Seq("lang"))
          .withColumnRenamed("approx_distinct", "est_a")
        val b = graft.operators.Sketches
          .hllMergeEstimate(sk.filter(col("crawl") === 1), Seq("lang"))
          .withColumnRenamed("approx_distinct", "est_b")
        val u = graft.operators.Sketches
          .hllMergeEstimate(sk, Seq("lang"))
          .withColumnRenamed("approx_distinct", "est_u")
        val exact = pages.distinct()
          .groupBy("lang", "pg")
          .agg(max(when(col("crawl") === 0, 1).otherwise(0)).as("ia"),
            max(when(col("crawl") === 1, 1).otherwise(0)).as("ib"))
          .groupBy("lang")
          .agg(sum(when(col("ia") === 1 && col("ib") === 1, 1L)
              .otherwise(0L)).as("exact_intersect"),
            count(lit(1)).as("exact_union"))
        a.join(b, Seq("lang")).join(u, Seq("lang")).join(exact, Seq("lang"))
          .select(col("lang"), col("exact_intersect"),
            (abs(col("est_a") + col("est_b") - col("est_u")
              - col("exact_intersect"))
              <= col("exact_union") * 0.1 + 48).as("hll_within_tol"))
          .orderBy("lang")
      },
      Some("""WITH p AS (SELECT DISTINCT lang, doc_id % 2 AS crawl,
                  md5(text) AS pg FROM documents),
              ab AS (SELECT lang, pg,
                  max(CASE WHEN crawl = 0 THEN 1 ELSE 0 END) AS ia,
                  max(CASE WHEN crawl = 1 THEN 1 ELSE 0 END) AS ib
                FROM p GROUP BY 1, 2)
              SELECT lang,
                CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS exact_intersect,
                TRUE AS hll_within_tol
              FROM ab GROUP BY lang ORDER BY lang""")),

    // top principal component of the embedding corpus by power iteration:
    // ONE distributed pass folds the corpus into d(d+3)/2 packed moments
    // (typed Aggregator, map-side combined), the d×d eigenwork runs on
    // the driver (k-means-centroid precedent), and the oracle replays the
    // WHOLE chain — moments from raw vectors, covariance on the 6-dp
    // anchor, 8 matvec+normalize rounds on the 7-dp grid, Rayleigh
    // eigenvalue on the 6-dp output grid — as chained CTEs.
    Q("q_pca_power",
      (s, dir) => graft.operators.Decomp.pcaTopComponent(
          t(s, dir, "embeddings"), "embedding", dim = 64, rounds = 8)
        .orderBy("dim"),
      Some {
        val rounds = (1 to 8).map { i =>
          val pv = if (i == 1) "p0" else s"p${i - 1}"
          s"""p${i}r AS MATERIALIZED (SELECT cov.i AS d, sum(cov.c * p.v) AS w
                FROM cov JOIN $pv p ON p.d = cov.j GROUP BY cov.i),
              p$i AS MATERIALIZED (SELECT d,
                round(w / (SELECT sqrt(sum(w*w)) FROM p${i}r), 7) AS v
                FROM p${i}r)"""
        }.mkString(",\n              ")
        s"""WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              nn AS MATERIALIZED (
                SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              s AS MATERIALIZED (SELECT i, sum(x) AS si FROM v GROUP BY i),
              cp AS MATERIALIZED (
                SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS pij
                FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
                GROUP BY 1, 2),
              cov0 AS (SELECT cp.i, cp.j,
                  round(cp.pij / (SELECT n FROM nn)
                    - (sa.si / (SELECT n FROM nn))
                      * (sb.si / (SELECT n FROM nn)), 6) AS c
                FROM cp JOIN s sa ON sa.i = cp.i JOIN s sb ON sb.i = cp.j),
              cov AS MATERIALIZED (SELECT i, j, c FROM cov0
                UNION ALL SELECT j AS i, i AS j, c FROM cov0 WHERE i <> j),
              p0 AS (SELECT i AS d,
                round(CAST(1 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE)), 7) AS v
                FROM s),
              $rounds,
              cvf AS (SELECT cov.i AS d, sum(cov.c * p.v) AS w
                FROM cov JOIN p8 p ON p.d = cov.j GROUP BY cov.i),
              lam AS (SELECT round(
                  (SELECT sum(p8.v * cvf.w) FROM p8
                    JOIN cvf ON cvf.d = p8.d)
                  / (SELECT sum(v * v) FROM p8), 6) AS eigenvalue)
              SELECT p8.d AS dim, p8.v AS loading,
                (SELECT eigenvalue FROM lam) AS eigenvalue
              FROM p8 ORDER BY dim"""
      }),

    // top-15 most correlated embedding-dimension pairs from the SAME
    // one-pass packed moments — the feature-redundancy audit that shares
    // its corpus scan with q_pca_power. Unrounded covariances inside the
    // ratio (a grid snap would amplify through the division), 6-dp output.
    Q("q_corr_matrix",
      (s, dir) => graft.operators.Decomp.corrTopPairs(
          t(s, dir, "embeddings"), "embedding", dim = 64, k = 15),
      Some("""WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              nn AS MATERIALIZED (
                SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              s AS MATERIALIZED (SELECT i, sum(x) AS si FROM v GROUP BY i),
              cp AS MATERIALIZED (
                SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS pij
                FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
                GROUP BY 1, 2),
              corr0 AS (SELECT cp.i, cp.j,
                  round((cp.pij / nn.n - (sa.si / nn.n) * (sb.si / nn.n))
                    / sqrt((pa.pij / nn.n - (sa.si / nn.n) * (sa.si / nn.n))
                      * (pb.pij / nn.n - (sb.si / nn.n) * (sb.si / nn.n))),
                    6) AS corr
                FROM cp CROSS JOIN nn
                JOIN s sa ON sa.i = cp.i
                JOIN s sb ON sb.i = cp.j
                JOIN cp pa ON pa.i = cp.i AND pa.j = cp.i
                JOIN cp pb ON pb.i = cp.j AND pb.j = cp.j
                WHERE cp.i < cp.j)
              SELECT i, j, corr FROM corr0
              ORDER BY abs(corr) DESC, i, j LIMIT 15""")))

  /** Round-9 session-9 batch 2: the drift-detection / model-evaluation
    * suite — exact distributed AUC (rank-sum over the score support, never
    * a subject sort), binned two-sample KS, PSI with integer add-one
    * smoothing, chi-squared + Cramér's V, per-dimension Fisher LDA ratio,
    * and top-2 PCA via grid-snapped Hotelling deflation.
    */
  private val session9b: Seq[Q] = Seq(

    // strongly connected components of the DIRECTED trade graph (edge
    // direction flips with order parity so real cycles exist): the
    // directed counterpart of the dedup CC family — mutual reachability
    // is a strictly finer partition than undirected connectivity. The
    // operator is FW-BW-Trim to a FIXPOINT (not a round count), so the
    // oracle verifies with a different algorithm entirely: a recursive
    // mutual-reachability closure.
    Q("q_scc",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(
            when(col("o_orderkey") % 2 === 0, col("o_custkey") * 2)
              .otherwise(col("l_suppkey") * 2 + 1).cast("long").as("src"),
            when(col("o_orderkey") % 2 === 0, col("l_suppkey") * 2 + 1)
              .otherwise(col("o_custkey") * 2).cast("long").as("dst"))
        graft.operators.GraphRank.stronglyConnected(edges).orderBy("node")
      },
      Some("""WITH e AS MATERIALIZED (
                SELECT DISTINCT
                  CAST(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey * 2
                    ELSE l_suppkey * 2 + 1 END AS BIGINT) AS src,
                  CAST(CASE WHEN o_orderkey % 2 = 0 THEN l_suppkey * 2 + 1
                    ELSE o_custkey * 2 END AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
              reach AS MATERIALIZED (
                WITH RECURSIVE r AS (
                  SELECT src AS a, dst AS b FROM e
                  UNION
                  SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b)
                SELECT a, b FROM r),
              mutual AS (SELECT r1.a AS u, r1.b AS v
                FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a)
              SELECT n AS node, least(n, coalesce(min(m.v), n)) AS scc
              FROM nodes LEFT JOIN mutual m ON m.u = n
              GROUP BY n ORDER BY node""")),

    // Welch's unequal-variance t-test on per-user total value between the
    // experiment variants — the continuous-metric companion to
    // q_ab_ztest's proportion test. Moments are 6-dp anchored BEFORE the
    // statistic (the CUPED convention); Welch–Satterthwaite df is a
    // derived double on the same grid. No t-distribution CDF offline, so
    // the decision uses the large-sample |t| > 1.96 gate, stated in-band.
    Q("q_welch_ttest",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(round(sum("value"), 6).as("y"))
          .withColumn("g", pmod(col("user_id"), lit(2)))
        val st = per.groupBy("g")
          .agg(count(lit(1)).as("n"), round(avg("y"), 6).as("m"),
            round(var_samp("y"), 6).as("v"))
        val a = st.filter(col("g") === 0)
          .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
        val b = st.filter(col("g") === 1)
          .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
        a.crossJoin(b)
          .withColumn("se2", col("v_a") / col("n_a") + col("v_b") / col("n_b"))
          .withColumn("t_stat",
            round((col("m_b") - col("m_a")) / sqrt(col("se2")), 6))
          // explicit products, not pow(x, 2): IEEE multiply is exact on
          // both engines, Math.pow only 1-ulp — the oracle uses x * x
          .withColumn("df", round(col("se2") * col("se2") /
            ((col("v_a") / col("n_a")) * (col("v_a") / col("n_a")) / (col("n_a") - 1L) +
              (col("v_b") / col("n_b")) * (col("v_b") / col("n_b")) / (col("n_b") - 1L)), 2))
          .select(col("n_a"), col("m_a"), col("n_b"), col("m_b"),
            col("t_stat"), col("df"),
            (abs(col("t_stat")) > 1.96).as("significant"))
      },
      Some("""WITH per AS (SELECT user_id, round(sum(value), 6) AS y,
                  user_id % 2 AS g
                FROM events GROUP BY user_id),
              st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  round(avg(y), 6) AS m, round(var_samp(y), 6) AS v
                FROM per GROUP BY g),
              ab AS (SELECT
                  (SELECT n FROM st WHERE g = 0) AS n_a,
                  (SELECT m FROM st WHERE g = 0) AS m_a,
                  (SELECT v FROM st WHERE g = 0) AS v_a,
                  (SELECT n FROM st WHERE g = 1) AS n_b,
                  (SELECT m FROM st WHERE g = 1) AS m_b,
                  (SELECT v FROM st WHERE g = 1) AS v_b),
              d AS (SELECT *, v_a / n_a + v_b / n_b AS se2 FROM ab),
              e AS (SELECT *,
                  round((m_b - m_a) / sqrt(se2), 6) AS t_stat,
                  round(se2 * se2 / ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                    + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 2) AS df
                FROM d)
              SELECT n_a, m_a, n_b, m_b, t_stat, df,
                abs(t_stat) > 1.96 AS significant
              FROM e""")),

    // sample-ratio-mismatch check — the FIRST gate a real experiment
    // readout runs: chi-squared goodness-of-fit of the observed variant
    // counts against the designed 50/50 split, 1-dof critical value
    // 3.841 spliced as a literal in both engines. An SRM flag means the
    // assignment mechanism is broken and every downstream test is void.
    Q("q_srm_check",
      (s, dir) => t(s, dir, "events")
        .select(col("user_id")).distinct()
        .groupBy(pmod(col("user_id"), lit(2)).as("g"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(when(col("g") === 0, col("n"))).as("n_a"),
          sum(when(col("g") === 1, col("n"))).as("n_b"))
        .withColumn("expected", (col("n_a") + col("n_b")) / lit(2.0))
        .withColumn("chi2", round(
          (col("n_a") - col("expected")) * (col("n_a") - col("expected")) / col("expected") +
            (col("n_b") - col("expected")) * (col("n_b") - col("expected")) / col("expected"), 6))
        .select(col("n_a"), col("n_b"), col("chi2"),
          (col("chi2") > 3.841).as("srm_detected")),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
              c AS (SELECT
                  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
                  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
                FROM u),
              d AS (SELECT *, (n_a + n_b) / 2.0 AS expected FROM c),
              e AS (SELECT n_a, n_b, round(
                  (n_a - expected) * (n_a - expected) / expected
                  + (n_b - expected) * (n_b - expected) / expected, 6)
                  AS chi2 FROM d)
              SELECT n_a, n_b, chi2, chi2 > 3.841 AS srm_detected
              FROM e""")),

    // standardized Pearson residuals per contingency cell — WHICH
    // (lang, source) cells drive the q_chi2_assoc association: residual =
    // (O - E) / sqrt(E (1 - rt/n)(1 - ct/n)), |residual| > 2 ≈ a cell
    // off its independence expectation at ~95%. Same exact-integer
    // marginals; top-10 cells by |residual|.
    Q("q_chi2_residuals",
      (s, dir) => {
        val o = t(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rt = o.groupBy("lang").agg(sum("o").as("rt"))
        val ct = o.groupBy("source").agg(sum("o").as("ct"))
        val n = broadcast(o.agg(sum("o").as("n")))
        rt.crossJoin(broadcast(ct)).crossJoin(n)
          .join(o, Seq("lang", "source"), "left").na.fill(0L, Seq("o"))
          .withColumn("e", col("rt") * col("ct") / col("n"))
          .withColumn("residual", round((col("o") - col("e")) /
            sqrt(col("e") * (lit(1.0) - col("rt") / col("n"))
              * (lit(1.0) - col("ct") / col("n"))), 6))
          .select(col("lang"), col("source"), col("o"),
            round(col("e"), 6).as("e"), col("residual"),
            (abs(col("residual")) > 2.0).as("off_expectation"))
          .orderBy(abs(col("residual")).desc, col("lang"), col("source"))
          .limit(10)
      },
      Some("""WITH o AS (SELECT lang, source, count(*) AS o
                FROM documents GROUP BY 1, 2),
              rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
                FROM o GROUP BY 1),
              ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
                FROM o GROUP BY 1),
              n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
              grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct,
                  coalesce(o.o, 0) AS o,
                  rt.rt * ct.ct / CAST((SELECT n FROM n) AS DOUBLE) AS e
                FROM rt CROSS JOIN ct
                LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source),
              res AS (SELECT lang, source, o, round(e, 6) AS e,
                  round((o - e) / sqrt(e
                    * (1 - rt / CAST((SELECT n FROM n) AS DOUBLE))
                    * (1 - ct / CAST((SELECT n FROM n) AS DOUBLE))), 6)
                    AS residual
                FROM grid)
              SELECT lang, source, o, e, residual,
                abs(residual) > 2.0 AS off_expectation
              FROM res
              ORDER BY abs(residual) DESC, lang, source LIMIT 10""")),

    // multi-feature OLS by the NORMAL EQUATIONS — closed-form training:
    // one pass folds the corpus into the 6-dp-anchored Gram sums, the
    // solve is driver Cramer's rule (pure determinant arithmetic, term-
    // for-term replayable — no linear-algebra library on either side),
    // a second pass scores R² against the fitted literal weights.
    Q("q_ols_normal",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).cast("double").as("c"),
            round(coalesce(avg(when(col("event_type") === "purchase",
              col("value"))), lit(0.0)), 6).as("k"),
            round(coalesce(sum("value"), lit(0.0)), 6).as("y"))
        val st = broadcast(per.agg(
          round(avg("c"), 6).as("mc"), round(stddev_samp("c"), 6).as("sc"),
          round(avg("k"), 6).as("mk"), round(stddev_samp("k"), 6).as("sk")))
        val feat = per.crossJoin(st).select(
          round((col("c") - col("mc")) / col("sc"), 6).as("x1"),
          round((col("k") - col("mk")) / col("sk"), 6).as("x2"),
          col("y"))
        graft.operators.Regression.olsNormal(feat, Seq("x1", "x2"), "y")
          .orderBy("term")
      },
      Some("""WITH per AS MATERIALIZED (SELECT user_id,
                  CAST(count(*) AS DOUBLE) AS c,
                  round(coalesce(avg(CASE WHEN event_type = 'purchase'
                    THEN value END), 0.0), 6) AS k,
                  round(coalesce(sum(value), 0.0), 6) AS y
                FROM events GROUP BY user_id),
              st AS MATERIALIZED (SELECT round(avg(c), 6) AS mc,
                  round(stddev_samp(c), 6) AS sc,
                  round(avg(k), 6) AS mk, round(stddev_samp(k), 6) AS sk
                FROM per),
              feat AS MATERIALIZED (SELECT
                  round((c - mc) / sc, 6) AS x1,
                  round((k - mk) / sk, 6) AS x2, y
                FROM per CROSS JOIN st),
              m AS MATERIALIZED (SELECT
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(x1), 6) AS s1, round(sum(x2), 6) AS s2,
                  round(sum(x1 * x1), 6) AS s11,
                  round(sum(x1 * x2), 6) AS s12,
                  round(sum(x2 * x2), 6) AS s22,
                  round(sum(y), 6) AS sy,
                  round(sum(x1 * y), 6) AS s1y,
                  round(sum(x2 * y), 6) AS s2y,
                  round(sum(y * y), 6) AS syy
                FROM feat),
              w AS MATERIALIZED (SELECT n, sy, syy,
                  round((sy * (s11 * s22 - s12 * s12)
                    - s1 * (s1y * s22 - s12 * s2y)
                    + s2 * (s1y * s12 - s11 * s2y))
                    / (CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
                      - s1 * (s1 * s22 - s12 * s2)
                      + s2 * (s1 * s12 - s11 * s2)), 7) AS w0,
                  round((CAST(n AS DOUBLE) * (s1y * s22 - s12 * s2y)
                    - sy * (s1 * s22 - s12 * s2)
                    + s2 * (s1 * s2y - s1y * s2))
                    / (CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
                      - s1 * (s1 * s22 - s12 * s2)
                      + s2 * (s1 * s12 - s11 * s2)), 7) AS w1,
                  round((CAST(n AS DOUBLE) * (s11 * s2y - s1y * s12)
                    - s1 * (s1 * s2y - s1y * s2)
                    + sy * (s1 * s12 - s11 * s2))
                    / (CAST(n AS DOUBLE) * (s11 * s22 - s12 * s12)
                      - s1 * (s1 * s22 - s12 * s2)
                      + s2 * (s1 * s12 - s11 * s2)), 7) AS w2
                FROM m),
              fit AS (SELECT round(sum(
                  (y - ((SELECT w0 FROM w) + (SELECT w1 FROM w) * x1
                    + (SELECT w2 FROM w) * x2))
                  * (y - ((SELECT w0 FROM w) + (SELECT w1 FROM w) * x1
                    + (SELECT w2 FROM w) * x2))), 6) AS sse
                FROM feat),
              r AS (SELECT round(1.0 - (SELECT sse FROM fit)
                  / ((SELECT syy FROM w) - (SELECT sy FROM w)
                    * (SELECT sy FROM w) / CAST((SELECT n FROM w) AS DOUBLE)),
                  6) AS r2)
              SELECT t.term, t.weight, (SELECT r2 FROM r) AS r2,
                (SELECT n FROM w) AS n
              FROM (SELECT 'bias' AS term, (SELECT w0 FROM w) AS weight
                UNION ALL SELECT 'x1', (SELECT w1 FROM w)
                UNION ALL SELECT 'x2', (SELECT w2 FROM w)) t
              ORDER BY term""")),

    // logistic-regression TRAINING by fixed-round full-batch gradient
    // descent — the iterative-replay doctrine applied to model fitting:
    // standardized engagement features predict conversion, each round is
    // one p+2-double gradient aggregate, weights live on the driver, and
    // the oracle unrolls all 8 training rounds (gradient 6-dp, weights
    // 7-dp) plus the final loss/accuracy readout.
    Q("q_logistic_gd",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).cast("double").as("c"),
            round(coalesce(avg("value"), lit(0.0)), 6).as("av"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("y"))
        val st = broadcast(per.agg(
          round(avg("c"), 6).as("mc"), round(stddev_samp("c"), 6).as("sc"),
          round(avg("av"), 6).as("mv"), round(stddev_samp("av"), 6).as("sv")))
        val feat = per.crossJoin(st).select(
          round((col("c") - col("mc")) / col("sc"), 6).as("x1"),
          round((col("av") - col("mv")) / col("sv"), 6).as("x2"),
          col("y"))
        graft.operators.Regression.logisticGD(
          feat, Seq("x1", "x2"), "y", rounds = 8, lr = 0.5)
          .orderBy("term")
      },
      Some {
        val roundsSql = (1 to 8).map { i =>
          val pw = s"wr${i - 1}"
          s"""g$i AS MATERIALIZED (SELECT round(sum(s - y), 6) AS g0,
                round(sum((s - y) * x1), 6) AS g1,
                round(sum((s - y) * x2), 6) AS g2,
                CAST(count(*) AS BIGINT) AS n
              FROM (SELECT y, x1, x2,
                  1.0 / (1.0 + exp(-((SELECT w0 FROM $pw)
                    + (SELECT w1 FROM $pw) * x1
                    + (SELECT w2 FROM $pw) * x2))) AS s
                FROM feat)),
              wr$i AS MATERIALIZED (SELECT
                round((SELECT w0 FROM $pw) - 0.5 * g0 / n, 7) AS w0,
                round((SELECT w1 FROM $pw) - 0.5 * g1 / n, 7) AS w1,
                round((SELECT w2 FROM $pw) - 0.5 * g2 / n, 7) AS w2
              FROM g$i)"""
        }.mkString(",\n              ")
        s"""WITH per AS MATERIALIZED (SELECT user_id,
                  CAST(count(*) AS DOUBLE) AS c,
                  round(coalesce(avg(value), 0.0), 6) AS av,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY user_id),
              st AS MATERIALIZED (SELECT round(avg(c), 6) AS mc,
                  round(stddev_samp(c), 6) AS sc,
                  round(avg(av), 6) AS mv, round(stddev_samp(av), 6) AS sv
                FROM per),
              feat AS MATERIALIZED (SELECT
                  round((c - (SELECT mc FROM st)) / (SELECT sc FROM st), 6)
                    AS x1,
                  round((av - (SELECT mv FROM st)) / (SELECT sv FROM st), 6)
                    AS x2,
                  y
                FROM per),
              wr0 AS (SELECT CAST(0 AS DOUBLE) AS w0,
                CAST(0 AS DOUBLE) AS w1, CAST(0 AS DOUBLE) AS w2),
              $roundsSql,
              pred AS (SELECT y,
                  1.0 / (1.0 + exp(-((SELECT w0 FROM wr8)
                    + (SELECT w1 FROM wr8) * x1
                    + (SELECT w2 FROM wr8) * x2))) AS s
                FROM feat),
              m AS (SELECT
                  round(avg(-(y * ln(greatest(1e-12, least(1.0 - 1e-12, s)))
                    + (1 - y) * ln(1 - greatest(1e-12,
                      least(1.0 - 1e-12, s))))), 6) AS log_loss,
                  round(avg(CASE WHEN (s > 0.5) = (y = 1)
                    THEN 1.0 ELSE 0.0 END), 6) AS accuracy
                FROM pred)
              SELECT t.term, t.weight,
                (SELECT log_loss FROM m) AS log_loss,
                (SELECT accuracy FROM m) AS accuracy
              FROM (SELECT 'bias' AS term, (SELECT w0 FROM wr8) AS weight
                UNION ALL SELECT 'x1', (SELECT w1 FROM wr8)
                UNION ALL SELECT 'x2', (SELECT w2 FROM wr8)) t
              ORDER BY term"""
      }),

    // greedy k-center coreset (Gonzalez farthest-point) over the
    // embedding corpus — the diverse-subset selector: each round one
    // narrow corpus pass against ≤k literal centers + a top-1. The
    // oracle replays the whole selection chain round-for-round; the
    // radius column is the G(k) coverage curve.
    Q("q_kcenter_coreset",
      (s, dir) => graft.operators.Similarity.kCenterCoreset(
        t(s, dir, "embeddings"), k = 8),
      Some {
        val rounds = (2 to 8).map { i =>
          val prev = s"d${i - 1}"
          s"""c$i AS MATERIALIZED (SELECT id, vv, d FROM $prev
                ORDER BY d DESC, id LIMIT 1),
              d$i AS MATERIALIZED (SELECT p.id, p.vv, p.nrm,
                least(p.d, CASE WHEN p.nrm = 0 THEN CAST(1 AS DOUBLE)
                  ELSE round(1.0 - list_cosine_similarity(p.vv,
                    (SELECT vv FROM c$i)), 4) END) AS d
                FROM $prev p)"""
        }.mkString(",\n              ")
        val sel = (2 to 8).map(i =>
          s"""UNION ALL SELECT CAST($i AS BIGINT),
              (SELECT id FROM c$i), (SELECT d FROM c$i)""").mkString("\n              ")
        s"""WITH v AS MATERIALIZED (SELECT vec_id AS id,
                  CAST(embedding AS DOUBLE[]) AS vv,
                  sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
                FROM embeddings WHERE embedding IS NOT NULL),
              c1 AS MATERIALIZED (SELECT id, vv FROM v ORDER BY id LIMIT 1),
              d1 AS MATERIALIZED (SELECT v.id, v.vv, v.nrm,
                  CASE WHEN v.nrm = 0 THEN CAST(1 AS DOUBLE)
                    ELSE round(1.0 - list_cosine_similarity(v.vv,
                      (SELECT vv FROM c1)), 4) END AS d
                FROM v),
              $rounds
              SELECT CAST(1 AS BIGINT) AS rank, (SELECT id FROM c1) AS vec_id,
                CAST(0 AS DOUBLE) AS radius
              $sel
              ORDER BY rank"""
      }),

    // GraphSAGE-style two-hop sampled neighborhood aggregation over the
    // bidirectional trade graph, node feature = account balance: the
    // graph-learning feature-prep job. Neighbor sampling is hash-seeded
    // (the negativeSamples convention) so the features replay across
    // engines; hub fan-out is capped at k = 5 by construction.
    Q("q_graph_sage",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val fwd = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
        val feats = t(s, dir, "customer")
          .select((col("c_custkey") * 2).cast("long").as("node"),
            round(col("c_acctbal"), 6).as("x"))
          .unionByName(t(s, dir, "supplier")
            .select((col("s_suppkey") * 2 + 1).cast("long").as("node"),
              round(col("s_acctbal"), 6).as("x")))
        graft.operators.GraphRank.neighborhoodFeatures(edges, feats, k = 5)
          .orderBy("node")
      },
      Some("""WITH p AS (SELECT DISTINCT
                  CAST(o_custkey * 2 AS BIGINT) AS c,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS s
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              e AS (SELECT c AS src, s AS dst FROM p
                UNION SELECT s, c FROM p),
              f AS (SELECT CAST(c_custkey * 2 AS BIGINT) AS node,
                  round(c_acctbal, 6) AS x FROM customer
                UNION ALL SELECT CAST(s_suppkey * 2 + 1 AS BIGINT),
                  round(s_acctbal, 6) FROM supplier),
              h AS (SELECT src, dst,
                  CAST(('0x' || substr(md5('sage:' || src || ':' || dst),
                    1, 15)) AS BIGINT) AS hh
                FROM e),
              samp AS (SELECT src, dst FROM (
                  SELECT src, dst, row_number() OVER
                    (PARTITION BY src ORDER BY hh, dst) AS rn
                  FROM h) WHERE rn <= 5),
              h1 AS (SELECT samp.src AS node, round(avg(f.x), 6) AS h1
                FROM samp JOIN f ON f.node = samp.dst GROUP BY 1),
              h2 AS (SELECT samp.src AS node, round(avg(h1.h1), 6) AS h2
                FROM samp JOIN h1 ON h1.node = samp.dst GROUP BY 1)
              SELECT f.node AS node, f.x, h1.h1, h2.h2
              FROM f LEFT JOIN h1 ON h1.node = f.node
              LEFT JOIN h2 ON h2.node = f.node
              ORDER BY f.node""")),

    // delta-method variance of a RATIO metric (value per event) — the
    // estimator user-level averages get wrong: the metric's denominator
    // is itself random, so Var(X̄/Ȳ) needs the first-order Taylor
    // expansion (vx/my² − 2·mx·cxy/my³ + mx²·vy/my⁴)/n. Per-variant
    // moments 6-dp anchored before the expansion (the CUPED convention).
    Q("q_delta_method",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(round(sum("value"), 6).as("x"),
            count(lit(1)).cast("double").as("y"))
          .withColumn("g", pmod(col("user_id"), lit(2)))
        per.groupBy("g")
          .agg(count(lit(1)).as("n"),
            round(avg("x"), 6).as("mx"), round(avg("y"), 6).as("my"),
            round(var_samp("x"), 6).as("vx"), round(var_samp("y"), 6).as("vy"),
            round(covar_samp("x", "y"), 6).as("cxy"))
          .withColumn("ratio", round(col("mx") / col("my"), 6))
          .withColumn("se_delta", round(sqrt(
            (col("vx") / (col("my") * col("my"))
              - lit(2.0) * col("mx") * col("cxy") / (col("my") * col("my") * col("my"))
              + col("mx") * col("mx") * col("vy") / (col("my") * col("my") * col("my") * col("my")))
              / col("n")), 6))
          .select("g", "n", "ratio", "se_delta")
          .orderBy("g")
      },
      Some("""WITH per AS (SELECT user_id, round(sum(value), 6) AS x,
                  CAST(count(*) AS DOUBLE) AS y, user_id % 2 AS g
                FROM events GROUP BY user_id),
              st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  round(avg(x), 6) AS mx, round(avg(y), 6) AS my,
                  round(var_samp(x), 6) AS vx, round(var_samp(y), 6) AS vy,
                  round(covar_samp(x, y), 6) AS cxy
                FROM per GROUP BY g)
              SELECT g, n, round(mx / my, 6) AS ratio,
                round(sqrt((vx / (my * my)
                  - 2.0 * mx * cxy / (my * my * my)
                  + mx * mx * vy / (my * my * my * my)) / n), 6) AS se_delta
              FROM st ORDER BY g""")),

    // bucketed (delete-one-bucket) jackknife for the SAME ratio metric —
    // the assumption-free twin of the delta method and the estimator
    // big experimentation platforms actually run: users hash to B = 32
    // deterministic buckets, each leave-one-out ratio is exact arithmetic
    // over per-bucket sums, variance = (B-1)/B · Σ(θ_i − θ̄)². Per-bucket
    // sums are 6-dp anchored; everything after is identical doubles in
    // both engines.
    Q("q_jackknife",
      (s, dir) => {
        val buck = t(s, dir, "events")
          .groupBy("user_id")
          .agg(sum("value").as("xv"), count(lit(1)).as("yv"))
          .groupBy(pmod(col("user_id"), lit(2)).as("g"),
            pmod(col("user_id"), lit(32)).as("b"))
          .agg(round(sum("xv"), 6).as("sx"),
            sum("yv").cast("double").as("sy"))
        val tot = buck.groupBy("g")
          .agg(sum("sx").as("tx"), sum("sy").as("ty"),
            count(lit(1)).as("nb"))
        buck.join(tot, Seq("g"))
          .withColumn("theta", (col("tx") - col("sx")) / (col("ty") - col("sy")))
          .groupBy("g", "nb", "tx", "ty")
          .agg(avg("theta").as("td"),
            sum(col("theta") * col("theta")).as("t2"))
          .select(col("g"), col("nb").as("n_buckets"),
            round(col("tx") / col("ty"), 6).as("ratio"),
            round(sqrt((col("nb") - 1L) / col("nb").cast("double")
              * (col("t2") - col("nb") * col("td") * col("td"))), 6)
              .as("se_jack"))
          .orderBy("g")
      },
      Some("""WITH per AS (SELECT user_id, sum(value) AS xv,
                  count(*) AS yv FROM events GROUP BY user_id),
              buck AS (SELECT user_id % 2 AS g, user_id % 32 AS b,
                  round(sum(xv), 6) AS sx, CAST(sum(yv) AS DOUBLE) AS sy
                FROM per GROUP BY 1, 2),
              tot AS (SELECT g, sum(sx) AS tx, sum(sy) AS ty,
                  CAST(count(*) AS BIGINT) AS nb
                FROM buck GROUP BY g),
              th AS (SELECT buck.g, nb, tx, ty,
                  (tx - sx) / (ty - sy) AS theta
                FROM buck JOIN tot ON tot.g = buck.g),
              ag AS (SELECT g, nb, tx, ty, avg(theta) AS td,
                  sum(theta * theta) AS t2
                FROM th GROUP BY 1, 2, 3, 4)
              SELECT g, nb AS n_buckets, round(tx / ty, 6) AS ratio,
                round(sqrt((nb - 1) / CAST(nb AS DOUBLE)
                  * (t2 - nb * td * td)), 6) AS se_jack
              FROM ag ORDER BY g""")),

    // Brier-score decomposition (Murphy 1973) of a calibration-style
    // forecast: p̂ = per-user engagement mapped to (0,1) by s/(s+20),
    // binned to a 20-cell grid; reliability − resolution + uncertainty
    // over the binned forecasts equals the binned Brier score by
    // construction. All three terms from exact integer bin counts and
    // 6-dp anchored bin means.
    Q("q_brier_decomp",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).cast("double").as("sc"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("y"))
          .withColumn("p", round(col("sc") / (col("sc") + 20.0), 6))
          .withColumn("bin", floor(col("p") * 20).cast("long"))
        val byBin = per.groupBy("bin")
          .agg(count(lit(1)).as("nb"), round(avg("p"), 6).as("pb"),
            round(avg("y"), 6).as("yb"))
        val g = broadcast(per.agg(count(lit(1)).as("n"),
          round(avg("y"), 6).as("ybar")))
        byBin.crossJoin(g)
          .agg(max("n").as("n_users"),
            round(sum(col("nb") * (col("pb") - col("yb")) * (col("pb") - col("yb")))
              / max("n"), 6).as("reliability"),
            round(sum(col("nb") * (col("yb") - col("ybar")) * (col("yb") - col("ybar")))
              / max("n"), 6).as("resolution"),
            round(max(col("ybar") * (lit(1.0) - col("ybar"))), 6)
              .as("uncertainty"))
          .withColumn("brier", round(col("reliability") - col("resolution")
            + col("uncertainty"), 6))
      },
      Some("""WITH per AS (SELECT user_id,
                  CAST(count(*) AS DOUBLE) AS sc,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY user_id),
              pp AS (SELECT y, round(sc / (sc + 20.0), 6) AS p FROM per),
              pb AS (SELECT CAST(floor(p * 20) AS BIGINT) AS bin,
                  CAST(count(*) AS BIGINT) AS nb,
                  round(avg(p), 6) AS pb, round(avg(y), 6) AS yb
                FROM pp GROUP BY 1),
              g AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  round(avg(y), 6) AS ybar FROM pp),
              ag AS (SELECT (SELECT n FROM g) AS n_users,
                  round(sum(nb * (pb - yb) * (pb - yb))
                    / CAST((SELECT n FROM g) AS DOUBLE), 6) AS reliability,
                  round(sum(nb * (yb - (SELECT ybar FROM g))
                    * (yb - (SELECT ybar FROM g)))
                    / CAST((SELECT n FROM g) AS DOUBLE), 6) AS resolution,
                  round((SELECT ybar FROM g)
                    * (1.0 - (SELECT ybar FROM g)), 6) AS uncertainty
                FROM pb)
              SELECT n_users, reliability, resolution, uncertainty,
                round(reliability - resolution + uncertainty, 6) AS brier
              FROM ag""")),

    // exact ROC AUC of an engagement score against conversion, via the
    // Mann-Whitney rank-sum identity with midranks for ties. INTEGER until
    // the final division: midranks carried as 2x in BIGINT, so the value
    // is bit-replayable and the corpus never sees a global subject sort —
    // the cumulative window runs over distinct scores only.
    Q("q_auc",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("label"))
        graft.operators.ModelEval.aucFromScores(per, col("score"), col("label"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS s,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1),
              bys AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS pos
                FROM per GROUP BY 1),
              r AS (SELECT *,
                  CAST(sum(cnt) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) - cnt AS cum_less
                FROM bys),
              ag AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
                  CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
                  CAST(sum(pos * (2 * cum_less + cnt + 1)) AS BIGINT) AS prs2
                FROM r)
              SELECT n_pos, n_neg,
                round(CAST(prs2 - n_pos * (n_pos + 1) AS DOUBLE)
                  / (2.0 * n_pos * n_neg), 6) AS auc
              FROM ag""")),

    // isotonic calibration of conversion against the engagement score —
    // the PAV solution via its closed-form minimax characterization
    // (max_{i<=k} min_{j>=k} interval average): PAV's data-dependent
    // merge order doesn't replay across engines, the minimax does. The
    // m² interval table and both windows ride the bounded score support.
    Q("q_isotonic",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("label"))
        graft.operators.ModelEval.isotonicCalibration(
          per, col("score"), col("label"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS s,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1),
              bys AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS pos
                FROM per GROUP BY 1),
              pre AS (SELECT *,
                  CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
                  CAST(sum(pos) OVER w AS BIGINT) AS cum_pos
                FROM bys
                WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
              pairs AS (SELECT lo.i, hi.j,
                  (hi.hi_pos - lo.lo_pos)
                    / CAST(hi.hi_cnt - lo.lo_cnt AS DOUBLE) AS a
                FROM (SELECT s AS i, cum_cnt - cnt AS lo_cnt,
                    cum_pos - pos AS lo_pos FROM pre) lo
                JOIN (SELECT s AS j, cum_cnt AS hi_cnt,
                    cum_pos AS hi_pos FROM pre) hi
                  ON lo.i <= hi.j),
              tails AS (SELECT i, j,
                  min(a) OVER (PARTITION BY i ORDER BY j DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS tail_min
                FROM pairs),
              iso AS (SELECT j AS s, round(max(tail_min), 6) AS iso_p
                FROM tails GROUP BY 1)
              SELECT bys.s AS score, bys.cnt AS n,
                round(bys.pos / CAST(bys.cnt AS DOUBLE), 6) AS emp_rate,
                iso.iso_p
              FROM bys JOIN iso ON iso.s = bys.s
              ORDER BY score""")),

    // two-sample KS drift test between the experiment variants over the
    // per-user total-value distribution, binned to the integer grid (the
    // binning is what bounds the CDF support at corpus scale). The
    // critical coefficient is the Scala-printed literal spliced into both
    // engines; d and d_crit compare after the 6-dp snap.
    Q("q_ks_drift",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(round(sum("value"), 6).as("tot"))
          .select(floor(col("tot")).cast("long").as("bin"),
            pmod(col("user_id"), lit(2)).as("g"))
        graft.operators.ModelEval.ksTest(per, col("bin"), col("g"))
      },
      Some(s"""WITH per AS (SELECT user_id,
                  CAST(floor(round(sum(value), 6)) AS BIGINT) AS bin,
                  user_id % 2 AS g
                FROM events GROUP BY user_id),
              byb AS (SELECT bin,
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS ca,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS cb
                FROM per GROUP BY 1),
              tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b FROM byb),
              cum AS (SELECT
                  abs(sum(ca) OVER w / CAST((SELECT n_a FROM tot) AS DOUBLE)
                    - sum(cb) OVER w
                      / CAST((SELECT n_b FROM tot) AS DOUBLE)) AS gap
                FROM byb
                WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW)),
              d AS (SELECT (SELECT n_a FROM tot) AS n_a,
                  (SELECT n_b FROM tot) AS n_b,
                  round(max(gap), 6) AS d FROM cum),
              e AS (SELECT *, round(${graft.operators.ModelEval.KsCrit05}
                  * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)), 6)
                  AS d_crit FROM d)
              SELECT n_a, n_b, d, d_crit, d > d_crit AS significant
              FROM e""")),

    // Population Stability Index between the early and late halves of the
    // event log (the CUPED midpoint split) over fixed-width value bins,
    // with INTEGER add-one smoothing over the union support — the
    // deterministic form of the zero-bin epsilon every PSI monitor needs.
    Q("q_psi_drift",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("value").isNotNull)
          .withColumn("sec", unix_timestamp(col("ts")))
        val mid = broadcast(ev.agg(
          ((min("sec") + max("sec")) / lit(2L)).cast("long").as("mid")))
        val byBin = ev.crossJoin(mid)
          .groupBy(floor(col("value") / 25).cast("long").as("bin"))
          .agg(sum(when(col("sec") <= col("mid"), 1L).otherwise(0L)).as("ce"),
            sum(when(col("sec") > col("mid"), 1L).otherwise(0L)).as("cl"))
        val tot = broadcast(byBin.agg(sum("ce").as("n_early"),
          sum("cl").as("n_late"), count(lit(1)).as("n_bins")))
        byBin.crossJoin(tot)
          .withColumn("p", (col("ce") + 1L).cast("double")
            / (col("n_early") + col("n_bins")))
          .withColumn("q", (col("cl") + 1L).cast("double")
            / (col("n_late") + col("n_bins")))
          .groupBy("n_early", "n_late", "n_bins")
          .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))),
            6).as("psi"))
      },
      Some("""WITH se AS (SELECT value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events WHERE value IS NOT NULL),
              md AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM se),
              byb AS (SELECT CAST(floor(value / 25) AS BIGINT) AS bin,
                  CAST(sum(CASE WHEN sec <= (SELECT mid FROM md)
                    THEN 1 ELSE 0 END) AS BIGINT) AS ce,
                  CAST(sum(CASE WHEN sec > (SELECT mid FROM md)
                    THEN 1 ELSE 0 END) AS BIGINT) AS cl
                FROM se GROUP BY 1),
              tot AS (SELECT CAST(sum(ce) AS BIGINT) AS n_early,
                  CAST(sum(cl) AS BIGINT) AS n_late,
                  CAST(count(*) AS BIGINT) AS n_bins FROM byb),
              pq AS (SELECT
                  CAST(ce + 1 AS DOUBLE)
                    / ((SELECT n_early FROM tot) + (SELECT n_bins FROM tot))
                    AS p,
                  CAST(cl + 1 AS DOUBLE)
                    / ((SELECT n_late FROM tot) + (SELECT n_bins FROM tot))
                    AS q
                FROM byb)
              SELECT (SELECT n_early FROM tot) AS n_early,
                (SELECT n_late FROM tot) AS n_late,
                (SELECT n_bins FROM tot) AS n_bins,
                round(sum((p - q) * ln(p / q)), 6) AS psi
              FROM pq""")),

    // chi-squared independence + Cramér's V between document language and
    // source — the categorical-association audit. The FULL contingency
    // grid (absent cells at O = 0, E > 0 still contribute) from exact
    // integer marginals; every cell term is arithmetic over identical
    // doubles in both engines.
    Q("q_chi2_assoc",
      (s, dir) => {
        val o = t(s, dir, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rt = o.groupBy("lang").agg(sum("o").as("rt"))
        val ct = o.groupBy("source").agg(sum("o").as("ct"))
        val n = broadcast(o.agg(sum("o").as("n"),
          countDistinct("lang").as("r"), countDistinct("source").as("c")))
        rt.crossJoin(broadcast(ct)).crossJoin(n)
          .join(o, Seq("lang", "source"), "left").na.fill(0L, Seq("o"))
          .withColumn("e", col("rt") * col("ct") / col("n"))
          .groupBy("n", "r", "c")
          .agg(round(sum((col("o") - col("e")) * (col("o") - col("e")) / col("e")), 6)
            .as("chi2"))
          .withColumn("cramers_v", round(sqrt(col("chi2") /
            (col("n") * (least(col("r"), col("c")) - 1L))), 6))
          .select("n", "r", "c", "chi2", "cramers_v")
      },
      Some("""WITH o AS (SELECT lang, source, count(*) AS o
                FROM documents GROUP BY 1, 2),
              rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt
                FROM o GROUP BY 1),
              ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct
                FROM o GROUP BY 1),
              n AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                  count(DISTINCT lang) AS r, count(DISTINCT source) AS c
                FROM o),
              grid AS (SELECT rt.rt, ct.ct, coalesce(o.o, 0) AS o,
                  rt.rt * ct.ct / CAST((SELECT n FROM n) AS DOUBLE) AS e
                FROM rt CROSS JOIN ct
                LEFT JOIN o ON o.lang = rt.lang AND o.source = ct.source)
              SELECT (SELECT n FROM n) AS n, (SELECT r FROM n) AS r,
                (SELECT c FROM n) AS c,
                round(sum((o - e) * (o - e) / e), 6) AS chi2,
                round(sqrt(sum((o - e) * (o - e) / e)
                  / ((SELECT n FROM n)
                    * (least((SELECT r FROM n), (SELECT c FROM n)) - 1))),
                  6) AS cramers_v
              FROM grid""")),

    // per-dimension Fisher LDA ratio (between-class / within-class
    // variance) of the embedding space against the fixture labels — the
    // feature-discriminability audit. Per-(class, dim) moments are 6-dp
    // anchored BEFORE the scatter derivation (the standardize/CUPED
    // convention); top-10 dims by ratio.
    Q("q_fisher_lda",
      (s, dir) => {
        val v = t(s, dir, "embeddings")
          .filter(col("embedding").isNotNull && size(col("embedding")) === 64)
          .select(col("label").cast("long").as("cls"),
            posexplode(col("embedding")))
          .select(col("cls"), (col("pos") + 1).cast("long").as("dim"),
            col("col").cast("double").as("x"))
        val per = v.groupBy("cls", "dim")
          .agg(count(lit(1)).as("cn"), round(avg("x"), 6).as("mu"),
            round(avg(col("x") * col("x")), 6).as("m2"))
        val perD = per.groupBy("dim")
          .agg(sum("cn").as("nn"),
            round(sum(col("cn") * col("mu")) / sum("cn"), 6).as("gmu"))
        per.join(perD, Seq("dim"))
          .groupBy("dim")
          .agg(
            round(sum(col("cn") * (col("mu") - col("gmu")) * (col("mu") - col("gmu")))
              / max("nn"), 6).as("between_var"),
            round(sum(col("cn") * (col("m2") - col("mu") * col("mu")))
              / max("nn"), 6).as("within_var"))
          .withColumn("fisher_ratio",
            round(col("between_var") / col("within_var"), 6))
          .orderBy(col("fisher_ratio").desc, col("dim"))
          .limit(10)
      },
      Some("""WITH v AS (SELECT CAST(label AS BIGINT) AS cls,
                  generate_subscripts(embedding, 1) AS dim,
                  CAST(unnest(embedding) AS DOUBLE) AS x
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              per AS (SELECT cls, CAST(dim AS BIGINT) AS dim,
                  CAST(count(*) AS BIGINT) AS cn,
                  round(avg(x), 6) AS mu, round(avg(x * x), 6) AS m2
                FROM v GROUP BY 1, 2),
              perd AS (SELECT dim, CAST(sum(cn) AS BIGINT) AS nn,
                  round(sum(cn * mu) / CAST(sum(cn) AS DOUBLE), 6) AS gmu
                FROM per GROUP BY 1),
              sc AS (SELECT per.dim,
                  round(sum(cn * (mu - gmu) * (mu - gmu))
                    / CAST(max(nn) AS DOUBLE), 6) AS between_var,
                  round(sum(cn * (m2 - mu * mu))
                    / CAST(max(nn) AS DOUBLE), 6) AS within_var
                FROM per JOIN perd ON perd.dim = per.dim
                GROUP BY per.dim)
              SELECT dim, between_var, within_var,
                round(between_var / within_var, 6) AS fisher_ratio
              FROM sc ORDER BY fisher_ratio DESC, dim LIMIT 10""")),

    // top-2 principal components via grid-snapped Hotelling deflation:
    // the oracle chains BOTH components' 8 power rounds — component 2
    // iterates on cov2 = round(cov - lam1 * v1 v1', 6), the deflation
    // landing back on the same 6-dp anchor the first covariance sits on,
    // so no unrounded intermediate ever crosses engines.
    Q("q_pca_deflate",
      (s, dir) => graft.operators.Decomp.pcaTopComponents(
          t(s, dir, "embeddings"), "embedding", dim = 64, k = 2, rounds = 8)
        .orderBy("component", "dim"),
      Some {
        def rounds(prefix: String, covName: String): String =
          (1 to 8).map { i =>
            val pv = if (i == 1) s"${prefix}0" else s"$prefix${i - 1}"
            s"""$prefix${i}r AS MATERIALIZED (SELECT $covName.i AS d,
                  sum($covName.c * p.v) AS w
                FROM $covName JOIN $pv p ON p.d = $covName.j GROUP BY 1),
              $prefix$i AS MATERIALIZED (SELECT d,
                round(w / (SELECT sqrt(sum(w*w)) FROM $prefix${i}r), 7) AS v
                FROM $prefix${i}r)"""
          }.mkString(",\n              ")
        s"""WITH v AS MATERIALIZED (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                  generate_subscripts(embedding, 1) AS i
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              nn AS MATERIALIZED (
                SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64),
              s AS MATERIALIZED (SELECT i, sum(x) AS si FROM v GROUP BY i),
              cp AS MATERIALIZED (
                SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS pij
                FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i <= b.i
                GROUP BY 1, 2),
              cov0 AS (SELECT cp.i, cp.j,
                  round(cp.pij / (SELECT n FROM nn)
                    - (sa.si / (SELECT n FROM nn))
                      * (sb.si / (SELECT n FROM nn)), 6) AS c
                FROM cp JOIN s sa ON sa.i = cp.i JOIN s sb ON sb.i = cp.j),
              cov1 AS MATERIALIZED (SELECT i, j, c FROM cov0
                UNION ALL SELECT j AS i, i AS j, c FROM cov0 WHERE i <> j),
              pa0 AS (SELECT i AS d,
                round(CAST(1 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE)), 7) AS v
                FROM s),
              ${rounds("pa", "cov1")},
              cvfa AS (SELECT cov1.i AS d, sum(cov1.c * p.v) AS w
                FROM cov1 JOIN pa8 p ON p.d = cov1.j GROUP BY 1),
              lam1 AS MATERIALIZED (SELECT round(
                  (SELECT sum(pa8.v * cvfa.w) FROM pa8
                    JOIN cvfa ON cvfa.d = pa8.d)
                  / (SELECT sum(v * v) FROM pa8), 6) AS ev),
              cov2 AS MATERIALIZED (SELECT c1.i, c1.j,
                  round(c1.c - (SELECT ev FROM lam1) * va.v * vb.v, 6) AS c
                FROM cov1 c1 JOIN pa8 va ON va.d = c1.i
                JOIN pa8 vb ON vb.d = c1.j),
              pb0 AS (SELECT i AS d,
                round(CAST(1 AS DOUBLE) / sqrt(CAST(64 AS DOUBLE)), 7) AS v
                FROM s),
              ${rounds("pb", "cov2")},
              cvfb AS (SELECT cov2.i AS d, sum(cov2.c * p.v) AS w
                FROM cov2 JOIN pb8 p ON p.d = cov2.j GROUP BY 1),
              lam2 AS MATERIALIZED (SELECT round(
                  (SELECT sum(pb8.v * cvfb.w) FROM pb8
                    JOIN cvfb ON cvfb.d = pb8.d)
                  / (SELECT sum(v * v) FROM pb8), 6) AS ev)
              SELECT CAST(1 AS BIGINT) AS component, d AS dim, v AS loading,
                (SELECT ev FROM lam1) AS eigenvalue FROM pa8
              UNION ALL
              SELECT CAST(2 AS BIGINT), d, v, (SELECT ev FROM lam2) FROM pb8
              ORDER BY component, dim"""
      }))

  /** Session-10 wave: rank-based inference (Mann–Whitney, Spearman,
    * BH-FDR), ranking/calibration quality (PR-AUC, ECE, NDCG/MRR/recall),
    * series autocorrelation, and the Warner randomized-response audit.
    * All follow the grouped-support envelope: rank arithmetic runs over
    * distinct-value support tables, never a global subject sort.
    */
  private val session10: Seq[Q] = {
    // NDCG discount constants 1/log2(i+1) and their prefix sums, Scala-
    // computed ONCE and spliced into both engines (log2 is 1-ulp, not
    // correctly rounded, in either engine). The e0 suffix forces DuckDB
    // to parse each literal directly as DOUBLE — a plain decimal literal
    // would go through DECIMAL and could double-round.
    val discVals = graft.operators.RankEval.discounts(10).zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d}e0)" }.mkString(", ")
    val pfxVals = graft.operators.RankEval.discountPrefix(10).zipWithIndex
      .map { case (p, i) => s"(${i + 1}, ${p}e0)" }.mkString(", ")
    Seq(

    // Mann–Whitney U (Wilcoxon rank-sum) between the user-parity variants
    // over per-user engagement: the nonparametric sibling of q_ab_ztest.
    // INTEGER until the final three divisions (rank sums as 2x-midranks
    // in BIGINT, tie term Σ(t³-t) in BIGINT), computed over the
    // distinct-score support only — the aucFromScores envelope.
    Q("q_mann_whitney",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("v"))
          .withColumn("g", col("user_id") % 2)
        graft.operators.RankEval.mannWhitney(per, col("v"), col("g"))
      },
      Some(s"""WITH per AS (SELECT user_id, count(*) AS v, user_id % 2 AS g
                FROM events GROUP BY 1),
              byv AS (SELECT v,
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
                FROM per GROUP BY 1),
              r AS (SELECT *, ca + cb AS cnt,
                  CAST(sum(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) - (ca + cb)
                    AS cum_less
                FROM byv),
              ag AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b,
                  CAST(sum(ca * (2 * cum_less + cnt + 1)) AS BIGINT) AS ra2,
                  CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
                FROM r),
              d AS (SELECT n_a, n_b, n_a + n_b AS n, ties,
                  CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u,
                  CAST(n_a AS DOUBLE) * n_b / 2.0 AS mu FROM ag),
              e AS (SELECT *, CAST(n_a AS DOUBLE) * n_b / 12.0 *
                  (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (n - 1))) AS sigma2 FROM d),
              f AS (SELECT n_a, n_b, u, CASE WHEN sigma2 > 0 THEN
                  round((u - mu) / sqrt(sigma2), 6) END AS z FROM e)
              SELECT n_a, n_b, u, z,
                abs(z) > ${graft.operators.RankEval.ZCrit05} AS significant
              FROM f""")),

    // Spearman rank correlation between per-user engagement and purchase
    // count — Pearson over midranks (the tie-correct form). The five rank
    // moments are EXACT: DecimalType(38,0) on the Spark side, HUGEINT in
    // the oracle, each cast to double once at the end.
    Q("q_spearman",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        graft.operators.RankEval.spearman(per, col("x"), col("y"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS x,
                  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS y
                FROM events GROUP BY 1),
              bx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt
                FROM per GROUP BY 1),
              rx AS (SELECT x, 2 * (CAST(sum(cnt) OVER (ORDER BY x ROWS
                  BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  - cnt) + cnt + 1 AS r_x FROM bx),
              by2 AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt
                FROM per GROUP BY 1),
              ry AS (SELECT y, 2 * (CAST(sum(cnt) OVER (ORDER BY y ROWS
                  BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  - cnt) + cnt + 1 AS r_y FROM by2),
              j AS (SELECT r_x, r_y FROM per
                JOIN rx USING (x) JOIN ry USING (y)),
              ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  sum(CAST(r_x AS HUGEINT)) AS sx,
                  sum(CAST(r_y AS HUGEINT)) AS sy,
                  sum(CAST(r_x AS HUGEINT) * r_x) AS sxx,
                  sum(CAST(r_y AS HUGEINT) * r_y) AS syy,
                  sum(CAST(r_x AS HUGEINT) * r_y) AS sxy FROM j),
              d AS (SELECT n,
                  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
                  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM ag)
              SELECT n, CASE WHEN vx > 0 AND vy > 0 THEN
                  round(num / (sqrt(vx) * sqrt(vy)), 6) END AS rho
              FROM d""")),

    // PR-curve area by the lower trapezoid over score-descending blocks —
    // the deterministic tie-aware PR-AUC companion to q_auc (same
    // per-user score/label derivation, same distinct-score envelope;
    // within-block order never exists so nothing engine-specific remains).
    Q("q_pr_auc",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("score"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("label"))
        graft.operators.RankEval.prAuc(per, col("score"), col("label"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS s,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1),
              bys AS (SELECT s, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS pos FROM per GROUP BY 1),
              tot AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
                  CAST(sum(cnt) AS BIGINT) AS n_tot FROM bys),
              c AS (SELECT s,
                  CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
                  CAST(sum(pos) OVER w AS BIGINT) AS cum_pos
                FROM bys
                WINDOW w AS (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW)),
              pts AS (SELECT s,
                  CAST(cum_pos AS DOUBLE) / (SELECT n_pos FROM tot)
                    AS recall,
                  CAST(cum_pos AS DOUBLE) / cum_cnt AS prec FROM c),
              lg AS (SELECT recall, prec,
                  coalesce(lag(recall) OVER (ORDER BY s DESC), 0.0)
                    AS recall_prev,
                  coalesce(lag(prec) OVER (ORDER BY s DESC), 1.0)
                    AS prec_prev
                FROM pts)
              SELECT (SELECT n_pos FROM tot) AS n_pos,
                (SELECT n_tot FROM tot) AS n,
                round(sum((recall - recall_prev) * (prec + prec_prev)
                  / 2.0), 6) AS pr_auc
              FROM lg""")),

    // Expected calibration error of the capped engagement score read as a
    // decile confidence (conf = units/10 is an EXACT ratio — summing a
    // float probability column would reintroduce order-dependent
    // accumulation). One groupBy(conf) pass; every term is a correctly-
    // rounded function of exact integer counts.
    Q("q_ece",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(least(count(lit(1)), lit(10L)).as("c"),
            max(when(col("event_type") === "purchase" &&
              col("value") > 150, 1L).otherwise(0L)).as("label"))
        graft.operators.RankEval.ece(per, col("c"), 10, col("label"))
      },
      Some("""WITH per AS (SELECT user_id, least(count(*), 10) AS c,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1),
              byb AS (SELECT c, CAST(count(*) AS BIGINT) AS nb,
                  CAST(sum(y) AS BIGINT) AS pos FROM per GROUP BY 1),
              ce AS (SELECT nb,
                  abs(CAST(pos AS DOUBLE) / nb - CAST(c AS DOUBLE) / 10)
                    AS ce
                FROM byb)
              SELECT CAST(sum(nb) AS BIGINT) AS n,
                round(sum(CAST(nb AS DOUBLE) * ce) / sum(nb), 6) AS ece,
                round(max(ce), 6) AS mce FROM ce""")),

    // Benjamini–Hochberg FDR over the per-event-type two-proportion
    // z-test family. The p inputs are the distribution-free Chebyshev
    // tail bound p = min(1, 1/z²) — a VALID conservative p-value that
    // both engines evaluate exactly from the 6-dp-rounded z; the normal
    // CDF would need exp/erf, which neither engine computes correctly
    // rounded (the pow-vs-x*x doctrine). The BH step-up itself (rank,
    // m·p/i, reverse running min, 6-dp, decide after rounding) is exact.
    Q("q_bh_fdr",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy(col("event_type"), col("user_id"))
          .agg(max(when(col("value") > 150, 1L).otherwise(0L)).as("conv"))
          .withColumn("g", col("user_id") % 2)
        val metrics = per.groupBy("event_type")
          .agg(sum(when(col("g") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("g") === 0, col("conv")).otherwise(0L))
              .as("conv_a"),
            sum(when(col("g") === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when(col("g") === 1, col("conv")).otherwise(0L))
              .as("conv_b"))
          .withColumn("p_pool",
            (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")))
          .withColumn("se",
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .withColumn("z",
            when(col("se") > 0,
              round((col("conv_b") / col("n_b") -
                col("conv_a") / col("n_a")) / col("se"), 6)))
          .withColumn("p",
            when(col("z").isNull || col("z") === 0, lit(1.0))
              .otherwise(least(lit(1.0),
                lit(1.0) / (col("z") * col("z")))))
        graft.operators.RankEval.bhAdjust(metrics, col("event_type"),
          col("p"))
      },
      Some("""WITH per AS (SELECT event_type, user_id,
                  max(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS conv,
                  user_id % 2 AS g
                FROM events GROUP BY 1, 2),
              st AS (SELECT event_type,
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                  CAST(sum(CASE WHEN g = 0 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_a,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_b,
                  CAST(sum(CASE WHEN g = 1 THEN conv ELSE 0 END) AS BIGINT)
                    AS conv_b
                FROM per GROUP BY 1),
              d AS (SELECT *,
                  (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS p_pool
                FROM st),
              e AS (SELECT *, sqrt(p_pool * (CAST(1 AS DOUBLE) - p_pool)
                  * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
                  AS se FROM d),
              f AS (SELECT event_type AS metric, CASE WHEN se > 0 THEN
                  round((conv_b / CAST(n_b AS DOUBLE)
                    - conv_a / CAST(n_a AS DOUBLE)) / se, 6) END AS z
                FROM e),
              pv AS (SELECT metric, CASE WHEN z IS NULL OR z = 0 THEN 1.0
                  ELSE least(1.0, 1.0 / (z * z)) END AS p FROM f),
              rk AS (SELECT metric, p,
                  row_number() OVER (ORDER BY p, metric) AS rank,
                  count(*) OVER () AS m FROM pv),
              rw AS (SELECT *,
                  least(1.0, CAST(m AS DOUBLE) * p / rank) AS raw FROM rk),
              adj AS (SELECT metric, round(p, 6) AS p_value,
                  CAST(rank AS BIGINT) AS rank,
                  round(min(raw) OVER (ORDER BY rank DESC ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS p_adj
                FROM rw)
              SELECT metric, p_value, rank, p_adj,
                p_adj <= 0.05 AS significant
              FROM adj ORDER BY rank""")),

    // Retrieval-quality eval: per-customer supplier ranking by total
    // quantity (integer-exact ordering, suppkey tiebreak) scored against
    // the REPEAT-SUPPLIER relevance set (suppliers with >= 2 distinct
    // orders from that customer) — macro NDCG@10 / MRR@10 / recall@10.
    // The relevance set MUST be derived from observed interactions, never
    // from a dimension cross: the first cut used customer x same-nation
    // supplier, which is (|C|·|S|/nations) — QUADRATIC in scale factor
    // (600k pairs at sf0.1, a measured ~6e9 at x100) — while this
    // definition is a subset of the customer-supplier pairs that exist,
    // linear by construction. The log2 discount table and its prefix sums
    // are Scala-computed literals spliced into BOTH engines, so neither
    // ever evaluates log2.
    Q("q_ndcg_mrr",
      (s, dir) => {
        val pairs = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("q1"))
          .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
        // ONE shared aggregate feeds both the ranking and the relevance
        // set (persisted — two consumers): the first cut ran the 600M-row
        // join+groupBy twice and paid a measured 642 s at ×1000; the
        // two-level aggregate (orderkey kept in level 1, so level-2
        // count(*) IS the distinct-order count with no Expand) halves the
        // heavy shuffle work
        val lvl1 = pairs
          .groupBy(col("o_custkey").as("qid"), col("l_suppkey").as("item"),
            col("l_orderkey").as("ok"))
          .agg(sum("q1").as("qty1"))
        val agg = OperatorCaches.persistTracked(
          lvl1.groupBy("qid", "item")
            .agg(sum("qty1").as("qty"), count(lit(1)).as("n_ord")))
        val ranked = agg.withColumn("rank",
          row_number().over(Window.partitionBy("qid")
            .orderBy(col("qty").desc, col("item"))))
          .select("qid", "item", "rank")
        val relevant = agg.filter(col("n_ord") >= 2).select("qid", "item")
        graft.operators.RankEval.rankingEval(ranked, relevant, 10)
      },
      Some(s"""WITH rev AS (SELECT o_custkey AS qid, l_suppkey AS item,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2),
              rk AS (SELECT qid, item, row_number() OVER (PARTITION BY qid
                  ORDER BY qty DESC, item) AS rank FROM rev),
              relv AS (SELECT o_custkey AS qid, l_suppkey AS item
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2 HAVING count(DISTINCT l_orderkey) >= 2),
              rel AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_rel
                FROM relv GROUP BY 1),
              disc(i, dv) AS (VALUES $discVals),
              pfx(i, sp) AS (VALUES $pfxVals),
              hits AS (SELECT r.qid, sum(dd.dv) AS dcg,
                  CAST(min(r.rank) AS BIGINT) AS first_hit,
                  CAST(count(*) AS BIGINT) AS n_hits
                FROM rk r JOIN relv v ON v.qid = r.qid AND v.item = r.item
                JOIN disc dd ON dd.i = r.rank
                WHERE r.rank <= 10 GROUP BY 1),
              per AS (SELECT rel.qid, rel.n_rel,
                  coalesce(h.dcg, 0.0) AS dcg,
                  coalesce(CAST(1 AS DOUBLE) / h.first_hit, 0.0) AS rr,
                  coalesce(h.n_hits, 0) AS n_hits
                FROM rel LEFT JOIN hits h ON h.qid = rel.qid),
              fin AS (SELECT per.*, dcg / pf.sp AS ndcg FROM per
                JOIN pfx pf ON pf.i = least(per.n_rel, 10))
              SELECT CAST(count(*) AS BIGINT) AS n_queries,
                round(avg(ndcg), 6) AS ndcg, round(avg(rr), 6) AS mrr,
                round(avg(CAST(n_hits AS DOUBLE) / n_rel), 6) AS recall
              FROM fin""")),

    // Sample autocorrelation of the daily event-count series at lags
    // 1..7 — the seasonality probe next to q_ewma_forecast. The corpus
    // folds to one row per day FIRST; mean, lag self-join, and both
    // moment sums run over the bounded series support only.
    Q("q_acf",
      (s, dir) => {
        val series = t(s, dir, "events")
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
          .agg(count(lit(1)).as("x"))
        graft.operators.Profiling.acf(series, col("t"), col("x"), 7)
      },
      Some("""WITH series AS (SELECT date_diff('day', DATE '1970-01-01',
                  CAST(ts AS DATE)) AS t, CAST(count(*) AS DOUBLE) AS x
                FROM events GROUP BY 1),
              st AS (SELECT avg(x) AS xbar FROM series),
              c AS (SELECT t, x - (SELECT xbar FROM st) AS d FROM series),
              den AS (SELECT sum(d * d) AS ss FROM c),
              p AS (SELECT r.lg, CAST(count(*) AS BIGINT) AS n_pairs,
                  sum(a.d * b.d) AS num
                FROM c a CROSS JOIN range(1, 8) AS r(lg)
                JOIN c b ON b.t = a.t + r.lg GROUP BY 1)
              SELECT lg AS "lag", n_pairs,
                CASE WHEN (SELECT ss FROM den) > 0 THEN
                  round(num / (SELECT ss FROM den), 6) END AS acf
              FROM p ORDER BY lg""")),

    // Unbiased pass@k (the HumanEval combinatorial estimator) over
    // per-user sample/correct counts: the product form of
    // 1 - C(n-c,k)/C(n,k) as an identical LEFT FOLD in both engines
    // (functions.aggregate vs list_reduce with a prepended seed), k
    // clamped to n, the n-c < k case pinned to 1 before the fold runs.
    Q("q_pass_at_k",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") > 150, 1L).otherwise(0L)).as("c"))
        graft.operators.ModelEval.passAtK(per, col("n"), col("c"), 5)
      },
      Some("""WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
                FROM events GROUP BY 1),
              pk AS (SELECT CASE WHEN n - c < least(5, n) THEN 1.0
                  ELSE 1.0 - list_reduce(
                    list_prepend(CAST(1 AS DOUBLE),
                      [CAST(n - c - i AS DOUBLE) / (n - i)
                       FOR i IN range(0, least(5, n))]),
                    (acc, x) -> acc * x) END AS pk
                FROM per)
              SELECT CAST(count(*) AS BIGINT) AS n_tasks, 5 AS k,
                round(avg(pk), 6) AS pass_at_k FROM pk""")),

    // Bradley–Terry ratings over the per-user event-type preference
    // tournament (a beats b for a user when the user did a more often),
    // MM algorithm at 8 fixed rounds on a 7-dp per-round grid — the
    // pagerank round-replay convention; the oracle unrolls the rounds as
    // MATERIALIZED CTEs (the logistic-GD pattern). The corpus-sized work
    // is the one wins aggregation; every round is model-support-sized.
    Q("q_bradley_terry",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val a = per.select(col("user_id"), col("event_type").as("a"),
          col("cnt").as("ca"))
        val b = per.select(col("user_id"), col("event_type").as("b"),
          col("cnt").as("cb"))
        val wins = a.join(b, Seq("user_id"))
          .filter(col("a") =!= col("b") && col("ca") > col("cb"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
        graft.operators.RankEval.bradleyTerry(wins, rounds = 8)
      },
      Some {
        val roundCtes = (1 to 8).map { r =>
          s"""q$r AS MATERIALIZED (SELECT n.a AS model,
                  coalesce(wt.w_tot, 0) / sum(n.n / (pa.p + pb.p)) AS praw
                FROM nij n JOIN p${r - 1} pa ON pa.model = n.a
                  JOIN p${r - 1} pb ON pb.model = n.b
                  LEFT JOIN wtot wt ON wt.a = n.a
                GROUP BY n.a, wt.w_tot),
              p$r AS MATERIALIZED (SELECT model,
                  round(praw / (SELECT sum(praw) FROM q$r), 7) AS p
                FROM q$r)"""
        }.mkString(",\n              ")
        s"""WITH percnt AS MATERIALIZED (SELECT user_id, event_type,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              wins AS MATERIALIZED (SELECT x.event_type AS a,
                  y.event_type AS b, CAST(count(*) AS BIGINT) AS w
                FROM percnt x JOIN percnt y ON x.user_id = y.user_id
                  AND x.event_type <> y.event_type AND x.cnt > y.cnt
                GROUP BY 1, 2),
              nij AS MATERIALIZED (SELECT a, b,
                  CAST(sum(w) AS BIGINT) AS n
                FROM (SELECT a, b, w FROM wins
                  UNION ALL SELECT b AS a, a AS b, w FROM wins)
                GROUP BY 1, 2),
              wtot AS (SELECT a, CAST(sum(w) AS BIGINT) AS w_tot
                FROM wins GROUP BY 1),
              models AS (SELECT DISTINCT a AS model FROM nij),
              p0 AS MATERIALIZED (SELECT model, CAST(1 AS DOUBLE)
                  / (SELECT count(*) FROM models) AS p FROM models),
              $roundCtes
              SELECT model, p AS rating FROM p8 ORDER BY model"""
      }),

    // Pairwise win rates with Wilson 95% intervals over the same
    // preference tournament — the per-pair uncertainty readout next to
    // the Bradley–Terry point ratings; every term is a correctly-rounded
    // function of exact integer counts and the spliced z.
    Q("q_winrate_wilson",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val a = per.select(col("user_id"), col("event_type").as("a"),
          col("cnt").as("ca"))
        val b = per.select(col("user_id"), col("event_type").as("b"),
          col("cnt").as("cb"))
        val wins = a.join(b, Seq("user_id"))
          .filter(col("a") =!= col("b") && col("ca") > col("cb"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
        graft.operators.RankEval.winRateWilson(wins)
      },
      Some {
        val z = graft.operators.RankEval.ZCrit05
        s"""WITH percnt AS MATERIALIZED (SELECT user_id, event_type,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              wins AS (SELECT x.event_type AS a, y.event_type AS b,
                  CAST(count(*) AS BIGINT) AS w
                FROM percnt x JOIN percnt y ON x.user_id = y.user_id
                  AND x.event_type <> y.event_type AND x.cnt > y.cnt
                GROUP BY 1, 2),
              sym AS (SELECT least(a, b) AS pa, greatest(a, b) AS pb,
                  CASE WHEN a < b THEN w ELSE 0 END AS wa, w AS wn
                FROM wins),
              pr AS (SELECT pa AS a, pb AS b, CAST(sum(wa) AS BIGINT) AS w,
                  CAST(sum(wn) AS BIGINT) AS n
                FROM sym GROUP BY 1, 2),
              d AS (SELECT a, b, n, CAST(w AS DOUBLE) / n AS rate FROM pr),
              e AS (SELECT *,
                  rate + ${z * z} / (CAST(2 AS DOUBLE) * n) AS center,
                  $z * sqrt(rate * (CAST(1 AS DOUBLE) - rate) / n
                    + ${z * z} / (CAST(4 AS DOUBLE) * n * n)) AS margin,
                  CAST(1 AS DOUBLE) + ${z * z} / n AS denom FROM d)
              SELECT a, b, n, round(rate, 6) AS rate,
                round((center - margin) / denom, 6) AS lo,
                round((center + margin) / denom, 6) AS hi
              FROM e ORDER BY a, b"""
      }),

    // Warner randomized response over per-user high-value conversion at
    // truth probability 3/4 (ε = ln 3), with the release-side debias
    // audit: every per-subject coin is the portable seeded hash, so the
    // oracle replays the mechanism bit-exactly; true rate and estimator
    // error ride along audit-style (the bloom-FPR convention).
    Q("q_randomized_response",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 150, 1L).otherwise(0L)).as("truth"))
        graft.operators.Privacy.randomizedResponse(
          per, col("user_id"), col("truth"))
      },
      Some(s"""WITH per AS (SELECT user_id,
                  max(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS truth
                FROM events GROUP BY 1),
              rep AS (SELECT truth, CASE WHEN ${graft.operators.PortableHash
                .duckSql("'rr:' || CAST(user_id AS VARCHAR)")} % 4 < 3
                  THEN truth ELSE 1 - truth END AS reported FROM per),
              ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(reported) AS BIGINT) AS rep_sum,
                  CAST(sum(truth) AS BIGINT) AS true_sum FROM rep)
              SELECT n, CAST(0.75 AS DOUBLE) AS p_truth,
                round(rep_sum / CAST(n AS DOUBLE), 6) AS reported_rate,
                round((rep_sum / CAST(n AS DOUBLE) - 0.25) / 0.5, 6)
                  AS estimate,
                round(true_sum / CAST(n AS DOUBLE), 6) AS true_rate,
                round(abs((rep_sum / CAST(n AS DOUBLE) - 0.25) / 0.5
                  - true_sum / CAST(n AS DOUBLE)), 6) AS abs_err
              FROM ag""")))
  }

  /** Session-10b wave: inter-annotator agreement (the label-quality gate),
    * trend/changepoint statistics, Cox proportional hazards, GBDT
    * histogram split finding, clustering-quality indices, and blocked
    * fuzzy string matching.
    */
  private lazy val session10b: Seq[Q] = {
    // Shared synthetic rating panel over documents: raters 1..3 each
    // bucket a document into one of 5 length classes, perturbed by a
    // per-(rater, doc) portable-hash offset — correlated through n_chars
    // (so agreement is far above chance) with rater-specific noise (so it
    // is not perfect). The same construction feeds Fleiss (full panel)
    // and Krippendorff (rater 2 missing on every doc_id % 3 == 0 item).
    def ratingPanel(s: SparkSession, dir: String): DataFrame =
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(array(lit(1), lit(2), lit(3))).as("rater"))
        .withColumn("cat", least(
          floor((col("n_chars") + pmod(graft.operators.PortableHash
            .portable60(concat_ws(":", lit("fl"), col("rater"),
              col("doc_id"))), lit(40L))) / 60.0),
          lit(4L)))
    val panelSql =
      s"""SELECT doc_id, r, least(CAST(floor((n_chars
          + ${graft.operators.PortableHash.duckSql(
            "'fl:' || CAST(r AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")}
          % 40) / 60.0) AS BIGINT), 4) AS cat
        FROM documents, (VALUES (1), (2), (3)) rs(r)"""
    Seq(

    // Cohen's κ between two deterministic "raters" of document length
    // class (char-count bucket vs token-count bucket): the two-rater
    // chance-corrected agreement gate. κ is one exact-integer rational —
    // (n·Σdiag − Σrow·col) / (n² − Σrow·col) in DecimalType(38,0)/HUGEINT
    // — so the 6-dp outputs are bit-identical cross-engine.
    Q("q_cohen_kappa",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(
            least(floor(col("n_chars") / 60.0), lit(4L)).as("a"),
            least(floor(size(split(trim(col("text")), "\\s+")) / 12.0),
              lit(4L)).as("b"))
        graft.operators.Agreement.cohenKappa(d, col("a"), col("b"))
      },
      Some("""WITH r AS (SELECT
                  least(CAST(floor(n_chars / 60.0) AS BIGINT), 4) AS a,
                  least(CAST(floor(len(regexp_split_to_array(trim(text),
                    '\s+')) / 12.0) AS BIGINT), 4) AS b
                FROM documents),
              cm AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
                FROM r GROUP BY 1, 2),
              tot AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                  CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS HUGEINT)
                    AS diag FROM cm),
              rw AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cm GROUP BY 1),
              cl AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cm GROUP BY 1),
              pe AS (SELECT coalesce(CAST(sum(CAST(ra AS HUGEINT) * cb)
                  AS HUGEINT), 0) AS pe_num
                FROM rw JOIN cl ON a = b)
              SELECT CAST(n AS BIGINT) AS n,
                round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
                round(CAST(pe_num AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
                CASE WHEN n * n = pe_num THEN NULL
                  ELSE round(CAST(n * diag - pe_num AS DOUBLE)
                    / CAST(n * n - pe_num AS DOUBLE), 6) END AS kappa
              FROM tot CROSS JOIN pe""")),

    // Fleiss' κ over the full 3-rater panel: the fixed-panel multi-rater
    // agreement coefficient. Sufficient statistics (Σn_ic², category-
    // total squares) are exact integers; κ is one identical double
    // expression over them in both engines.
    Q("q_fleiss_kappa",
      (s, dir) => graft.operators.Agreement.fleissKappa(
        ratingPanel(s, dir), col("doc_id"), col("cat")),
      Some(s"""WITH rt AS ($panelSql),
              nic AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
                FROM rt GROUP BY 1, 2),
              pi AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS m,
                  CAST(sum(c * c) AS BIGINT) AS s2u FROM nic GROUP BY 1),
              ist AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
                  CAST(sum(s2u) AS BIGINT) AS s2 FROM pi),
              cst AS (SELECT CAST(sum(CAST(tc AS HUGEINT) * tc) AS HUGEINT)
                  AS sc2
                FROM (SELECT cat, CAST(sum(c) AS BIGINT) AS tc
                  FROM nic GROUP BY 1)),
              d AS (SELECT n_items, s2, sc2,
                  CAST(s2 - n_items * 3 AS DOUBLE)
                    / CAST(n_items * 3 * 2 AS DOUBLE) AS pbar_raw,
                  CAST(sc2 AS DOUBLE)
                    / CAST(CAST(n_items * 3 AS HUGEINT) * (n_items * 3)
                      AS DOUBLE) AS pe_raw
                FROM ist CROSS JOIN cst)
              SELECT n_items, CAST(3 AS BIGINT) AS n_raters,
                round(pbar_raw, 6) AS p_bar, round(pe_raw, 6) AS p_e,
                CASE WHEN pe_raw = 1.0 THEN NULL
                  ELSE round((pbar_raw - pe_raw) / (1.0 - pe_raw), 6) END
                  AS kappa
              FROM d""")),

    // Krippendorff's α (nominal) over the RAGGED panel — rater 2 skips
    // every third document, the arrival shape of real crowdsourced/LLM-
    // judge labels. Per-unit disagreements stay exact integers grouped by
    // panel size m before the 1/(m−1) weights apply, so the only double
    // summation runs over the two-value m-support.
    Q("q_krippendorff_alpha",
      (s, dir) => graft.operators.Agreement.krippendorffAlpha(
        ratingPanel(s, dir)
          .filter(!(col("rater") === 2 && pmod(col("doc_id"), lit(3)) === 0)),
        col("doc_id"), col("cat")),
      Some(s"""WITH rt AS ($panelSql),
              rg AS (SELECT * FROM rt
                WHERE NOT (r = 2 AND doc_id % 3 = 0)),
              nuc AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS c
                FROM rg GROUP BY 1, 2),
              pu AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS m,
                  CAST(sum(c * c) AS BIGINT) AS s2u
                FROM nuc GROUP BY 1 HAVING sum(c) >= 2),
              bym AS (SELECT m, CAST(count(*) AS BIGINT) AS units,
                  CAST(sum(m * m - s2u) AS BIGINT) AS du
                FROM pu GROUP BY 1),
              ds AS (SELECT CAST(sum(units) AS BIGINT) AS n_units,
                  CAST(sum(m * units) AS BIGINT) AS np,
                  sum(CAST(du AS DOUBLE) / CAST(m - 1 AS DOUBLE)) AS do_num
                FROM bym),
              ct AS (SELECT cat, CAST(sum(c) AS BIGINT) AS nc
                FROM nuc JOIN pu USING (doc_id) GROUP BY 1),
              de AS (SELECT CAST(sum(CAST(nc AS HUGEINT)
                  * ((SELECT np FROM ds) - nc)) AS HUGEINT) AS de_num
                FROM ct)
              SELECT n_units, np AS n_pairable,
                round(do_num / CAST(np AS DOUBLE), 6) AS d_o,
                round(CAST(de_num AS DOUBLE)
                  / CAST(CAST(np AS HUGEINT) * (np - 1) AS DOUBLE), 6)
                  AS d_e,
                CASE WHEN de_num = 0 THEN NULL
                  ELSE round(1.0 - (do_num / CAST(np AS DOUBLE))
                    / (CAST(de_num AS DOUBLE)
                      / CAST(CAST(np AS HUGEINT) * (np - 1) AS DOUBLE)), 6)
                  END AS alpha
              FROM ds CROSS JOIN de""")),

    // CUSUM changepoint over the daily event-volume series: where did
    // the level shift? The argmax of |n·P_k − k·T| is pure Decimal/
    // HUGEINT integer arithmetic (tie → smallest k), so the located
    // bucket is bit-deterministic; the three readout doubles divide
    // exact integers once. The only full-data pass is the daily groupBy
    // — the series contract in operators.Trend.
    Q("q_cusum_changepoint",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("x"))
        graft.operators.Trend.cusumChangepoint(daily, col("d"), col("x"))
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS t,
                  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS tt FROM d),
              sc AS (SELECT t, x,
                  CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS idx,
                  CAST(sum(x) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS p
                FROM d),
              st AS (SELECT t, idx, p, n, tt,
                  abs(CAST(n AS HUGEINT) * p - CAST(idx AS HUGEINT) * tt)
                    AS stat
                FROM sc CROSS JOIN tot WHERE idx < n)
              SELECT t AS t_hat, idx AS cp_idx, n,
                round(CAST(p AS DOUBLE) / CAST(idx AS DOUBLE), 6)
                  AS mean_before,
                round(CAST(tt - p AS DOUBLE) / CAST(n - idx AS DOUBLE), 6)
                  AS mean_after,
                round(CAST(stat AS DOUBLE) / CAST(n AS DOUBLE), 6)
                  AS cusum_peak
              FROM st ORDER BY stat DESC, idx LIMIT 1""")),

    // Mann–Kendall monotone-trend test over the hourly event-volume
    // series (720 buckets at sf0.1): S and the tie term are exact
    // integers from one non-equi self-join of the bounded series; the
    // tie-corrected z and the 5% call ride the 6-dp grid against the
    // spliced critical value.
    Q("q_mann_kendall",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        graft.operators.Trend.mannKendall(hourly, col("h"), col("x"))
      },
      Some(s"""WITH d AS (SELECT date_trunc('hour', ts) AS t,
                  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
              sp AS (SELECT CAST(coalesce(sum(CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END), 0) AS BIGINT) AS s
                FROM d a JOIN d b ON a.t < b.t),
              nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM d),
              ti AS (SELECT coalesce(CAST(sum(tc * (tc - 1) * (2 * tc + 5))
                    AS HUGEINT), 0) AS tie_term
                FROM (SELECT CAST(count(*) AS HUGEINT) AS tc
                  FROM d GROUP BY x)),
              vv AS (SELECT s, n,
                  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                    / 18.0 AS var_raw
                FROM sp CROSS JOIN nn CROSS JOIN ti),
              zz AS (SELECT *, CASE WHEN var_raw > 0 THEN
                    CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_raw)
                      WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_raw)
                      ELSE 0.0 END END AS z_raw FROM vv)
              SELECT CAST(n AS BIGINT) AS n, s, round(var_raw, 6) AS var_s,
                round(z_raw, 6) AS z,
                coalesce(abs(round(z_raw, 6))
                  > ${graft.operators.RankEval.ZCrit05}, FALSE)
                  AS significant,
                CASE WHEN coalesce(abs(round(z_raw, 6))
                    > ${graft.operators.RankEval.ZCrit05}, FALSE) AND s > 0
                    THEN 'increasing'
                  WHEN coalesce(abs(round(z_raw, 6))
                    > ${graft.operators.RankEval.ZCrit05}, FALSE) AND s < 0
                    THEN 'decreasing'
                  ELSE 'none' END AS trend
              FROM zz""")),

    // Theil–Sen robust slope of hourly event volume against the epoch-
    // hour index: median of the O(n²/2) pairwise slopes (each one
    // division of exact integers), intercept = median residual at the
    // 6-dp-snapped slope. Both medians are rank-selected (2·rn ∈
    // [m, m+2]) so tie order between equal slopes cannot move them.
    Q("q_theil_sen",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy((unix_timestamp(date_trunc("hour", col("ts"))) / 3600)
            .cast("long").as("hi"))
          .agg(count(lit(1)).as("x"))
        graft.operators.Trend.theilSen(hourly, col("hi"), col("x"))
      },
      Some("""WITH d AS (SELECT CAST(epoch(date_trunc('hour', ts))
                    AS BIGINT) // 3600 AS ti,
                  CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
              p AS (SELECT CAST(b.x - a.x AS DOUBLE)
                  / CAST(b.ti - a.ti AS DOUBLE) AS v
                FROM d a JOIN d b ON a.ti < b.ti),
              r AS (SELECT v,
                  CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn,
                  CAST(count(*) OVER () AS BIGINT) AS m FROM p),
              sl AS (SELECT round(avg(v), 6) AS slope FROM r
                WHERE rn * 2 >= m AND rn * 2 <= m + 2),
              res AS (SELECT CAST(x AS DOUBLE)
                  - (SELECT slope FROM sl) * CAST(ti AS DOUBLE) AS v FROM d),
              r2 AS (SELECT v,
                  CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS rn,
                  CAST(count(*) OVER () AS BIGINT) AS m FROM res),
              ic AS (SELECT round(avg(v), 6) AS intercept FROM r2
                WHERE rn * 2 >= m AND rn * 2 <= m + 2),
              nn AS (SELECT CAST(count(*) AS BIGINT) AS np FROM d)
              SELECT np AS n_points,
                CAST(np * (np - 1) // 2 AS BIGINT) AS n_pairs,
                (SELECT slope FROM sl) AS slope,
                (SELECT intercept FROM ic) AS intercept
              FROM nn""")),

    // Cox proportional hazards (binary covariate, Breslow ties) on the
    // censored order-lifetime subjects q_logrank tests: not just "do the
    // curves differ" but the fitted hazard ratio. Four Newton rounds
    // unrolled in the oracle with the operator's exact grids (U/I 6-dp,
    // beta and e^beta 7-dp) — binary-covariate Cox reduces to the same
    // per-event-time count table as the log-rank test, so the entire fit
    // is grouped-count arithmetic, no per-subject exp() pass.
    Q("q_cox_ph",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val mx = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
        val subj = o.groupBy("o_custkey")
          .agg(min(to_date(col("o_orderdate"))).as("fd"),
            max(to_date(col("o_orderdate"))).as("ld"))
          .crossJoin(broadcast(mx))
          .select(datediff(col("ld"), col("fd")).cast("long").as("duration"),
            when(datediff(col("maxd"), col("ld")) > 30, 1L).otherwise(0L)
              .as("event"),
            pmod(col("o_custkey"), lit(2)).as("g"))
        graft.operators.Survival.coxPH(subj)
      },
      Some {
        val iters = (1 to 4).map { k =>
          val ebPrev = if (k == 1) "1.0" else s"(SELECT eb FROM e${k - 1})"
          val bPrev = if (k == 1) "0.0" else s"(SELECT b FROM e${k - 1})"
          s"""it${k - 1} AS (SELECT round(sum(d1_t - d_t * mu), 6) AS u,
                  round(sum(d_t * mu * (1.0 - mu)), 6) AS i
                FROM (SELECT s.*, (n1_t * $ebPrev)
                    / (n0_t + n1_t * $ebPrev) AS mu FROM sup s)),
              e$k AS (SELECT round($bPrev + u / i, 7) AS b,
                  round(exp(round($bPrev + u / i, 7)), 7) AS eb
                FROM it${k - 1})"""
        }.mkString(",\n              ")
        s"""WITH per AS (SELECT o_custkey,
                  min(CAST(o_orderdate AS DATE)) AS fd,
                  max(CAST(o_orderdate AS DATE)) AS ld
                FROM orders GROUP BY 1),
              mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS maxd
                FROM orders),
              subj AS (SELECT CAST(date_diff('day', fd, ld) AS BIGINT)
                    AS duration,
                  CASE WHEN date_diff('day', ld, (SELECT maxd FROM mx)) > 30
                    THEN 1 ELSE 0 END AS event,
                  o_custkey % 2 AS g
                FROM per),
              byt AS (SELECT duration AS t, count(*) AS n_at_t,
                  CAST(sum(event) AS BIGINT) AS d_t,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1_at_t,
                  CAST(sum(CASE WHEN g = 1 THEN event ELSE 0 END) AS BIGINT)
                    AS d1_t
                FROM subj GROUP BY 1),
              rk AS (SELECT t, d_t, d1_t,
                  CAST(sum(n1_at_t) OVER w AS BIGINT) AS n1_t,
                  CAST(sum(n_at_t) OVER w AS BIGINT)
                    - CAST(sum(n1_at_t) OVER w AS BIGINT) AS n0_t
                FROM byt
                WINDOW w AS (ORDER BY t ROWS BETWEEN CURRENT ROW
                  AND UNBOUNDED FOLLOWING)),
              sup AS MATERIALIZED (SELECT t, d_t, d1_t, n1_t, n0_t
                FROM rk WHERE d_t > 0),
              $iters,
              itf AS (SELECT round(sum(d_t * mu * (1.0 - mu)), 6) AS i
                FROM (SELECT s.*, (n1_t * (SELECT eb FROM e4))
                    / (n0_t + n1_t * (SELECT eb FROM e4)) AS mu
                  FROM sup s)),
              cn AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects,
                  CAST(sum(event) AS BIGINT) AS n_events FROM subj)
              SELECT n_subjects, n_events, (SELECT b FROM e4) AS beta,
                round(exp((SELECT b FROM e4)), 6) AS hazard_ratio,
                round(1.0 / sqrt((SELECT i FROM itf)), 6) AS se,
                round((SELECT b FROM e4)
                  / (1.0 / sqrt((SELECT i FROM itf))), 6) AS z,
                abs(round((SELECT b FROM e4)
                  / (1.0 / sqrt((SELECT i FROM itf))), 6))
                  > ${graft.operators.RankEval.ZCrit05} AS significant
              FROM cn"""
      }),

    // GBDT primitive #1 — histogram split finding: best variance-gain
    // split per feature for extended price (cents) over four binned
    // lineitem features, from ONE (feature, bin) histogram shuffle. All
    // sufficient statistics exact integers; each gain one identical
    // double expression (the Σy² term cancels, so only (count, Σy)
    // prefixes matter).
    Q("q_tree_split",
      (s, dir) => graft.operators.TreeSplit.bestSplits(
        gbtBase(s, dir), col("y"), gbtFeatures.map(n => n -> col(n))),
      Some(s"""WITH $gbtBaseSql,
              m AS MATERIALIZED ($gbtMeltSql),
              h AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS sy FROM m GROUP BY 1, 2),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(y) AS BIGINT) AS syt,
                  CAST(sum(y * y) AS HUGEINT) AS syyt FROM base),
              p AS (SELECT feature, v,
                  CAST(sum(cnt) OVER w AS BIGINT) AS nl,
                  CAST(sum(sy) OVER w AS BIGINT) AS sl
                FROM h
                WINDOW w AS (PARTITION BY feature ORDER BY v ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW)),
              sc AS (SELECT p.*, n, syt,
                  CAST(sl AS DOUBLE) * sl / nl
                    + CAST(syt - sl AS DOUBLE) * (syt - sl) / (n - nl)
                    - CAST(syt AS DOUBLE) * syt / n AS gain,
                  CAST(syyt AS DOUBLE)
                    - CAST(syt AS DOUBLE) * syt / n AS sst
                FROM p CROSS JOIN tot WHERE nl < n),
              rk AS (SELECT *, row_number() OVER (PARTITION BY feature
                  ORDER BY gain DESC, v) AS rk FROM sc)
              SELECT feature, v AS split_v, nl AS n_left,
                n - nl AS n_right,
                CASE WHEN sst > 0 THEN round(gain / sst, 6) END AS gain_rel,
                round(CAST(sl AS DOUBLE) / nl, 6) AS mean_left,
                round(CAST(syt - sl AS DOUBLE) / (n - nl), 6) AS mean_right
              FROM rk WHERE rk = 1 ORDER BY feature""")),

    // GBDT primitive #2 — two boosted regression stumps with shrinkage
    // 0.5: round 2 fits the EXACT residuals of round 1 (leaf values on
    // the 7-dp micro-grid keep residual sums in pure HUGEINT/Decimal
    // arithmetic — see TreeSplit.gbtStumps). The oracle unrolls both
    // rounds: histogram → exact scaled residual prefix sums → gain
    // argmax → micro-leaf fit, then the final ensemble R² from per-leaf-
    // cell exact stats combined in cell order.
    Q("q_gbt_stumps",
      (s, dir) => graft.operators.TreeSplit.gbtStumps(
        gbtBase(s, dir), col("y"), gbtFeatures.map(n => n -> col(n))),
      Some {
        def featCase(sel: String) =
          s"""CASE $sel WHEN 'quantity' THEN quantity
             WHEN 'disc_pct' THEN disc_pct WHEN 'tax_pct' THEN tax_pct
             ELSE ship_month END"""
        val cond1 =
          s"${featCase("(SELECT feature FROM s1)")} <= (SELECT v FROM s1)"
        val cond2 =
          s"${featCase("(SELECT feature FROM s2)")} <= (SELECT v FROM s2)"
        s"""WITH $gbtBaseSql,
              m AS MATERIALIZED ($gbtMeltSql),
              b0 AS MATERIALIZED (SELECT CAST(round((CAST(sum(y) AS DOUBLE)
                  / count(*)) * 10000000.0) AS BIGINT) AS b FROM base),
              h1 AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS sy0,
                  CAST(count(*) AS BIGINT) AS n0 FROM m GROUP BY 1, 2),
              p1 AS (SELECT feature, v,
                  CAST(sum(cnt) OVER wp AS BIGINT) AS nl,
                  CAST(sum(rs) OVER wp AS DOUBLE) AS rl,
                  CAST(sum(cnt) OVER wa AS BIGINT) AS n,
                  CAST(sum(rs) OVER wa - sum(rs) OVER wp AS DOUBLE) AS rr
                FROM (SELECT *, CAST(sy0 AS HUGEINT) * 10000000
                    - CAST(n0 AS HUGEINT) * (SELECT b FROM b0) AS rs
                  FROM h1)
                WINDOW wp AS (PARTITION BY feature ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW),
                  wa AS (PARTITION BY feature ROWS BETWEEN UNBOUNDED
                    PRECEDING AND UNBOUNDED FOLLOWING)),
              s1 AS MATERIALIZED (SELECT feature, v, nl, rl, n, rr,
                  rl * rl / nl + rr * rr / (n - nl)
                    - (rl + rr) * (rl + rr) / n AS gain
                FROM p1 WHERE nl < n
                ORDER BY gain DESC, feature, v LIMIT 1),
              l1 AS MATERIALIZED (SELECT
                  CAST(round((0.5 * (rl / 10000000.0 / nl)) * 10000000.0)
                    AS BIGINT) AS li,
                  CAST(round((0.5 * (rr / 10000000.0 / (n - nl)))
                    * 10000000.0) AS BIGINT) AS ri
                FROM s1),
              m2 AS MATERIALIZED (SELECT m.*,
                  CASE WHEN $cond1 THEN 1 ELSE 0 END AS cell
                FROM m),
              h2 AS (SELECT feature, v, CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(CASE WHEN cell = 0 THEN y ELSE 0 END) AS BIGINT)
                    AS sy0,
                  CAST(sum(CASE WHEN cell = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n0,
                  CAST(sum(CASE WHEN cell = 1 THEN y ELSE 0 END) AS BIGINT)
                    AS sy1,
                  CAST(sum(CASE WHEN cell = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n1
                FROM m2 GROUP BY 1, 2),
              p2 AS (SELECT feature, v,
                  CAST(sum(cnt) OVER wp AS BIGINT) AS nl,
                  CAST(sum(rs) OVER wp AS DOUBLE) AS rl,
                  CAST(sum(cnt) OVER wa AS BIGINT) AS n,
                  CAST(sum(rs) OVER wa - sum(rs) OVER wp AS DOUBLE) AS rr
                FROM (SELECT *,
                    (CAST(sy0 AS HUGEINT) * 10000000 - CAST(n0 AS HUGEINT)
                      * ((SELECT b FROM b0) + (SELECT ri FROM l1)))
                    + (CAST(sy1 AS HUGEINT) * 10000000 - CAST(n1 AS HUGEINT)
                      * ((SELECT b FROM b0) + (SELECT li FROM l1))) AS rs
                  FROM h2)
                WINDOW wp AS (PARTITION BY feature ORDER BY v ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW),
                  wa AS (PARTITION BY feature ROWS BETWEEN UNBOUNDED
                    PRECEDING AND UNBOUNDED FOLLOWING)),
              s2 AS MATERIALIZED (SELECT feature, v, nl, rl, n, rr,
                  rl * rl / nl + rr * rr / (n - nl)
                    - (rl + rr) * (rl + rr) / n AS gain
                FROM p2 WHERE nl < n
                ORDER BY gain DESC, feature, v LIMIT 1),
              l2 AS MATERIALIZED (SELECT
                  CAST(round((0.5 * (rl / 10000000.0 / nl)) * 10000000.0)
                    AS BIGINT) AS li,
                  CAST(round((0.5 * (rr / 10000000.0 / (n - nl)))
                    * 10000000.0) AS BIGINT) AS ri
                FROM s2),
              cf AS (SELECT y,
                  (CASE WHEN $cond1 THEN 1 ELSE 0 END)
                  + (CASE WHEN $cond2 THEN 2 ELSE 0 END) AS cell
                FROM base),
              fin AS MATERIALIZED (SELECT cell,
                  CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(y * y) AS HUGEINT) AS syy
                FROM cf GROUP BY 1),
              pc AS (SELECT c.cell,
                  CAST(((SELECT b FROM b0)
                    + CASE WHEN c.cell % 2 = 1 THEN (SELECT li FROM l1)
                      ELSE (SELECT ri FROM l1) END
                    + CASE WHEN c.cell >= 2 THEN (SELECT li FROM l2)
                      ELSE (SELECT ri FROM l2) END) AS DOUBLE)
                    / 10000000.0 AS p
                FROM (VALUES (0), (1), (2), (3)) c(cell)),
              terms AS MATERIALIZED (SELECT pc.cell,
                  coalesce(CAST(f.syy AS DOUBLE) - 2.0 * pc.p * f.sy
                    + f.cnt * pc.p * pc.p, 0.0) AS t,
                  coalesce(CAST(f.syy AS DOUBLE), 0.0) AS tsyy
                FROM pc LEFT JOIN fin f USING (cell)),
              met AS (SELECT
                  (SELECT t FROM terms WHERE cell = 0)
                    + (SELECT t FROM terms WHERE cell = 1)
                    + (SELECT t FROM terms WHERE cell = 2)
                    + (SELECT t FROM terms WHERE cell = 3) AS sse,
                  (SELECT tsyy FROM terms WHERE cell = 0)
                    + (SELECT tsyy FROM terms WHERE cell = 1)
                    + (SELECT tsyy FROM terms WHERE cell = 2)
                    + (SELECT tsyy FROM terms WHERE cell = 3) AS syysum,
                  (SELECT CAST(count(*) AS BIGINT) FROM base) AS n,
                  (SELECT CAST(sum(y) AS BIGINT) FROM base) AS syt),
              met2 AS (SELECT CASE
                  WHEN (syysum - CAST(syt AS DOUBLE) * syt / n) > 0 THEN
                    round(1.0 - sse
                      / (syysum - CAST(syt AS DOUBLE) * syt / n), 6)
                  END AS r2 FROM met)
              SELECT CAST(1 AS INT) AS round,
                (SELECT feature FROM s1) AS feature,
                (SELECT v FROM s1) AS split_v,
                CAST((SELECT li FROM l1) AS DOUBLE) / 10000000.0
                  AS left_value,
                CAST((SELECT ri FROM l1) AS DOUBLE) / 10000000.0
                  AS right_value,
                CAST((SELECT b FROM b0) AS DOUBLE) / 10000000.0
                  AS base_score,
                (SELECT r2 FROM met2) AS train_r2
              UNION ALL
              SELECT CAST(2 AS INT),
                (SELECT feature FROM s2), (SELECT v FROM s2),
                CAST((SELECT li FROM l2) AS DOUBLE) / 10000000.0,
                CAST((SELECT ri FROM l2) AS DOUBLE) / 10000000.0,
                CAST((SELECT b FROM b0) AS DOUBLE) / 10000000.0,
                (SELECT r2 FROM met2)
              ORDER BY round"""
      }),

    // Simplified silhouette over the labeled embedding corpus: per-point
    // distance to own vs nearest-rival centroid (cosine, 4-dp grid via
    // the portable CosineSimilarity <-> list_cosine_similarity pair),
    // per-cluster means. The quadratic textbook silhouette is replaced
    // by the k-distance centroid form — one narrow corpus pass.
    Q("q_silhouette",
      (s, dir) => graft.operators.ClusterEval.simplifiedSilhouette(
        t(s, dir, "embeddings")),
      Some("""WITH emb AS (SELECT vec_id, label,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              cd AS (SELECT label, CAST(r.i - 1 AS INT) AS dim,
                  round(avg(e[r.i]), 7) AS c
                FROM emb, LATERAL unnest(range(1, len(e) + 1)) r(i)
                GROUP BY 1, 2),
              cent AS (SELECT label, list(c ORDER BY dim) AS cv
                FROM cd GROUP BY 1),
              d AS (SELECT p.vec_id, p.label AS pl, c.label AS cl,
                  round(1.0 - list_cosine_similarity(p.e, c.cv), 4) AS dist
                FROM emb p CROSS JOIN cent c),
              ab AS (SELECT vec_id, pl,
                  min(CASE WHEN cl = pl THEN dist END) AS a,
                  min(CASE WHEN cl <> pl THEN dist END) AS b
                FROM d GROUP BY 1, 2),
              sl AS (SELECT pl AS label, a, b,
                  CASE WHEN greatest(a, b) > 0
                    THEN (b - a) / greatest(a, b) ELSE 0.0 END AS sil
                FROM ab)
              SELECT label, CAST(count(*) AS BIGINT) AS n,
                round(avg(a), 4) AS avg_a, round(avg(b), 4) AS avg_b,
                round(avg(sil), 4) AS avg_sil
              FROM sl GROUP BY 1 ORDER BY label""")),

    // Davies–Bouldin index over the same labeled corpus: per-cluster
    // scatter vs worst-rival separation ratio, mean over clusters
    // (LOWER is better). Scatters on the 6-dp grid; centroid
    // separations through the same portable cosine pair; coincident
    // centroids excluded from the max by the NULL guard in both engines.
    Q("q_davies_bouldin",
      (s, dir) => graft.operators.ClusterEval.daviesBouldin(
        t(s, dir, "embeddings")),
      Some("""WITH emb AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings),
              cd AS (SELECT label, CAST(r.i - 1 AS INT) AS dim,
                  round(avg(e[r.i]), 7) AS c
                FROM emb, LATERAL unnest(range(1, len(e) + 1)) r(i)
                GROUP BY 1, 2),
              cent AS (SELECT label, list(c ORDER BY dim) AS cv
                FROM cd GROUP BY 1),
              a AS (SELECT p.label,
                  round(1.0 - list_cosine_similarity(p.e, c.cv), 4) AS a
                FROM emb p JOIN cent c USING (label)),
              scat AS (SELECT label, round(avg(a), 6) AS s
                FROM a GROUP BY 1),
              pr AS (SELECT i.label AS li, j.label AS lj,
                  round(1.0 - list_cosine_similarity(i.cv, j.cv), 4) AS dij
                FROM cent i JOIN cent j ON i.label <> j.label),
              rat AS (SELECT li,
                  CASE WHEN dij > 0 THEN (si.s + sj.s) / dij END AS ratio
                FROM pr
                JOIN scat si ON si.label = pr.li
                JOIN scat sj ON sj.label = pr.lj),
              wr AS (SELECT li AS label, round(max(ratio), 4) AS worst_ratio
                FROM rat GROUP BY 1),
              db AS (SELECT round(avg(worst_ratio), 4) AS db_index FROM wr)
              SELECT w.label, s.s AS scatter, w.worst_ratio,
                (SELECT db_index FROM db) AS db_index
              FROM wr w JOIN scat s USING (label) ORDER BY label""")),

    // Blocked fuzzy record linkage over a deterministically corrupted
    // customer registry: every 7th name gets one mid-string digit
    // replaced by a hash-derived letter; blocking on (length, last-3-
    // digit suffix) — the regions the corruption model does not touch —
    // shrinks candidates to the suffix block, and the rank-1 window
    // (distance, master id) picks the true source over its distance-2
    // thousands-digit twin. n_candidates rides along as the linkage-
    // confidence audit.
    Q("q_fuzzy_linkage",
      (s, dir) => {
        val master = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_name").as("name"))
        val dirty = master.filter(pmod(col("id"), lit(7)) === 0)
          .withColumn("h",
            pmod(graft.operators.PortableHash.portable60(
              concat(lit("fz:"), col("id").cast("string"))), lit(26L))
              + 97L)
          .withColumn("name", concat(substring(col("name"), 1, 11),
            expr("chr(cast(h as int))"), substring(col("name"), 13, 6)))
          .select("id", "name")
        graft.operators.Linkage.bestMatch(dirty, master, Seq(
            n => length(n), n => substring(n, 16, 3)), maxDistance = 2)
          .orderBy("id")
      },
      Some(s"""WITH master AS (SELECT CAST(c_custkey AS BIGINT) AS id,
                  c_name AS name FROM customer),
              dirty AS (SELECT id,
                  substr(name, 1, 11)
                    || chr(CAST(${graft.operators.PortableHash.duckSql(
                      "'fz:' || CAST(id AS VARCHAR)")} % 26 + 97 AS INT))
                    || substr(name, 13, 6) AS name
                FROM master WHERE id % 7 = 0),
              cand AS (SELECT d.id, d.name, m.id AS match_id,
                  m.name AS match_name,
                  CAST(levenshtein(d.name, m.name) AS BIGINT) AS dist
                FROM dirty d JOIN master m
                  ON length(d.name) = length(m.name)
                  AND substr(d.name, 16, 3) = substr(m.name, 16, 3)
                WHERE levenshtein(d.name, m.name) <= 2),
              rk AS (SELECT *,
                  row_number() OVER (PARTITION BY id
                    ORDER BY dist, match_id) AS rk,
                  CAST(count(*) OVER (PARTITION BY id) AS BIGINT)
                    AS n_candidates
                FROM cand)
              SELECT id, name, match_id, match_name, dist, n_candidates
              FROM rk WHERE rk = 1 ORDER BY id"""),
      // fixed-width 1000-block key: candidates grow quadratically with
      // the registry — measured 132 s in-run / 146.5 s isolated at x100
      // (BENCH_SF10 addenda 7 & 10); kept beside q_fuzzy_linkage_fine
      // (the 10x-block scale path, 16.8 s) and q_fuzzy_linkage_gated
      // (the fail-fast pre-flight)
      counterExample = true))
  }

  /** Shared fixture for the GBDT entries: extended price in cents as the
    * integral label, four already-binned integral lineitem features —
    * the bin-first contract TreeSplit requires.
    */
  private def gbtBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      round(col("l_extendedprice") * 100).cast("long").as("y"),
      col("l_quantity").cast("long").as("quantity"),
      round(col("l_discount") * 100).cast("long").as("disc_pct"),
      round(col("l_tax") * 100).cast("long").as("tax_pct"),
      month(col("l_shipdate")).cast("long").as("ship_month"))

  private lazy val gbtFeatures =
    Seq("quantity", "disc_pct", "tax_pct", "ship_month")

  private lazy val gbtBaseSql =
    """base AS MATERIALIZED (SELECT
          CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
          CAST(l_quantity AS BIGINT) AS quantity,
          CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
          CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
          CAST(month(l_shipdate) AS BIGINT) AS ship_month
        FROM lineitem)"""

  private lazy val gbtMeltSql =
    """SELECT y, quantity, disc_pct, tax_pct, ship_month, f.feature,
          CASE f.feature WHEN 'quantity' THEN quantity
            WHEN 'disc_pct' THEN disc_pct WHEN 'tax_pct' THEN tax_pct
            ELSE ship_month END AS v
        FROM base, (VALUES ('quantity'), ('disc_pct'), ('tax_pct'),
          ('ship_month')) f(feature)"""

  /** Shared oracle for q_walk_cooc and its budget-gated twin: re-derives
    * the ranked adjacency and replays ALL FOUR hash-seeded hops hash-for-
    * hash, so a single divergent step anywhere in any walk mismatches.
    */
  private lazy val walkCoocOracleSql: String = {
    def hop(t: Int) =
      s"""s$t AS MATERIALIZED (SELECT w.walker, a.dst AS node
              FROM s${t - 1} w JOIN adj a ON a.src = w.node
                AND a.rn = ${graft.operators.PortableHash.duckSql(
                  s"'dw:' || CAST(walker AS VARCHAR) || ':$t'")} % a.deg)"""
    val hops = (1 to 4).map(hop).mkString(",\n              ")
    val posUnion = (1 to 4)
      .map(t => s"SELECT walker, node, $t AS pos FROM s$t")
      .mkString("\n                UNION ALL ")
    s"""WITH ebase AS (SELECT DISTINCT
                  CAST(o_custkey * 2 AS BIGINT) AS src,
                  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
              e AS (SELECT src, dst FROM ebase
                UNION SELECT dst, src FROM ebase),
              adj AS MATERIALIZED (SELECT src, dst,
                  CAST(row_number() OVER (PARTITION BY src ORDER BY dst)
                    AS BIGINT) - 1 AS rn,
                  CAST(count(*) OVER (PARTITION BY src) AS BIGINT) AS deg
                FROM e),
              s0 AS (SELECT DISTINCT src AS walker, src AS node FROM e),
              $hops,
              pos AS (SELECT walker, node, 0 AS pos FROM s0
                UNION ALL $posUnion),
              co AS (SELECT least(p1.node, p2.node) AS node_a,
                  greatest(p1.node, p2.node) AS node_b
                FROM pos p1 JOIN pos p2 ON p1.walker = p2.walker
                  AND p2.pos > p1.pos AND p2.pos - p1.pos <= 2
                  AND p1.node <> p2.node)
              SELECT node_a, node_b, CAST(count(*) AS BIGINT) AS n_cooc
              FROM co GROUP BY node_a, node_b
              ORDER BY n_cooc DESC, node_a, node_b LIMIT 20"""
  }

  /** Session-11 wave: split-conformal prediction intervals, off-policy
    * bandit evaluation (IPS/SNIPS), and A/B power analysis / minimum
    * detectable effect — the "before you ship the experiment" companions
    * to the session-9 readout statistics.
    */
  private lazy val session11: Seq[Q] = Seq(

    // Split-conformal regression interval: a fixed per-event-type "model"
    // predicts round(value); the calibration quarter (event_id % 4 == 0)
    // supplies q-hat = the ceil((n+1)·0.9)-th smallest |residual| via the
    // support-bounded order-statistic path (residuals live on the whole-
    // dollar grid, support ≤ ~800 at ANY corpus size because the value
    // range is fixed), and the held-out three quarters audit the ≥ 90%
    // finite-sample coverage guarantee. Integer arithmetic end-to-end
    // (k by integral div, q-hat an exact BIGINT order statistic); the
    // only doubles are the final coverage division.
    Q("q_conformal_split",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id").cast("long").as("id"),
            round(col("value")).cast("long").as("label"),
            when(col("event_type") === "click", 300L)
              .when(col("event_type") === "purchase", 250L)
              .when(col("event_type") === "view", 200L)
              .when(col("event_type") === "signup", 150L)
              .otherwise(100L).as("pred"))
        graft.operators.ModelEval.conformalSplit(
          ev.filter(pmod(col("id"), lit(4)) === 0),
          ev.filter(pmod(col("id"), lit(4)) =!= 0),
          col("pred"), col("label"), alphaNum = 1, alphaDen = 10)
      },
      Some("""WITH ev AS (SELECT CAST(event_id AS BIGINT) AS id,
                  CAST(round(value) AS BIGINT) AS label,
                  CASE event_type WHEN 'click' THEN 300
                    WHEN 'purchase' THEN 250 WHEN 'view' THEN 200
                    WHEN 'signup' THEN 150 ELSE 100 END AS pred
                FROM events),
              cal AS (SELECT abs(label - pred) AS r FROM ev WHERE id % 4 = 0),
              tst AS (SELECT abs(label - pred) AS r FROM ev WHERE id % 4 <> 0),
              byres AS (SELECT r, CAST(count(*) AS BIGINT) AS cnt
                FROM cal GROUP BY r),
              cum AS (SELECT r,
                  CAST(sum(cnt) OVER (ORDER BY r) AS BIGINT) AS cum
                FROM byres),
              tot AS (SELECT max(cum) AS n_cal,
                  ((max(cum) + 1) * 9 + 9) // 10 AS k FROM cum),
              q AS (SELECT t.n_cal, t.k, min(c.r) AS qhat
                FROM cum c JOIN tot t ON c.cum >= t.k GROUP BY t.n_cal, t.k),
              qq AS (SELECT t.n_cal, t.k, q.qhat
                FROM tot t LEFT JOIN q USING (n_cal, k))
              SELECT qq.n_cal, qq.k, qq.qhat,
                CAST(count(*) AS BIGINT) AS n_test,
                CASE WHEN qq.qhat IS NOT NULL THEN CAST(sum(
                  CASE WHEN tst.r <= qq.qhat THEN 1 ELSE 0 END) AS BIGINT)
                  END AS covered,
                CASE WHEN qq.qhat IS NOT NULL THEN round(sum(
                  CASE WHEN tst.r <= qq.qhat THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE), 6) END AS coverage,
                2 * qq.qhat AS width
              FROM tst, qq GROUP BY qq.n_cal, qq.k, qq.qhat""")),

    // Off-policy evaluation of a "boost clicks" target policy from the
    // events stream read as a logged bandit feed: logged propensities on
    // the 1/10 grid from the portable hash, target propensities keyed by
    // the action, cents rewards. IPS and SNIPS with cap = 5 — weights
    // materialized on the 1/10000 grid by floor division so every sum is
    // an exact BIGINT in both engines; `clipped` counts the capped tail
    // the estimator moved.
    Q("q_offpolicy_ips",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("event_id").cast("long").as("id"), col("event_type"),
            round(col("value") * 100).cast("long").as("r_u"))
          .withColumn("l_u", pmod(graft.operators.PortableHash.portable60(
            concat(lit("ips:"), col("id").cast("string"))), lit(9L)) + 1L)
          .withColumn("t_u",
            when(col("event_type") === "click", 6L)
              .when(col("event_type") === "purchase", 2L).otherwise(1L))
        graft.operators.ModelEval.offPolicyIpsSnips(ev,
          col("r_u"), col("l_u"), col("t_u"), rewardScale = 100L, cap = 5L)
      },
      Some(s"""WITH ev AS (SELECT CAST(event_id AS BIGINT) AS id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS r_u FROM events),
              w AS (SELECT r_u,
                  (CASE event_type WHEN 'click' THEN 6
                    WHEN 'purchase' THEN 2 ELSE 1 END * 10000)
                  // (${graft.operators.PortableHash.duckSql(
                    "'ips:' || CAST(id AS VARCHAR)")} % 9 + 1) AS raw_w
                FROM ev),
              c AS (SELECT r_u,
                  CASE WHEN raw_w > 50000 THEN 50000 ELSE raw_w END AS w_u,
                  CASE WHEN raw_w > 50000 THEN 1 ELSE 0 END AS is_clipped
                FROM w)
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(is_clipped) AS BIGINT) AS clipped,
                round(sum(w_u * r_u) / (count(*) * 10000.0 * 100.0), 6)
                  AS ips,
                CASE WHEN sum(w_u) > 0 THEN
                  round(sum(w_u * r_u) / (sum(w_u) * 100.0), 6)
                END AS snips
              FROM c""")),

    // A/B power analysis from observed order-value moments: the MDE the
    // current split could detect at alpha = 0.05 / power 0.80, and the
    // per-arm n a 5%-of-control-mean lift would need. Moments 6-dp
    // anchored per arm (the Welch/CUPED convention); z constants spliced.
    Q("q_ab_power_mde",
      (s, dir) => graft.operators.ModelEval.abPowerMde(
        t(s, dir, "orders"), col("o_totalprice"),
        pmod(col("o_orderkey"), lit(2))),
      Some {
        val zSum = graft.operators.ModelEval.ZAlpha05 +
          graft.operators.ModelEval.ZBeta80
        s"""WITH arms AS (SELECT o_orderkey % 2 AS g,
                  CAST(count(*) AS BIGINT) AS n,
                  round(avg(o_totalprice), 6) AS m,
                  round(var_samp(o_totalprice), 6) AS v
                FROM orders GROUP BY g),
              ab AS (SELECT
                  (SELECT n FROM arms WHERE g = 0) AS n_a,
                  (SELECT m FROM arms WHERE g = 0) AS mean_a,
                  (SELECT v FROM arms WHERE g = 0) AS var_a,
                  (SELECT n FROM arms WHERE g = 1) AS n_b,
                  (SELECT v FROM arms WHERE g = 1) AS var_b),
              d AS (SELECT *,
                  $zSum * sqrt(var_a / n_a + var_b / n_b) AS mde_abs,
                  0.05 * mean_a AS delta FROM ab)
              SELECT n_a, n_b, mean_a, round(mde_abs, 6) AS mde_abs,
                CASE WHEN mean_a <> 0 THEN round(mde_abs / mean_a, 6)
                  END AS mde_rel,
                CASE WHEN mean_a <> 0 THEN CAST(ceil(${zSum * zSum}
                  * (var_a + var_b) / (delta * delta)) AS BIGINT)
                  END AS n_per_arm
              FROM d"""
      }),

    // Jensen-Shannon divergence between the English and non-English
    // unigram distributions — the full-vocabulary drift measure beside
    // PSI (binned) and KS (CDF). Shuffles carry the (token, cnt_a,
    // cnt_b) vocabulary table only; per-term contributions are identical
    // IEEE expressions in both engines, reduce-order noise absorbed by
    // the 4-dp entropy-family grid.
    Q("q_js_divergence",
      (s, dir) => graft.operators.TextAnalysis.jsDivergence(
        t(s, dir, "documents"), col("text"),
        when(col("lang") === "en", 0L).otherwise(1L)),
      Some("""WITH tk AS (SELECT
                  CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS g,
                  unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                    AS tok
                FROM documents),
              counts AS (SELECT tok,
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS ca,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS cb
                FROM tk WHERE length(tok) > 0 GROUP BY tok),
              tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b,
                  CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS vocab_a,
                  CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS vocab_b,
                  CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS vocab_shared
                FROM counts),
              terms AS (SELECT n_a, n_b, vocab_a, vocab_b, vocab_shared,
                  ca / CAST(n_a AS DOUBLE) AS p,
                  cb / CAST(n_b AS DOUBLE) AS q
                FROM counts, tot)
              SELECT n_a, n_b, vocab_a, vocab_b, vocab_shared,
                CASE WHEN n_a > 0 AND n_b > 0 THEN round(sum(
                  CASE WHEN p > 0 THEN p * log2(2.0 * p / (p + q))
                    ELSE 0 END
                  + CASE WHEN q > 0 THEN q * log2(2.0 * q / (p + q))
                    ELSE 0 END) * 0.5, 4) END AS js_bits
              FROM terms GROUP BY 1, 2, 3, 4, 5""")),

    // Grid-bucketed 2-D radius self-join (the spatial-join shape): events
    // projected to an integer 5000×5000 unit grid, all pairs within
    // Euclidean distance 8 — EXACT via cell bucketing (side r) + 3×3
    // neighborhood equi-join + true integer dist² filter, never a
    // cartesian. The oracle is the INDEPENDENT naive algorithm (band
    // self-join + distance filter), so a bucketing bug (missed neighbor
    // cell, double-matched pair) hash-mismatches. The fixture densifies
    // quadratically with corpus growth (fixed domain), so the catalog
    // wires the candidate-volume pre-flight at 2e9 — at ×100 the entry
    // fails fast with the sized diagnosis instead of an n² pair blow-up.
    Q("q_grid_radius_join",
      (s, dir) => {
        val pts = t(s, dir, "events")
          .select(col("event_id").cast("long").as("id"),
            pmod(round(col("value") * 100).cast("long"), lit(5000L)).as("x"),
            pmod(graft.operators.PortableHash.portable60(
              concat(lit("gy:"), col("event_id").cast("string"))),
              lit(5000L)).as("y"))
        graft.operators.RangeJoin.radiusPairs(pts, col("id"), col("x"),
            col("y"), r = 8L, maxExpectedCandidates = Some(2000000000L))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH pts AS (SELECT CAST(event_id AS BIGINT) AS id,
                  CAST(round(value * 100) AS BIGINT) % 5000 AS x,
                  ${graft.operators.PortableHash.duckSql(
                    "'gy:' || CAST(event_id AS VARCHAR)")} % 5000 AS y
                FROM events)
              SELECT a.id AS id_a, b.id AS id_b,
                (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                  AS dist2
              FROM pts a JOIN pts b
                ON b.x BETWEEN a.x - 8 AND a.x + 8
                AND b.y BETWEEN a.y - 8 AND a.y + 8
                AND a.id < b.id
              WHERE (a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y) <= 64
              ORDER BY id_a, id_b""")),

    // Maximal Marginal Relevance re-rank of per-query ANN shortlists:
    // four literal query vectors (vec_id 0..3), candidates partitioned by
    // id % 4, top-20 shortlist by query-cosine, then greedy k = 5 at
    // lambda = 7/10 on the 1e-4 unit grid — exact BIGINT objective, min-id
    // tie-break. The oracle UNROLLS the greedy loop as a 5-step CTE chain
    // (the bradleyTerry/minhash splice convention), so a selection
    // divergence at ANY step hash-mismatches.
    Q("q_mmr_rerank",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id").cast("long").as("id"),
            graft.operators.Similarity.toDouble(col("embedding")).as("v"))
        val queries = emb.filter(col("id") <= 3)
          .select(col("id").as("qid"), col("v").as("qv"))
        val cand0 = emb.filter(col("id") >= 4)
          .join(broadcast(queries), pmod(col("id"), lit(4L)) === col("qid"))
          .select(col("qid"), col("id"),
            round(graft.operators.Similarity.cosine(col("v"), col("qv"))
              * 10000, 0).cast("long").as("rel_u"),
            col("v"))
        val wShort = Window.partitionBy("qid")
          .orderBy(col("rel_u").desc, col("id").asc)
        val short = cand0.withColumn("rn", row_number().over(wShort))
          .filter(col("rn") <= 20).drop("rn")
        graft.operators.Similarity.mmrRerank(short, col("qid"), col("id"),
            col("rel_u"), col("v"), k = 5)
          .orderBy("qid", "rank")
      },
      Some {
        val steps = (2 to 5).map { t =>
          s"""s$t AS (SELECT qid, CAST($t AS BIGINT) AS rank, id, rel_u,
                  max_sim_u
                FROM (SELECT c.qid, c.id, c.rel_u, m.max_sim_u,
                    row_number() OVER (PARTITION BY c.qid
                      ORDER BY 7 * c.rel_u - 3 * m.max_sim_u DESC, c.id)
                      AS rn
                  FROM short c
                  JOIN (SELECT p.qid, p.id_x AS id, max(p.sim_u)
                        AS max_sim_u
                      FROM pairs p JOIN sel${t - 1} s
                        ON p.qid = s.qid AND p.id_y = s.id
                      GROUP BY p.qid, p.id_x) m
                    ON m.qid = c.qid AND m.id = c.id
                  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s2
                    WHERE s2.qid = c.qid AND s2.id = c.id))
                WHERE rn = 1),
              sel$t AS (SELECT qid, id FROM sel${t - 1}
                UNION ALL SELECT qid, id FROM s$t)"""
        }.mkString(",\n              ")
        val unions = (1 to 5)
          .map(t => s"SELECT * FROM s$t").mkString(" UNION ALL ")
        s"""WITH emb AS (SELECT CAST(vec_id AS BIGINT) AS id,
                  CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              q AS (SELECT id AS qid, e AS qe FROM emb WHERE id <= 3),
              cand0 AS (SELECT q.qid, emb.id,
                  CAST(round(list_cosine_similarity(emb.e, q.qe) * 10000, 0)
                    AS BIGINT) AS rel_u, emb.e
                FROM emb JOIN q ON emb.id % 4 = q.qid WHERE emb.id >= 4),
              short AS MATERIALIZED (SELECT qid, id, rel_u, e
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY rel_u DESC, id) AS rn FROM cand0)
                WHERE rn <= 20),
              pairs AS MATERIALIZED (SELECT a.qid, a.id AS id_x,
                  b.id AS id_y,
                  CAST(round(list_cosine_similarity(a.e, b.e) * 10000, 0)
                    AS BIGINT) AS sim_u
                FROM short a JOIN short b
                  ON a.qid = b.qid AND a.id <> b.id),
              s1 AS (SELECT qid, CAST(1 AS BIGINT) AS rank, id, rel_u,
                  CAST(NULL AS BIGINT) AS max_sim_u
                FROM (SELECT *, row_number() OVER (PARTITION BY qid
                    ORDER BY rel_u DESC, id) AS rn FROM short)
                WHERE rn = 1),
              sel1 AS (SELECT qid, id FROM s1),
              $steps
              SELECT qid, rank, id, rel_u, max_sim_u FROM ($unions)
              ORDER BY qid, rank"""
      }),

    // Leave-one-out target encoding with m-estimate smoothing: order
    // priority encoded against the high-value flag. Output is the bounded
    // (category, label) support table — the encoding a trainer joins back
    // by (key, y); counts/sums exact BIGINTs, one gmean division.
    Q("q_target_encode",
      (s, dir) => graft.operators.FeatureEng.targetEncodeLoo(
        t(s, dir, "orders"), col("o_orderpriority"),
        (col("o_totalprice") > 150000).cast("long"), m = 20L),
      Some("""WITH base AS (SELECT o_orderpriority AS key,
                  CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
                FROM orders),
              pk AS (SELECT key, CAST(count(*) AS BIGINT) AS n_c,
                  CAST(sum(y) AS BIGINT) AS sum_c
                FROM base GROUP BY key),
              g AS (SELECT sum(y) / CAST(count(*) AS DOUBLE) AS gmean
                FROM base)
              SELECT b.key AS key, CAST(b.y AS BIGINT) AS y,
                CAST(count(*) AS BIGINT) AS n_rows,
                round((CAST(pk.sum_c - b.y AS DOUBLE) + 20 * g.gmean)
                  / (pk.n_c - 1 + 20), 6) AS enc
              FROM base b JOIN pk ON pk.key = b.key, g
              GROUP BY b.key, b.y, pk.n_c, pk.sum_c, g.gmean
              ORDER BY key, y""")),

    // Hashing-trick collision audit over three part categoricals into 32
    // buckets (brand x type x size >> 32 distinct features -> guaranteed
    // collisions): the pre-flight before committing to a hashed feature
    // width. Exact BIGINTs end-to-end; the bucket assignment is the
    // portable hash in both engines.
    Q("q_hash_features",
      (s, dir) => graft.operators.FeatureEng.hashFeatures(
        t(s, dir, "part"),
        Seq("p_brand", "p_type", "p_size"), nBuckets = 32L),
      Some(s"""WITH f AS (SELECT DISTINCT feat FROM (
                  SELECT 'p_brand=' || p_brand AS feat FROM part
                  UNION ALL SELECT 'p_type=' || p_type FROM part
                  UNION ALL SELECT 'p_size=' || CAST(p_size AS VARCHAR)
                    FROM part)
                WHERE feat IS NOT NULL),
              b AS (SELECT ${graft.operators.PortableHash.duckSql("feat")}
                  % 32 AS bucket, CAST(count(*) AS BIGINT) AS load
                FROM f GROUP BY 1)
              SELECT CAST(sum(load) AS BIGINT) AS n_features,
                CAST(count(*) AS BIGINT) AS n_buckets_used,
                CAST(sum(CASE WHEN load > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_collision_buckets,
                CAST(max(load) AS BIGINT) AS max_bucket_load
              FROM b""")),

    // Classical additive seasonal decomposition of the daily event-value
    // series (31 consecutive days): centered 7-point moving average
    // trend (exact BIGINT window sum, one division), per-phase seasonal
    // indices centered to sum 0, residuals. Edge rows keep NULL trend —
    // no padding lies. The corpus-sized pass is the daily groupBy; the
    // windows run on the bounded series (the Trend series contract).
    Q("q_seasonal_decompose",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("x"))
        graft.operators.Trend.seasonalDecompose(daily, col("day"), col("x"),
          period = 7)
      },
      Some("""WITH daily AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS x
                FROM events GROUP BY 1),
              ma AS (SELECT t, x, count(*) OVER w AS win_n,
                  CAST(sum(x) OVER w AS BIGINT) AS win_sum
                FROM daily WINDOW w AS (ORDER BY t
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              tr AS (SELECT t, x,
                  CASE WHEN win_n = 7
                    THEN CAST(win_sum AS DOUBLE) / 7 END AS trend,
                  t % 7 AS phase FROM ma),
              ph AS (SELECT phase, avg(x - trend) AS s_raw
                FROM tr WHERE trend IS NOT NULL GROUP BY phase),
              ctr AS (SELECT phase,
                  s_raw - (SELECT avg(s_raw) FROM ph) AS seasonal FROM ph)
              SELECT t, x, round(trend, 6) AS trend,
                round(seasonal, 6) AS seasonal,
                round(x - trend - seasonal, 6) AS resid
              FROM tr LEFT JOIN ctr USING (phase) ORDER BY t""")),

    // Lagged cross-correlation between the daily click-value and
    // purchase-value series at lags -3..3 — the lead/lag probe. The lag
    // fan-out is 7x the BOUNDED daily series, then one equi-join on the
    // shifted bucket; corr on the 4-dp corr-family grid.
    Q("q_xcorr_lagged",
      (s, dir) => {
        def daily(et: String, out: String) = t(s, dir, "events")
          .filter(col("event_type") === et)
          .groupBy(floor(unix_timestamp(col("ts")) / 86400L).cast("long")
            .as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).cast("double")
            .as(out))
        graft.operators.Trend.crossCorrelation(
          daily("click", "x"), daily("purchase", "y"),
          col("day"), col("x"), col("day"), col("y"), maxLag = 3)
      },
      Some("""WITH cl AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                    AS x
                FROM events WHERE event_type = 'click' GROUP BY 1),
              pu AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                    AS y
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
              lg AS (SELECT cl.x, CAST(l.lag AS BIGINT) AS lag,
                  cl.t + l.lag AS t_b
                FROM cl, (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
                  l(lag)),
              j AS (SELECT lag, x, y FROM lg JOIN pu ON pu.t = lg.t_b)
              SELECT lag, CAST(count(*) AS BIGINT) AS n,
                CASE WHEN count(*) >= 3 THEN round(corr(x, y), 4) END
                  AS xcorr
              FROM j GROUP BY lag ORDER BY lag""")),

    // q_fuzzy_linkage behind the candidate-volume pre-flight (ceiling
    // 1e8): the length+suffix blocking key is FIXED-width, so blocks grow
    // linearly with the registry and candidates quadratically — measured
    // 146.5 s isolated at ×100 (BENCH_SF10 round-10 addendum). The gate
    // costs two grouped counts; at oracle scale it passes and the result
    // is identical to the ungated entry, at ×100 it fails fast with the
    // sized diagnosis naming the lever (refine the blocking keys).
    Q("q_fuzzy_linkage_gated",
      (s, dir) => {
        val master = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_name").as("name"))
        val dirty = master.filter(pmod(col("id"), lit(7)) === 0)
          .withColumn("h",
            pmod(graft.operators.PortableHash.portable60(
              concat(lit("fz:"), col("id").cast("string"))), lit(26L))
              + 97L)
          .withColumn("name", concat(substring(col("name"), 1, 11),
            expr("chr(cast(h as int))"), substring(col("name"), 13, 6)))
          .select("id", "name")
        graft.operators.Linkage.bestMatch(dirty, master, Seq(
            n => length(n), n => substring(n, 16, 3)), maxDistance = 2,
            maxExpectedCandidates = Some(100000000L))
          .orderBy("id")
      },
      Some(s"""WITH master AS (SELECT CAST(c_custkey AS BIGINT) AS id,
                  c_name AS name FROM customer),
              dirty AS (SELECT id,
                  substr(name, 1, 11)
                    || chr(CAST(${graft.operators.PortableHash.duckSql(
                      "'fz:' || CAST(id AS VARCHAR)")} % 26 + 97 AS INT))
                    || substr(name, 13, 6) AS name
                FROM master WHERE id % 7 = 0),
              cand AS (SELECT d.id, d.name, m.id AS match_id,
                  m.name AS match_name,
                  CAST(levenshtein(d.name, m.name) AS BIGINT) AS dist
                FROM dirty d JOIN master m
                  ON length(d.name) = length(m.name)
                  AND substr(d.name, 16, 3) = substr(m.name, 16, 3)
                WHERE levenshtein(d.name, m.name) <= 2),
              rk AS (SELECT *,
                  row_number() OVER (PARTITION BY id
                    ORDER BY dist, match_id) AS rk,
                  CAST(count(*) OVER (PARTITION BY id) AS BIGINT)
                    AS n_candidates
                FROM cand)
              SELECT id, name, match_id, match_name, dist, n_candidates
              FROM rk WHERE rk = 1 ORDER BY id""")),

    // The SCALE-SAFE blocking for the same linkage problem: one more
    // suffix digit in the block key (substr 15,4 instead of 16,3 — still
    // outside the planted corruption at position 12) multiplies the block
    // count ~10x, which divides the candidate volume ~10x: the fixture's
    // measured x100 wall (146.5 s isolated, BENCH_SF10 addendum 7) drops
    // to the shared linear band. Identical match set: every true match
    // agrees on the wider key by construction.
    Q("q_fuzzy_linkage_fine",
      (s, dir) => {
        val master = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_name").as("name"))
        val dirty = master.filter(pmod(col("id"), lit(7)) === 0)
          .withColumn("h",
            pmod(graft.operators.PortableHash.portable60(
              concat(lit("fz:"), col("id").cast("string"))), lit(26L))
              + 97L)
          .withColumn("name", concat(substring(col("name"), 1, 11),
            expr("chr(cast(h as int))"), substring(col("name"), 13, 6)))
          .select("id", "name")
        graft.operators.Linkage.bestMatch(dirty, master, Seq(
            n => length(n), n => substring(n, 15, 4)), maxDistance = 2)
          .orderBy("id")
      },
      Some(s"""WITH master AS (SELECT CAST(c_custkey AS BIGINT) AS id,
                  c_name AS name FROM customer),
              dirty AS (SELECT id,
                  substr(name, 1, 11)
                    || chr(CAST(${graft.operators.PortableHash.duckSql(
                      "'fz:' || CAST(id AS VARCHAR)")} % 26 + 97 AS INT))
                    || substr(name, 13, 6) AS name
                FROM master WHERE id % 7 = 0),
              cand AS (SELECT d.id, d.name, m.id AS match_id,
                  m.name AS match_name,
                  CAST(levenshtein(d.name, m.name) AS BIGINT) AS dist
                FROM dirty d JOIN master m
                  ON length(d.name) = length(m.name)
                  AND substr(d.name, 15, 4) = substr(m.name, 15, 4)
                WHERE levenshtein(d.name, m.name) <= 2),
              rk AS (SELECT *,
                  row_number() OVER (PARTITION BY id
                    ORDER BY dist, match_id) AS rk,
                  CAST(count(*) OVER (PARTITION BY id) AS BIGINT)
                    AS n_candidates
                FROM cand)
              SELECT id, name, match_id, match_name, dist, n_candidates
              FROM rk WHERE rk = 1 ORDER BY id""")),

    // Quantile normalization of document length across languages: each
    // (lang, n_chars) maps to the POOLED type-1 quantile at its
    // within-group midrank — the cross-source distribution aligner.
    // ENTIRELY exact: midranks and the lookup comparison are
    // cross-multiplied BIGINTs, the normalized value is a pooled support
    // member; no doubles anywhere.
    Q("q_quantile_normalize",
      (s, dir) => graft.operators.FeatureEng.quantileNormalize(
        t(s, dir, "documents"), col("lang"), col("n_chars")),
      Some("""WITH sup AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM documents GROUP BY 1, 2),
              pg AS (SELECT g, v, cnt,
                  CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v)
                    AS BIGINT) AS cum_g,
                  CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n_g
                FROM sup),
              pg2 AS (SELECT *, 2 * cum_g - cnt AS p_num FROM pg),
              pooled AS (SELECT v AS pv, CAST(sum(cnt) AS BIGINT) AS pcnt
                FROM sup GROUP BY 1),
              pc AS (SELECT pv,
                  CAST(sum(pcnt) OVER (ORDER BY pv) AS BIGINT) AS cum_pool
                FROM pooled),
              tot AS (SELECT max(cum_pool) AS n_all FROM pc)
              SELECT g, v, cnt, min(pv) AS norm_value
              FROM pg2, pc, tot
              WHERE 2 * cum_pool * n_g >= p_num * n_all
              GROUP BY g, v, cnt ORDER BY g, v""")),

    // Huber-IRLS robust regression on a planted line (y = 2x + small tax
    // noise) with ~1.1% gross outliers (+500 on orderkey % 89): two
    // reweighted rounds after the OLS seed. The oracle unrolls seed +
    // both rounds as chained CTEs (the logisticGD convention) — weighted
    // Gram sums 6-dp anchored, Cramer solves on the 7-dp grid — so a
    // divergence in ANY round's solve hash-mismatches. RegressionSpec
    // asserts the robustness property (Huber slope stays on the planted
    // line while the OLS seed is dragged).
    Q("q_huber_irls",
      (s, dir) => {
        val base = t(s, dir, "lineitem").select(
          col("l_quantity").cast("double").as("x"),
          (col("l_quantity") * 2 + col("l_tax") * 100
            + when(pmod(col("l_orderkey"), lit(89)) === 0, 500.0)
              .otherwise(0.0)).cast("double").as("y"))
        graft.operators.Regression.huberIrls(base, "x", "y",
            delta = 10.0, rounds = 2)
          .orderBy("term")
      },
      Some {
        def solveCte(from: String) =
          s"""(SELECT round((sy * sxx - sx * sxy)
                / (sw * sxx - sx * sx), 7) AS b,
              round((sw * sxy - sx * sy)
                / (sw * sxx - sx * sx), 7) AS m FROM $from)"""
        def roundCte(w: String) =
          s"""(SELECT round(sum(om), 6) AS sw, round(sum(om * x), 6) AS sx,
              round(sum(om * x * x), 6) AS sxx,
              round(sum(om * y), 6) AS sy,
              round(sum(om * x * y), 6) AS sxy
            FROM (SELECT x, y,
                CASE WHEN abs(y - ($w.b + $w.m * x)) <= 10.0 THEN 1.0
                  ELSE 10.0 / abs(y - ($w.b + $w.m * x)) END AS om
              FROM base, $w))"""
        s"""WITH base AS MATERIALIZED (SELECT
                  CAST(l_quantity AS DOUBLE) AS x,
                  CAST(l_quantity * 2 + l_tax * 100
                    + CASE WHEN l_orderkey % 89 = 0 THEN 500.0
                      ELSE 0.0 END AS DOUBLE) AS y
                FROM lineitem),
              s0 AS (SELECT CAST(count(*) AS DOUBLE) AS sw,
                  round(sum(x), 6) AS sx, round(sum(x * x), 6) AS sxx,
                  round(sum(y), 6) AS sy, round(sum(x * y), 6) AS sxy
                FROM base),
              w0 AS ${solveCte("s0")},
              r1 AS ${roundCte("w0")},
              w1 AS ${solveCte("r1")},
              r2 AS ${roundCte("w1")},
              w2 AS ${solveCte("r2")},
              fin AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  round(avg(CASE WHEN abs(y - (w2.b + w2.m * x)) > 10.0
                    THEN 1.0 ELSE 0.0 END), 6) AS frac
                FROM base, w2)
              SELECT 'bias' AS term, w2.b AS weight,
                fin.frac AS frac_downweighted, fin.n AS n FROM w2, fin
              UNION ALL
              SELECT 'x', w2.m, fin.frac, fin.n FROM w2, fin
              ORDER BY term"""
      }),

    // Second-order Markov memory test over per-user event trigrams: does
    // predicting the next event need TWO steps of history? lift =
    // P(c|ab) / P(c|b) with every probability an exact-integer ratio
    // over the SAME trigram population (marginals are sums of trigram
    // counts, so the comparison is self-consistent by construction).
    // One user-keyed window builds trigrams, everything after rides the
    // bounded (type³) support. Top-10 by support, deterministic order.
    Q("q_trigram_lift",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val tri = t(s, dir, "events")
          .withColumn("b", lead("event_type", 1).over(w))
          .withColumn("c", lead("event_type", 2).over(w))
          .filter(col("c").isNotNull)
          .groupBy(col("event_type").as("a"), col("b"), col("c"))
          .agg(count(lit(1)).as("n_abc"))
        val ab = tri.groupBy("a", "b").agg(sum("n_abc").as("n_ab"))
        val bc = tri.groupBy("b", "c").agg(sum("n_abc").as("n_bc"))
        val bTot = tri.groupBy("b").agg(sum("n_abc").as("n_b"))
        tri.join(ab, Seq("a", "b")).join(bc, Seq("b", "c"))
          .join(bTot, Seq("b"))
          .select(col("a"), col("b"), col("c"), col("n_abc"),
            round(col("n_abc").cast("double") / col("n_ab"), 4)
              .as("p_c_given_ab"),
            round(col("n_bc").cast("double") / col("n_b"), 4)
              .as("p_c_given_b"),
            round((col("n_abc") * col("n_b")).cast("double")
              / (col("n_ab") * col("n_bc")), 4).as("lift"))
          .orderBy(col("n_abc").desc, col("a"), col("b"), col("c"))
          .limit(10)
      },
      Some("""WITH seq AS (SELECT user_id, event_type AS a,
                  lead(event_type, 1) OVER w AS b,
                  lead(event_type, 2) OVER w AS c
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              tri AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS n_abc
                FROM seq WHERE c IS NOT NULL GROUP BY a, b, c),
              ab AS (SELECT a, b, CAST(sum(n_abc) AS BIGINT) AS n_ab
                FROM tri GROUP BY a, b),
              bc AS (SELECT b, c, CAST(sum(n_abc) AS BIGINT) AS n_bc
                FROM tri GROUP BY b, c),
              bt AS (SELECT b, CAST(sum(n_abc) AS BIGINT) AS n_b
                FROM tri GROUP BY b)
              SELECT tri.a, tri.b, tri.c, n_abc,
                round(n_abc / CAST(n_ab AS DOUBLE), 4) AS p_c_given_ab,
                round(n_bc / CAST(n_b AS DOUBLE), 4) AS p_c_given_b,
                round((n_abc * n_b) / CAST(n_ab * n_bc AS DOUBLE), 4)
                  AS lift
              FROM tri JOIN ab USING (a, b) JOIN bc USING (b, c)
                JOIN bt USING (b)
              ORDER BY n_abc DESC, a, b, c LIMIT 10""")),

    // Always-valid inference: the mixture SPRT (Johari et al. 2017, the
    // "peeking-proof" p-value production experimentation platforms run
    // in place of fixed-horizon tests). For the two-arm mean difference
    // theta = m_b - m_a with estimator variance V = v_a/n_a + v_b/n_b
    // and the normal mixture prior tau^2:
    //
    //   Lambda = sqrt(V/(V+tau^2)) * exp(theta^2 * tau^2 / (2V(V+tau^2)))
    //   p      = min(1, 1/Lambda)       (valid at EVERY interim look)
    //
    // Same anchored-moments envelope as q_welch_ttest (one groupBy pass,
    // 6-dp moments); tau^2 = 100 spliced into both engines; explicit
    // products, never pow; V = 0 guarded to NULL in both. exp's libm
    // last-ulp freedom sits ~1e-16 against the 6-dp output grid.
    Q("q_msprt_always_valid",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(round(sum("value"), 6).as("y"))
          .withColumn("g", pmod(col("user_id"), lit(2)))
        val st = per.groupBy("g")
          .agg(count(lit(1)).as("n"), round(avg("y"), 6).as("m"),
            round(var_samp("y"), 6).as("v"))
        val a = st.filter(col("g") === 0)
          .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
        val b = st.filter(col("g") === 1)
          .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
        val tau2 = 100.0
        a.crossJoin(broadcast(b))
          .withColumn("vv", col("v_a") / col("n_a") + col("v_b") / col("n_b"))
          .withColumn("theta", col("m_b") - col("m_a"))
          .withColumn("lam", when(col("vv") > 0,
            sqrt(col("vv") / (col("vv") + tau2)) *
              exp(col("theta") * col("theta") * tau2
                / (lit(2.0) * col("vv") * (col("vv") + tau2)))))
          .select(col("n_a"), col("n_b"), round(col("theta"), 6).as("theta"),
            round(col("vv"), 6).as("v"),
            round(col("lam"), 6).as("lambda"),
            round(least(lit(1.0), lit(1.0) / col("lam")), 6).as("p_always"),
            (round(least(lit(1.0), lit(1.0) / col("lam")), 6) < 0.05)
              .as("significant"))
      },
      Some("""WITH per AS (SELECT user_id, round(sum(value), 6) AS y,
                  user_id % 2 AS g
                FROM events GROUP BY user_id),
              st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  round(avg(y), 6) AS m, round(var_samp(y), 6) AS v
                FROM per GROUP BY g),
              ab AS (SELECT
                  (SELECT n FROM st WHERE g = 0) AS n_a,
                  (SELECT m FROM st WHERE g = 0) AS m_a,
                  (SELECT v FROM st WHERE g = 0) AS v_a,
                  (SELECT n FROM st WHERE g = 1) AS n_b,
                  (SELECT m FROM st WHERE g = 1) AS m_b,
                  (SELECT v FROM st WHERE g = 1) AS v_b),
              d AS (SELECT *, v_a / n_a + v_b / n_b AS vv,
                  m_b - m_a AS theta FROM ab),
              e AS (SELECT *, CASE WHEN vv > 0 THEN
                  sqrt(vv / (vv + 100.0)) * exp(theta * theta * 100.0
                    / (2.0 * vv * (vv + 100.0))) END AS lam FROM d)
              SELECT n_a, n_b, round(theta, 6) AS theta, round(vv, 6) AS v,
                round(lam, 6) AS lambda,
                round(least(1.0, 1.0 / lam), 6) AS p_always,
                (round(least(1.0, 1.0 / lam), 6) < 0.05) AS significant
              FROM e""")),

    // Rank-1 ALS matrix factorization over the (user, event_type,
    // total-value) ratings table: two alternating closed-form rounds
    // from the deterministic v = 1 init (round 1's u = user mean), each
    // half-round one entity-keyed join + map-side-combined groupBy,
    // factors on the 6-dp grid, state lineage-cut per round. The oracle
    // unrolls u1 -> v1 -> u2 -> v2 -> RMSE as chained CTEs.
    Q("q_als_rank1",
      (s, dir) => {
        val ratings = t(s, dir, "events")
          .groupBy(col("user_id").as("u"), col("event_type").as("i"))
          .agg(round(sum("value"), 6).as("r"))
        graft.operators.Recsys.alsRank1(ratings, col("u"), col("i"),
          col("r"), rounds = 2)
      },
      Some("""WITH r AS MATERIALIZED (SELECT user_id AS u_id,
                  event_type AS i_id, round(sum(value), 6) AS r
                FROM events GROUP BY 1, 2),
              v0 AS (SELECT DISTINCT i_id, 1.0 AS v FROM r),
              u1 AS (SELECT u_id, round(sum(r * v) / sum(v * v), 6) AS u
                FROM r JOIN v0 USING (i_id) GROUP BY u_id),
              v1 AS (SELECT i_id, round(sum(r * u) / sum(u * u), 6) AS v
                FROM r JOIN u1 USING (u_id) GROUP BY i_id),
              u2 AS (SELECT u_id, round(sum(r * v) / sum(v * v), 6) AS u
                FROM r JOIN v1 USING (i_id) GROUP BY u_id),
              v2 AS (SELECT i_id, CAST(count(*) AS BIGINT) AS n_ratings,
                  round(sum(r * u) / sum(u * u), 6) AS v
                FROM r JOIN u2 USING (u_id) GROUP BY i_id),
              fit AS (SELECT round(sqrt(avg((r.r - u2.u * v2.v)
                    * (r.r - u2.u * v2.v))), 6) AS rmse
                FROM r JOIN u2 USING (u_id) JOIN v2 USING (i_id))
              SELECT i_id AS item, v, n_ratings, rmse
              FROM v2, fit ORDER BY item""")),

    // Pareto skyline over (length, lexical richness) — the multi-objective
    // data-selection frontier: documents no other document weakly
    // dominates on BOTH axes. Exact-integer shape: fold to the bounded
    // x-support first (max y per x), then one strictly-preceding running
    // max over distinct x descending — never an n² dominance join.
    Q("q_pareto_skyline",
      (s, dir) => {
        val m = t(s, dir, "documents").select(
          col("n_chars").cast("long").as("x"),
          size(array_distinct(graft.operators.TextAnalysis
            .wsTokens(lower(col("text"))))).cast("long").as("y"))
        val byX = m.groupBy("x").agg(max("y").as("y_max"))
        val w = Window.orderBy(col("x").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        byX.withColumn("prev_max", max("y_max").over(w))
          .filter(col("prev_max").isNull || col("y_max") > col("prev_max"))
          .select(col("x").as("n_chars"), col("y_max").as("distinct_tokens"))
          .orderBy("n_chars")
      },
      Some("""WITH m AS (SELECT CAST(n_chars AS BIGINT) AS x,
                  CAST(len(list_distinct(regexp_split_to_array(
                    trim(lower(text)), '\s+'))) AS BIGINT) AS y
                FROM documents),
              byx AS (SELECT x, max(y) AS y_max FROM m GROUP BY x),
              sk AS (SELECT x, y_max, max(y_max) OVER (ORDER BY x DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_max
                FROM byx)
              SELECT x AS n_chars, y_max AS distinct_tokens
              FROM sk WHERE prev_max IS NULL OR y_max > prev_max
              ORDER BY n_chars""")),

    // Per-group top-p (nucleus) selection — the data-mixing shape: within
    // each language, keep the highest-token-count documents until their
    // cumulative token mass reaches 90% of the group's total (crossing
    // doc included). ENTIRELY exact: the keep predicate is the
    // cross-multiplied integer 10·cum_before < 9·total; ordering ties
    // break on doc_id.
    Q("q_nucleus_select",
      (s, dir) => {
        val m = t(s, dir, "documents").select(col("lang"), col("doc_id"),
          size(graft.operators.TextAnalysis.wsTokens(col("text")))
            .cast("long").as("w"))
        val win = Window.partitionBy("lang")
          .orderBy(col("w").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = Window.partitionBy("lang")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        m.withColumn("cum", sum("w").over(win))
          .withColumn("total", sum("w").over(tot))
          .withColumn("n_docs", count(lit(1)).over(tot))
          .filter(lit(10L) * (col("cum") - col("w")) < lit(9L) * col("total"))
          .groupBy("lang")
          .agg(first("n_docs").as("n_docs"), count(lit(1)).as("n_kept"),
            sum("w").as("tokens_kept"), first("total").as("tokens_total"))
          .withColumn("share_kept",
            round(col("tokens_kept").cast("double") / col("tokens_total"), 6))
          .orderBy("lang")
      },
      Some("""WITH m AS (SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT) AS w
                FROM documents),
              c AS (SELECT lang, doc_id, w,
                  CAST(sum(w) OVER (PARTITION BY lang
                    ORDER BY w DESC, doc_id) AS BIGINT) AS cum,
                  CAST(sum(w) OVER (PARTITION BY lang) AS BIGINT) AS total,
                  CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                    AS n_docs
                FROM m)
              SELECT lang, any_value(n_docs) AS n_docs,
                CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(w) AS BIGINT) AS tokens_kept,
                any_value(total) AS tokens_total,
                round(sum(w) / CAST(any_value(total) AS DOUBLE), 6)
                  AS share_kept
              FROM c WHERE 10 * (cum - w) < 9 * total
              GROUP BY lang ORDER BY lang""")),

    // DeepWalk corpus prep on the bidirectional trade graph: one
    // hash-seeded deterministic walk per node (4 hops), skip-gram
    // co-occurrence within a 2-position window, top-20 pairs. The oracle
    // re-derives the ranked adjacency and replays ALL FOUR hops hash-for-
    // hash, so a single divergent step anywhere in any walk mismatches.
    Q("q_walk_cooc",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.walkCooccurrence(edges, steps = 4,
          window = 2, topK = 20, seed = "dw")
      },
      Some(walkCoocOracleSql)),

    // the budget-gated twin (the q_pagerank_gated convention): identical
    // walk corpus, but the (steps+2)x|edges| adjacency-build volume is
    // priced against an explicit ceiling BEFORE any scan — at x1000 the
    // same call with a production ceiling fails in milliseconds with the
    // sized diagnosis instead of minutes into the single-host edge build.
    // estimatedEdges = 2*|lineitem| (bidirectional trade graph) prices
    // the gate from table stats without counting the distinct edge set.
    Q("q_walk_cooc_gated",
      (s, dir) => {
        val liT = t(s, dir, "lineitem")
        val li = liT.select(col("l_orderkey"), col("l_suppkey"))
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        val edges = pairs.unionByName(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.GraphRank.walkCooccurrence(edges, steps = 4,
          window = 2, topK = 20, seed = "dw",
          maxEdgeScanRows = 3e9, estimatedEdges = Some(2L * liT.count()))
      },
      Some(walkCoocOracleSql)),

    // Gini concentration of per-user total value — the inequality audit
    // ("is 1% of accounts 90% of the volume") in the grouped-Lorenz form
    //   G = 1 − Σ_k n_k·(2·cumBefore_k + s_k) / (n·total)
    // over the DISTINCT per-user-total support in value order — exact
    // trapezoid arithmetic (tie-correct by construction), one division at
    // the end. The Lorenz terms scale ~n_k·total, so the per-row product
    // and its sum run in decimal(38,0) (the house Dec convention): Spark's
    // BIGINT sum would wrap silently at large corpora while DuckDB
    // promotes to HUGEINT — a cross-engine divergence decimal removes.
    // Two map-side-combined aggregates total.
    Q("q_gini_concentration",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val byV = per.groupBy("v").agg(count(lit(1)).as("nk"))
          .withColumn("sk", col("v") * col("nk"))
        val w = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dec = "decimal(38,0)"
        byV
          .withColumn("cum_before", sum("sk").over(w) - col("sk"))
          .agg(sum("nk").as("n"), sum("sk").as("total"),
            sum(col("nk").cast(dec)
                * (lit(2L).cast(dec) * col("cum_before").cast(dec)
                  + col("sk").cast(dec)))
              .as("lorenz2"))
          .select(col("n"), col("total"),
            round(lit(1.0) - col("lorenz2").cast("double")
              / (col("n").cast("double") * col("total").cast("double")),
              6).as("gini"))
      },
      Some("""WITH per AS (SELECT user_id,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS v
                FROM events GROUP BY user_id),
              byv AS (SELECT v, CAST(count(*) AS BIGINT) AS nk,
                  CAST(v * count(*) AS BIGINT) AS sk
                FROM per GROUP BY v),
              c AS (SELECT nk, sk,
                  CAST(sum(sk) OVER (ORDER BY v) AS BIGINT) - sk
                    AS cum_before
                FROM byv)
              SELECT CAST(sum(nk) AS BIGINT) AS n,
                CAST(sum(sk) AS BIGINT) AS total,
                round(1.0 - sum(CAST(nk AS DECIMAL(38,0))
                    * (2 * CAST(cum_before AS DECIMAL(38,0)) + sk))
                  / (CAST(sum(nk) AS DOUBLE) * sum(sk)), 6) AS gini
              FROM c""")),

    // Item-item collaborative filtering on binary basket vectors: cosine
    // sim(i, j) = cooc(i, j) / sqrt(n_i · n_j) over order baskets of part
    // brands — the classic "customers who bought X" precompute. Posting
    // self-join per basket bounded by distinct brands per order; counts
    // exact BIGINTs, one sqrt division on the 6-dp grid; top-15 pairs.
    Q("q_item_cf",
      (s, dir) => {
        val baskets = t(s, dir, "lineitem")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
          .distinct()
        val ni = baskets.groupBy("item").agg(count(lit(1)).as("n_item"))
        val co = baskets.join(
            baskets.select(col("ok"), col("item").as("item_b")), Seq("ok"))
          .filter(col("item") < col("item_b"))
          .groupBy(col("item").as("item_a"), col("item_b"))
          .agg(count(lit(1)).as("cooc"))
        co.join(ni.select(col("item").as("item_a"), col("n_item").as("n_a")),
            Seq("item_a"))
          .join(ni.select(col("item").as("item_b"), col("n_item").as("n_b")),
            Seq("item_b"))
          .select(col("item_a"), col("item_b"), col("cooc"), col("n_a"),
            col("n_b"),
            round(col("cooc").cast("double")
              / sqrt((col("n_a") * col("n_b")).cast("double")), 6)
              .as("cosine"))
          .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
          .limit(15)
      },
      Some("""WITH baskets AS (SELECT DISTINCT
                  CAST(l_orderkey AS BIGINT) AS ok, p_brand AS item
                FROM lineitem JOIN part ON l_partkey = p_partkey),
              ni AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
                FROM baskets GROUP BY item),
              co AS (SELECT a.item AS item_a, b.item AS item_b,
                  CAST(count(*) AS BIGINT) AS cooc
                FROM baskets a JOIN baskets b
                  ON a.ok = b.ok AND a.item < b.item
                GROUP BY a.item, b.item)
              SELECT item_a, item_b, cooc,
                na.n_item AS n_a, nb.n_item AS n_b,
                round(cooc / sqrt(CAST(na.n_item * nb.n_item AS DOUBLE)), 6)
                  AS cosine
              FROM co
                JOIN ni na ON na.item = item_a
                JOIN ni nb ON nb.item = item_b
              ORDER BY cosine DESC, item_a, item_b LIMIT 15""")),

    // Difference-in-differences with unit fixed effects: per-user pre/post
    // value sums split at the corpus time midpoint (the CUPED split), the
    // per-user difference d = post - pre, and DiD = mean(d | treated) -
    // mean(d | control) with the two-sample SE over d — the paired form
    // that absorbs user-level heterogeneity by construction. Anchored
    // moments convention; |t| > 1.96 large-sample gate stated in-band.
    Q("q_diff_in_diff",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("sec", unix_timestamp(col("ts")))
        val mid = broadcast(ev.agg(
          ((min("sec") + max("sec")) / lit(2L)).cast("long").as("mid")))
        val byUser = ev.crossJoin(mid)
          .groupBy("user_id")
          .agg(round(coalesce(
              sum(when(col("sec") <= col("mid"), col("value"))), lit(0.0)),
              6).as("pre"),
            round(coalesce(
              sum(when(col("sec") > col("mid"), col("value"))), lit(0.0)),
              6).as("post"))
          .withColumn("d", round(col("post") - col("pre"), 6))
          .withColumn("g", pmod(col("user_id"), lit(2)))
        val st = byUser.groupBy("g")
          .agg(count(lit(1)).as("n"), round(avg("d"), 6).as("m"),
            round(var_samp("d"), 6).as("v"))
        val c = st.filter(col("g") === 0)
          .select(col("n").as("n_c"), col("m").as("m_c"), col("v").as("v_c"))
        val tr = st.filter(col("g") === 1)
          .select(col("n").as("n_t"), col("m").as("m_t"), col("v").as("v_t"))
        tr.crossJoin(broadcast(c))
          .withColumn("did", round(col("m_t") - col("m_c"), 6))
          .withColumn("se",
            sqrt(col("v_t") / col("n_t") + col("v_c") / col("n_c")))
          .select(col("n_t"), col("n_c"), col("m_t"), col("m_c"),
            col("did"), round(col("se"), 6).as("se"),
            when(col("se") > 0, round(col("did") / col("se"), 6))
              .as("t_stat"),
            (abs(when(col("se") > 0,
              round(col("did") / col("se"), 6))) > 1.96).as("significant"))
      },
      Some("""WITH se AS (SELECT user_id, value,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
              md AS (SELECT (min(sec) + max(sec)) // 2 AS mid FROM se),
              bu AS (SELECT user_id,
                  round(coalesce(sum(CASE WHEN sec <= mid THEN value END),
                    0.0), 6) AS pre,
                  round(coalesce(sum(CASE WHEN sec > mid THEN value END),
                    0.0), 6) AS post
                FROM se, md GROUP BY user_id),
              du AS (SELECT user_id % 2 AS g,
                  round(post - pre, 6) AS d FROM bu),
              st AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
                  round(avg(d), 6) AS m, round(var_samp(d), 6) AS v
                FROM du GROUP BY g),
              ab AS (SELECT
                  (SELECT n FROM st WHERE g = 1) AS n_t,
                  (SELECT n FROM st WHERE g = 0) AS n_c,
                  (SELECT m FROM st WHERE g = 1) AS m_t,
                  (SELECT m FROM st WHERE g = 0) AS m_c,
                  (SELECT v FROM st WHERE g = 1) AS v_t,
                  (SELECT v FROM st WHERE g = 0) AS v_c),
              d2 AS (SELECT *, round(m_t - m_c, 6) AS did,
                  sqrt(v_t / n_t + v_c / n_c) AS se_raw FROM ab)
              SELECT n_t, n_c, m_t, m_c, did, round(se_raw, 6) AS se,
                CASE WHEN se_raw > 0 THEN round(did / se_raw, 6) END
                  AS t_stat,
                (abs(CASE WHEN se_raw > 0 THEN round(did / se_raw, 6) END)
                  > 1.96) AS significant
              FROM d2""")),

    // Referential-integrity audit over the warehouse's FK edges: orphan
    // child keys per edge via left-anti joins against the DISTINCT parent
    // key set. Round-11 shape: the child folds to its (key, multiplicity)
    // support FIRST — groupBy(k).count with map-side combine collapses
    // the 600M-row key stream to its distinct support BEFORE anything
    // shuffles, the anti-join then REUSES the aggregate's hash
    // partitioning (EnsureRequirements sees the child side already
    // distributed by k — only the parent support moves), and both
    // n_child and n_orphans are sum(cnt) over the support, so each edge
    // scans its child exactly ONCE (the old shape scanned it twice: a
    // count pass + a raw-key anti-join shuffle). NO broadcast hint —
    // a fact-sized parent like orders must be allowed to shuffle; stats
    // and AQE pick broadcast for the true dims on their own. (The bloom
    // lever the r10 verdict named is semantically unusable here: a scan-
    // level bloom keep-filter on an ANTI join's probe side would drop
    // false-positive orphans — blooms have no false negatives, not no
    // false positives — which is exactly why Spark's InjectRuntimeFilter
    // only fires on inner/semi shapes. See BENCH_SF10 round-11 addendum.)
    Q("q_fk_integrity",
      (s, dir) => {
        def edge(name: String, child: DataFrame,
            fk: org.apache.spark.sql.Column, parent: DataFrame,
            pk: org.apache.spark.sql.Column) = {
          val support = child.select(fk.cast("long").as("k"))
            .groupBy("k").agg(count(lit(1)).as("cnt"))
          val orphans = support
            .join(parent.select(pk.cast("long").as("k")).distinct(),
              Seq("k"), "left_anti")
          // n_child from a separate count pass, NOT sum over `support`:
          // the count is a shuffle-free single-column scan, while a
          // second consumer of `support` would re-run the whole aggregate
          child.agg(count(lit(1)).as("n_child")).crossJoin(
            broadcast(orphans.agg(
              coalesce(sum("cnt"), lit(0L)).as("n_orphans"))))
            .select(lit(name).as("fk_edge"), col("n_child"),
              col("n_orphans"),
              round(col("n_orphans").cast("double") / col("n_child"), 6)
                .as("orphan_rate"))
        }
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        edge("lineitem.orderkey->orders", li, col("l_orderkey"),
            o, col("o_orderkey"))
          .unionByName(edge("orders.custkey->customer", o, col("o_custkey"),
            t(s, dir, "customer"), col("c_custkey")))
          .unionByName(edge("lineitem.partkey->part", li, col("l_partkey"),
            t(s, dir, "part"), col("p_partkey")))
          .unionByName(edge("lineitem.suppkey->supplier", li,
            col("l_suppkey"), t(s, dir, "supplier"), col("s_suppkey")))
          .orderBy("fk_edge")
      },
      Some {
        def one(name: String, child: String, fk: String, parent: String,
            pk: String) =
          s"""SELECT '$name' AS fk_edge,
              (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_child,
              (SELECT CAST(count(*) AS BIGINT) FROM $child
                WHERE $fk NOT IN (SELECT DISTINCT $pk FROM $parent))
                AS n_orphans,
              round((SELECT count(*) FROM $child
                  WHERE $fk NOT IN (SELECT DISTINCT $pk FROM $parent))
                / CAST((SELECT count(*) FROM $child) AS DOUBLE), 6)
                AS orphan_rate"""
        Seq(
          one("lineitem.orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          one("orders.custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          one("lineitem.partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          one("lineitem.suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"))
          .mkString("SELECT * FROM (", " UNION ALL ",
            ") ORDER BY fk_edge")
      }),

    // Benford first-digit audit of order totals — the fraud / synthetic-
    // data screen: observed first-significant-digit shares vs Benford's
    // log10(1 + 1/d), chi-squared GOF at 8 dof (critical 15.507 spliced).
    // Digit extraction is STRING-exact (first char of the integer cents),
    // expected shares are the same Scala-printed literals in both
    // engines. The synthetic fixture rightly FLAGS (uniform-ish totals
    // are not Benford) — the Zipf-audit precedent.
    Q("q_benford_digits",
      (s, dir) => {
        val digits = t(s, dir, "orders")
          .select(substring(round(col("o_totalprice") * 100).cast("long")
            .cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = broadcast(digits.agg(sum("n").as("n_all")))
        val expected = (1 to 9).map(d =>
          d.toLong -> math.log10(1.0 + 1.0 / d))
        val expCol = expected.tail.foldLeft(
          when(col("digit") === expected.head._1, expected.head._2)) {
          case (acc, (d, p)) => acc.when(col("digit") === d, p)
        }
        digits.crossJoin(tot)
          .withColumn("share", round(col("n").cast("double") / col("n_all"), 6))
          .withColumn("benford", round(expCol, 6))
          .withColumn("chi2_term",
            (col("n") - expCol * col("n_all"))
              * (col("n") - expCol * col("n_all"))
              / (expCol * col("n_all")))
          .groupBy()
          .agg(sum("n").as("n"), round(sum("chi2_term"), 4).as("chi2"))
          .select(col("n"), col("chi2"),
            (col("chi2") > 15.507).as("not_benford"))
      },
      Some {
        val cases = (1 to 9).map(d =>
          s"WHEN digit = $d THEN ${math.log10(1.0 + 1.0 / d)}")
          .mkString(" ")
        s"""WITH digits AS (SELECT CAST(substr(CAST(CAST(round(
                  o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit,
                CAST(count(*) AS BIGINT) AS n
              FROM orders GROUP BY 1),
              tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM digits),
              terms AS (SELECT n, n_all,
                  CAST(CASE $cases END AS DOUBLE) AS p FROM digits, tot)
              SELECT CAST(sum(n) AS BIGINT) AS n,
                round(sum((n - p * n_all) * (n - p * n_all)
                  / (p * n_all)), 4) AS chi2,
                (round(sum((n - p * n_all) * (n - p * n_all)
                  / (p * n_all)), 4) > 15.507) AS not_benford
              FROM terms"""
      }),

    // Eighth driver-gated streaming pattern: exactly-once threshold
    // alerting via flatMapGroupsWithState — emit each user ONCE, the
    // first time their cumulative count reaches the threshold (the fraud
    // velocity-check shape). The emitted SET is micro-batch-split
    // independent (users whose total reaches 70), which is exactly what
    // the batch oracle computes; the crossing-time count is split-
    // dependent and stays in state, never emitted.
    Q("q_stream_threshold_alert",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.loadEventsStream(s, dir)
          .withColumn("ts", date_trunc("second", col("ts")))
          .select("event_id", "ts", "user_id", "event_type", "value")
          .as[graft.streaming.EventStreams.Event]
        val alerts = graft.streaming.EventStreams.thresholdAlerts(
          ev, minEvents = 70L)
        val qname = "graft_stream_alert_" + math.abs(dir.hashCode).toString
        s.catalog.dropTempView(qname)
        val q = alerts.toDF().writeStream.format("memory")
          .queryName(qname).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(qname).agg(
          count(lit(1)).as("n_alerted"),
          countDistinct(col("user_id")).as("n_distinct_alerted"),
          coalesce(sum(pmod(col("user_id"), lit(1000000007L))), lit(0L))
            .as("user_hash_sum"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS c
                FROM events GROUP BY user_id)
              SELECT CAST(count(*) AS BIGINT) AS n_alerted,
                CAST(count(DISTINCT user_id) AS BIGINT)
                  AS n_distinct_alerted,
                CAST(coalesce(sum(user_id % 1000000007), 0) AS BIGINT)
                  AS user_hash_sum
              FROM per WHERE c >= 70""")),

    // Propensity-score stratification ATE on a deliberately CONFOUNDED
    // fixture: treatment assignment depends on user activity (c + hash
    // noise), and the outcome (total value) also scales with activity —
    // so the naive treated-control gap is inflated and the
    // propensity-stratified estimate corrects it, visible in-band
    // (naive_diff vs ate). Propensity via the replayable logisticGD
    // (4 rounds); stratum assignment rides the bounded 7-dp p-support
    // (cum-count integer arithmetic), never a global row sort. The
    // oracle unrolls the 4 training rounds + scoring + stratification.
    Q("q_propensity_ate",
      (s, dir) => {
        val per = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).cast("double").as("c"),
            round(coalesce(avg("value"), lit(0.0)), 6).as("av"),
            round(coalesce(sum("value"), lit(0.0)), 6).as("y"))
          .withColumn("t",
            when(col("c") + lit(4L) * pmod(
              graft.operators.PortableHash.portable60(
                concat(lit("tr:"), col("user_id").cast("string"))), lit(6L))
              >= 76, 1L).otherwise(0L))
        val st = broadcast(per.agg(
          round(avg("c"), 6).as("mc"), round(stddev_samp("c"), 6).as("sc"),
          round(avg("av"), 6).as("mv"), round(stddev_samp("av"), 6).as("sv")))
        val feat = per.crossJoin(st).select(
          round((col("c") - col("mc")) / col("sc"), 6).as("x1"),
          round((col("av") - col("mv")) / col("sv"), 6).as("x2"),
          col("t"), col("y"))
        graft.operators.Causal.propensityStratifiedAte(
          feat, Seq("x1", "x2"), col("t"), col("y"),
          strata = 5, rounds = 4, lr = 0.5)
      },
      Some {
        val roundsSql = (1 to 4).map { i =>
          val pw = s"wr${i - 1}"
          s"""g$i AS MATERIALIZED (SELECT round(sum(s - t), 6) AS g0,
                round(sum((s - t) * x1), 6) AS g1,
                round(sum((s - t) * x2), 6) AS g2,
                CAST(count(*) AS BIGINT) AS n
              FROM (SELECT t, x1, x2,
                  1.0 / (1.0 + exp(-((SELECT w0 FROM $pw)
                    + (SELECT w1 FROM $pw) * x1
                    + (SELECT w2 FROM $pw) * x2))) AS s
                FROM feat)),
              wr$i AS MATERIALIZED (SELECT
                round((SELECT w0 FROM $pw) - 0.5 * g0 / n, 7) AS w0,
                round((SELECT w1 FROM $pw) - 0.5 * g1 / n, 7) AS w1,
                round((SELECT w2 FROM $pw) - 0.5 * g2 / n, 7) AS w2
              FROM g$i)"""
        }.mkString(",\n              ")
        s"""WITH per AS MATERIALIZED (SELECT user_id,
                  CAST(count(*) AS DOUBLE) AS c,
                  round(coalesce(avg(value), 0.0), 6) AS av,
                  round(coalesce(sum(value), 0.0), 6) AS y,
                  CASE WHEN CAST(count(*) AS DOUBLE)
                    + 4 * (${graft.operators.PortableHash.duckSql(
                      "'tr:' || CAST(user_id AS VARCHAR)")} % 6) >= 76
                    THEN 1 ELSE 0 END AS t
                FROM events GROUP BY user_id),
              stm AS MATERIALIZED (SELECT round(avg(c), 6) AS mc,
                  round(stddev_samp(c), 6) AS sc,
                  round(avg(av), 6) AS mv, round(stddev_samp(av), 6) AS sv
                FROM per),
              feat AS MATERIALIZED (SELECT
                  round((c - (SELECT mc FROM stm))
                    / (SELECT sc FROM stm), 6) AS x1,
                  round((av - (SELECT mv FROM stm))
                    / (SELECT sv FROM stm), 6) AS x2,
                  t, y
                FROM per),
              wr0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
              $roundsSql,
              scored AS MATERIALIZED (SELECT t, y,
                  round(1.0 / (1.0 + exp(-((SELECT w0 FROM wr4)
                    + (SELECT w1 FROM wr4) * x1
                    + (SELECT w2 FROM wr4) * x2))), 7) AS p
                FROM feat),
              byp AS (SELECT p, CAST(count(*) AS BIGINT) AS cnt
                FROM scored GROUP BY p),
              cum AS (SELECT p,
                  CAST(sum(cnt) OVER (ORDER BY p) AS BIGINT) - cnt
                    AS cum_less
                FROM byp),
              tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
              strat AS (SELECT p, (cum_less * 5) // (SELECT n FROM tot)
                  AS stratum FROM cum),
              cells AS (SELECT stratum, t, CAST(count(*) AS BIGINT) AS nc,
                  round(avg(y), 6) AS my
                FROM scored JOIN strat USING (p) GROUP BY stratum, t),
              bins AS (SELECT stratum, CAST(sum(nc) AS BIGINT) AS n_b,
                  sum(CASE WHEN t = 1 THEN my END) AS m1,
                  sum(CASE WHEN t = 0 THEN my END) AS m0,
                  count(*) AS arms
                FROM cells GROUP BY stratum),
              used AS (SELECT * FROM bins WHERE arms = 2),
              naive AS (SELECT round(
                  sum(CASE WHEN t = 1 THEN m END)
                  - sum(CASE WHEN t = 0 THEN m END), 6) AS naive_diff
                FROM (SELECT t, round(avg(y), 6) AS m
                  FROM scored GROUP BY t)),
              fin AS (SELECT CAST(sum(n_b) AS BIGINT) AS n_used,
                  CAST(count(*) AS BIGINT) AS strata_used,
                  round(sum(n_b * (m1 - m0)), 6) AS wsum FROM used)
              SELECT tot.n, fin.n_used, fin.strata_used, naive.naive_diff,
                round(fin.wsum / fin.n_used, 6) AS ate
              FROM fin, tot, naive"""
      }))

  /** Synthesized shipping windows per supplier for the interval family:
    * [shipday, shipday + quantity] with a per-key row_number interval id.
    * (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    * (11,785 collisions at sf0.01), and a collided id makes a < b
    * silently skip the duplicate pair — the per-key rank is unique by
    * construction, and overlap COUNTS are invariant to which duplicate
    * of an identical interval gets which rank.
    */
  private def supplierShipWindows(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem")
      .withColumn("d", datediff(col("l_shipdate"), lit("1970-01-01"))
        .cast("long"))
      .select(col("l_suppkey").as("g"), col("d").as("s"),
        (col("d") + col("l_quantity").cast("long")).as("e"))
    base.withColumn("iid", row_number().over(
      Window.partitionBy("g").orderBy(col("s"), col("e"))).cast("long"))
  }

  /** Shared oracle for the two interval-overlap forms (pair join and
    * sweep): the INDEPENDENT naive per-key pairwise join, so both the
    * bucketing machinery and the sweep identity are checked against
    * first-principles SQL.
    */
  private lazy val intervalOverlapOracleSql: String =
    """WITH iv0 AS (SELECT CAST(l_suppkey AS BIGINT) AS g,
                  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS s,
                  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    + CAST(l_quantity AS BIGINT) AS BIGINT) AS e
                FROM lineitem),
              iv AS (SELECT g, s, e, CAST(row_number() OVER (
                  PARTITION BY g ORDER BY s, e) AS BIGINT) AS id
                FROM iv0),
              pairs AS (SELECT a.g, CAST(count(*) AS BIGINT) AS n_overlaps
                FROM iv a JOIN iv b ON a.g = b.g AND a.id < b.id
                  AND a.s <= b.e AND b.s <= a.e
                GROUP BY a.g),
              cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_intervals
                FROM iv GROUP BY g)
              SELECT cnt.g AS key, cnt.n_intervals,
                coalesce(pairs.n_overlaps, 0) AS n_overlaps
              FROM cnt LEFT JOIN pairs ON cnt.g = pairs.g
              ORDER BY n_overlaps DESC, key LIMIT 20"""

  /** Session-12 wave: ordered-path behavioral analytics (sequential
    * bigrams, multi-touch attribution, Markov stationary flow) plus two
    * distribution tools the drift/ranking families lacked — exact
    * 1-Wasserstein drift and empirical-Bayes rate shrinkage.
    */
  private lazy val session12: Seq[Q] = Seq(

    // sequential bigram mining: what event type FOLLOWS what, within a
    // 30-minute gap — the PrefixSpan-depth-2 cut. One user-window pass,
    // then a map-side-combined groupBy over the bounded K^2 pair support;
    // top-15 with full tie-breaks so the cut is deterministic.
    Q("q_seq_bigrams",
      (s, dir) => graft.operators.PathAnalytics.seqBigrams(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        col("event_type"), maxGapSec = 1800L, topK = 15),
      Some("""WITH e AS (SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id, event_type AS ty FROM events),
              s AS (SELECT u, ty, sec, lead(ty) OVER w AS ty_next,
                  lead(sec) OVER w AS sec_next
                FROM e WINDOW w AS (PARTITION BY u ORDER BY sec, id))
              SELECT ty AS type_a, ty_next AS type_b,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT u) AS BIGINT) AS n_users
              FROM s WHERE ty_next IS NOT NULL AND sec_next - sec <= 1800
              GROUP BY 1, 2
              ORDER BY n_pairs DESC, type_a, type_b LIMIT 15""")),

    // multi-touch attribution: linear and U-shaped (40/20/40) conversion
    // credit over each user's pre-first-purchase touch path. Credits are
    // exact BIGINT micro-units (10^12 div k floor division — identical in
    // both engines), summed in decimal(38,0); the only doubles are the
    // two final divisions onto the 6-dp grid.
    Q("q_attribution",
      (s, dir) => graft.operators.PathAnalytics.multiTouchAttribution(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("event_type") === "purchase"),
      Some("""WITH e AS (SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id, event_type AS ch,
                  (event_type = 'purchase') AS conv FROM events),
              cu AS (SELECT u, min(sec) AS conv_sec FROM e WHERE conv
                GROUP BY u),
              ci AS (SELECT e.u, cu.conv_sec, min(e.id) AS conv_id
                FROM e JOIN cu ON e.u = cu.u AND e.sec = cu.conv_sec
                WHERE e.conv GROUP BY e.u, cu.conv_sec),
              touch AS (SELECT e.u, e.ch, e.sec, e.id
                FROM e JOIN ci ON e.u = ci.u
                WHERE NOT e.conv AND (e.sec < ci.conv_sec OR
                  (e.sec = ci.conv_sec AND e.id < ci.conv_id))),
              ranked AS (SELECT u, ch,
                  CAST(row_number() OVER (PARTITION BY u ORDER BY sec, id)
                    AS BIGINT) AS pos,
                  CAST(count(*) OVER (PARTITION BY u) AS BIGINT) AS k
                FROM touch),
              credits AS (SELECT u, ch,
                  1000000000000 // k AS lin_u,
                  CASE WHEN k = 1 THEN 1000000000000
                    WHEN k = 2 THEN 500000000000
                    WHEN pos = 1 OR pos = k THEN 400000000000
                    ELSE 200000000000 // (k - 2) END AS u_u
                FROM ranked)
              SELECT ch AS channel, CAST(count(*) AS BIGINT) AS n_touches,
                CAST(count(DISTINCT u) AS BIGINT) AS n_paths,
                round(CAST(sum(lin_u) AS DOUBLE) / 1000000000000, 6)
                  AS linear_credit,
                round(CAST(sum(u_u) AS DOUBLE) / 1000000000000, 6)
                  AS u_credit
              FROM credits GROUP BY ch
              ORDER BY linear_credit DESC, channel""")),

    // Markov stationary distribution of the event-type chain: 12 power-
    // iteration rounds on the 12-dp per-round grid (the pageRank fixed-
    // round convention), sinks keep their mass. The oracle unrolls all
    // 12 rounds, so a single divergent step anywhere mismatches.
    Q("q_markov_stationary",
      (s, dir) => graft.operators.PathAnalytics.markovStationary(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        col("event_type"), iterations = 12),
      Some {
        def step(i: Int) =
          s"""pi$i AS MATERIALIZED (SELECT s.state,
                round(coalesce(f.inflow, 0) + coalesce(kp.pi, 0), 12) AS pi
              FROM states s
              LEFT JOIN (SELECT p.b AS state, sum(x.pi * p.p) AS inflow
                FROM pi${i - 1} x JOIN p ON x.state = p.a
                GROUP BY p.b) f ON f.state = s.state
              LEFT JOIN (SELECT x.state, x.pi FROM pi${i - 1} x
                JOIN sinks sk ON sk.state = x.state) kp
                ON kp.state = s.state)"""
        val steps = (1 to 12).map(step).mkString(",\n              ")
        s"""WITH e AS (SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id, event_type AS ty FROM events),
              sq AS (SELECT u, ty, lead(ty) OVER (PARTITION BY u
                  ORDER BY sec, id) AS tyn FROM e),
              tr AS MATERIALIZED (SELECT ty AS a, tyn AS b,
                  CAST(count(*) AS BIGINT) AS n
                FROM sq WHERE tyn IS NOT NULL GROUP BY 1, 2),
              p AS MATERIALIZED (SELECT a, b,
                  n / CAST(sum(n) OVER (PARTITION BY a) AS DOUBLE) AS p
                FROM tr),
              states AS MATERIALIZED (SELECT DISTINCT a AS state FROM tr
                UNION SELECT DISTINCT b FROM tr),
              sinks AS MATERIALIZED (SELECT state FROM states
                WHERE state NOT IN (SELECT a FROM tr)),
              kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
              pi0 AS MATERIALIZED (SELECT state, round(1.0 / k, 12) AS pi
                FROM states, kk),
              $steps
              SELECT state, round(pi, 6) AS pi FROM pi12 ORDER BY state"""
      }),

    // exact 1-Wasserstein distance between click and purchase value
    // distributions on the cents grid — the metric drift measure beside
    // PSI/KS/JS. Corpus folds to its support in one groupBy; the CDF-gap
    // trapezoid accumulates in decimal(38,0) (cum*n*dx passes int64 at
    // corpus scale — the gini lesson).
    Q("q_wasserstein_drift",
      (s, dir) => graft.operators.Profiling.wasserstein1(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase")),
        round(col("value") * 100).cast("long"),
        when(col("event_type") === "click", 0L).otherwise(1L)),
      Some("""WITH x AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                  CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g
                FROM events WHERE event_type IN ('click', 'purchase')),
              c AS (SELECT v,
                  CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS ca,
                  CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS cb
                FROM x GROUP BY v),
              t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                  CAST(sum(cb) AS BIGINT) AS n_b FROM c),
              cum AS (SELECT v,
                  CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
                  CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
                  lead(v) OVER (ORDER BY v) - v AS dx
                FROM c WINDOW w AS (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              SELECT t.n_a, t.n_b, CAST(count(*) AS BIGINT) AS support,
                CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
                  round(CAST(sum(CASE WHEN dx IS NOT NULL THEN
                    abs(CAST(cum_a AS DECIMAL(38,0)) * t.n_b -
                      CAST(cum_b AS DECIMAL(38,0)) * t.n_a) * dx END)
                    AS DOUBLE) /
                    (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)), 6)
                END AS w1
              FROM cum, t GROUP BY t.n_a, t.n_b""")),

    // empirical-Bayes shrinkage of per-user click rates toward the
    // moment-matched Beta prior — the small-n ranking fix. Moments are
    // 6-dp anchored before deriving alpha/beta (the Welch/CUPED
    // convention); top-20 by shrunk rate with a full tie-break.
    Q("q_eb_shrinkage",
      (s, dir) => graft.operators.Profiling.ebShrinkage(
        t(s, dir, "events"), col("user_id"),
        (col("event_type") === "click").cast("long"), topK = 20),
      Some("""WITH g AS (SELECT user_id AS grp,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                    END) AS BIGINT) AS successes
                FROM events GROUP BY user_id),
              r AS (SELECT *, round(successes / CAST(n AS DOUBLE), 6)
                  AS raw_rate FROM g),
              pr AS (SELECT round(avg(raw_rate), 6) AS m,
                  round(var_samp(raw_rate), 6) AS v FROM r),
              s AS (SELECT m, v,
                  CASE WHEN v > 0 THEN m * (1 - m) / v - 1 END AS s
                FROM pr)
              SELECT grp, n, successes, raw_rate,
                CASE WHEN s.s > 0 THEN
                  round((successes + s.m * s.s) / (n + s.s), 6) END
                  AS shrunk_rate
              FROM r, s
              ORDER BY shrunk_rate DESC NULLS LAST, grp LIMIT 20""")),

    // interval-overlap self-join per supplier over synthesized shipping
    // windows [shipday, shipday + quantity]: bucketed candidates, exact
    // closed-interval predicate, each pair owned by the bucket of its
    // overlap's left edge (one-cell ownership — no distinct pass). The
    // oracle is the INDEPENDENT naive per-key pairwise join, so the
    // bucketing machinery itself is what gets checked. Candidate volume
    // is Σ occupancy² — the opt-in pre-flight prices it and fails fast at
    // dense decades (×1000 here is ~48e9 candidates — the measured r11
    // kill); the sweep twin below is the scale path for counts.
    Q("q_interval_overlap",
      (s, dir) => graft.operators.RangeJoin.intervalOverlapPairs(
        supplierShipWindows(s, dir), col("g"), col("iid"),
        col("s"), col("e"), bucketSize = 32L, topK = 20,
        maxExpectedCandidates = Some(3000000000L)),
      Some(intervalOverlapOracleSql)),

    // the O(n log n) sweep twin: each pair counted at its later-starting
    // member via active(i) = rank(i) − #{e_j < s_i} − 1 (strict < by the
    // 2e+1 vs 2s parity trick) — no pair ever materializes, so density
    // cannot square. Same output shape and the same independent naive
    // oracle as the pair-materializing form.
    Q("q_interval_overlap_sweep",
      (s, dir) => graft.operators.RangeJoin.intervalOverlapCount(
        supplierShipWindows(s, dir), col("g"), col("iid"),
        col("s"), col("e"), topK = 20),
      Some(intervalOverlapOracleSql)),

    // union length of each supplier's shipping windows (the sweep
    // identity: clip at the running max predecessor end, sum positive
    // remainders) — "how many distinct days was this supplier actually
    // shipping". One window pass per key, exact integers.
    Q("q_interval_coverage",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .withColumn("d", datediff(col("l_shipdate"), lit("1970-01-01"))
            .cast("long"))
        graft.operators.RangeJoin.intervalCoverage(
          li, col("l_suppkey"), col("d"),
          col("d") + col("l_quantity").cast("long"), topK = 20)
      },
      Some("""WITH iv AS (SELECT CAST(l_suppkey AS BIGINT) AS g,
                  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    AS BIGINT) AS s,
                  CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    + CAST(l_quantity AS BIGINT) AS BIGINT) AS e
                FROM lineitem),
              c AS (SELECT g, s, e, max(e) OVER (PARTITION BY g
                  ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING) AS prev_max FROM iv),
              k AS (SELECT g, s, e,
                  greatest(CAST(0 AS BIGINT), e - greatest(s,
                    coalesce(prev_max + 1, s)) + 1) AS contrib FROM c)
              SELECT g AS key, CAST(count(*) AS BIGINT) AS n_intervals,
                CAST(sum(contrib) AS BIGINT) AS covered,
                CAST(max(e) - min(s) + 1 AS BIGINT) AS span
              FROM k GROUP BY g ORDER BY covered DESC, key LIMIT 20""")),

    // exact weighted median of the price support, weighted by quantity,
    // per return flag — cross-multiplied integer selection, no doubles.
    Q("q_weighted_median",
      (s, dir) => graft.operators.Profiling.weightedMedian(
        t(s, dir, "lineitem"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long")),
      Some("""WITH sup AS (SELECT l_returnflag AS grp,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
                FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0
                GROUP BY 1, 2),
              c AS (SELECT grp, v,
                  CAST(sum(wv) OVER (PARTITION BY grp ORDER BY v)
                    AS BIGINT) AS cum,
                  CAST(sum(wv) OVER (PARTITION BY grp) AS BIGINT)
                    AS total_w,
                  CAST(count(*) OVER (PARTITION BY grp) AS BIGINT)
                    AS n_support
                FROM sup)
              SELECT grp, CAST(max(total_w) AS BIGINT) AS total_w,
                CAST(max(n_support) AS BIGINT) AS n_support,
                CAST(min(v) AS BIGINT) AS w_median
              FROM c WHERE 2 * cum >= total_w
              GROUP BY grp ORDER BY grp""")),

    // funnel time-to-convert: seconds from first view to first
    // subsequent purchase per converting user; count, 6-dp mean, and the
    // exact midrank median (avg of the 1-2 middle order statistics on
    // the .5 grid). The median window runs over the user-support-bounded
    // converter set — the bin-first/bounded-series contract.
    Q("q_funnel_ttc",
      (s, dir) => {
        val ev = t(s, dir, "events").select(col("user_id").as("u"),
          unix_timestamp(col("ts")).as("sec"), col("event_type").as("ty"))
        val tv = ev.filter(col("ty") === "view")
          .groupBy("u").agg(min("sec").as("tv"))
        val ttc = ev.filter(col("ty") === "purchase")
          .join(tv, Seq("u")).filter(col("sec") >= col("tv"))
          .groupBy("u").agg((min("sec") - first("tv")).as("d"))
        val stats = ttc.agg(count(lit(1)).as("n_conv"),
          round(avg("d"), 6).as("avg_ttc"))
        val wo = Window.orderBy("d")
        val med = ttc
          .withColumn("rn", row_number().over(wo).cast("long"))
          .withColumn("m", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .filter(col("rn") * 2 >= col("m") && col("rn") * 2 <= col("m") + 2)
          .agg(round(avg("d"), 1).as("median_ttc"))
        stats.crossJoin(med)
      },
      Some("""WITH e AS (SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_type AS ty
                FROM events),
              tv AS (SELECT u, min(sec) AS tv FROM e WHERE ty = 'view'
                GROUP BY u),
              ttc AS (SELECT e.u, min(e.sec) - min(tv.tv) AS d
                FROM e JOIN tv ON e.u = tv.u
                WHERE e.ty = 'purchase' AND e.sec >= tv.tv GROUP BY e.u),
              st AS (SELECT CAST(count(*) AS BIGINT) AS n_conv,
                  round(avg(d), 6) AS avg_ttc FROM ttc),
              r AS (SELECT d,
                  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS rn,
                  CAST(count(*) OVER () AS BIGINT) AS m FROM ttc),
              md AS (SELECT round(avg(d), 1) AS median_ttc FROM r
                WHERE rn * 2 >= m AND rn * 2 <= m + 2)
              SELECT st.n_conv, st.avg_ttc, md.median_ttc FROM st, md""")),

    // sequential trigram mining: ordered type->type->type paths where
    // both consecutive gaps fit the 30-minute bound — the depth-3 flow
    // view the bigram entry cannot see (a->b->a loops vs a->b->c drifts).
    Q("q_seq_trigrams",
      (s, dir) => graft.operators.PathAnalytics.seqTrigrams(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        col("event_type"), maxGapSec = 1800L, topK = 15),
      Some("""WITH e AS (SELECT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id, event_type AS ty FROM events),
              s AS (SELECT u, ty, sec,
                  lead(ty, 1) OVER w AS ty2, lead(sec, 1) OVER w AS sec2,
                  lead(ty, 2) OVER w AS ty3, lead(sec, 2) OVER w AS sec3
                FROM e WINDOW w AS (PARTITION BY u ORDER BY sec, id))
              SELECT ty AS type_a, ty2 AS type_b, ty3 AS type_c,
                CAST(count(*) AS BIGINT) AS n_triples,
                CAST(count(DISTINCT u) AS BIGINT) AS n_users
              FROM s WHERE ty3 IS NOT NULL AND sec2 - sec <= 1800
                AND sec3 - sec2 <= 1800
              GROUP BY 1, 2, 3
              ORDER BY n_triples DESC, type_a, type_b, type_c
              LIMIT 15""")),

    // order/partition-independent table fingerprint per return flag: two
    // domain-separated portable-hash channels summed in decimal(38,0) —
    // the "did the 100 TB copy preserve the data" parity primitive. Canon
    // string uses integral grids only (doubles never stringify).
    Q("q_table_fingerprint",
      (s, dir) => graft.operators.RankEval.tableFingerprint(
        t(s, dir, "lineitem"), col("l_returnflag"),
        concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long"),
          col("l_quantity").cast("long"), col("l_returnflag"))),
      Some {
        val canon = "CAST(l_orderkey AS VARCHAR) || '|' || " +
          "CAST(l_linenumber AS VARCHAR) || '|' || " +
          "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)" +
          " || '|' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)" +
          " || '|' || l_returnflag"
        val m = graft.operators.RankEval.FingerprintMod
        s"""WITH c AS (SELECT l_returnflag AS grp, $canon AS c
                FROM lineitem)
              SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(sum(${graft.operators.PortableHash.duckSql(
                  "'fp1:' || c")}) % $m AS BIGINT) AS fp1,
                CAST(sum(${graft.operators.PortableHash.duckSql(
                  "'fp2:' || c")}) % $m AS BIGINT) AS fp2
              FROM c GROUP BY grp ORDER BY grp"""
      }),

    // reciprocal-rank fusion of the spend ranking with the activity
    // ranking — the hybrid-search merge (BM25 ⊕ ANN shape) on exact
    // strict ranks; reciprocals are identical IEEE doubles pre-grid.
    Q("q_rrf_fusion",
      (s, dir) => {
        val per = t(s, dir, "events").groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100).cast("long")).as("s1"),
            count(lit(1)).as("s2"))
        graft.operators.RankEval.rrfFuse(per, col("user_id"),
          col("s1"), col("s2"), k = 60, topK = 20)
      },
      Some("""WITH per AS (SELECT user_id AS id,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS s1,
                  CAST(count(*) AS BIGINT) AS s2
                FROM events GROUP BY user_id),
              r AS (SELECT id,
                  CAST(row_number() OVER (ORDER BY s1 DESC NULLS LAST, id)
                    AS BIGINT) AS r1,
                  CAST(row_number() OVER (ORDER BY s2 DESC NULLS LAST, id)
                    AS BIGINT) AS r2
                FROM per)
              SELECT id, r1, r2,
                round(CAST(1 AS DOUBLE) / (60 + r1)
                  + CAST(1 AS DOUBLE) / (60 + r2), 6) AS rrf
              FROM r ORDER BY rrf DESC, id LIMIT 20""")),

    // unpivot/melt (Dataset.unpivot, the §2 wide→long reshaping surface):
    // three measure columns melt to (feature, v) rows, then a bounded
    // (flag, feature) roll-up — exact cents sums beside the 6-dp means.
    Q("q_unpivot_melt",
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")), "feature", "v")
        .groupBy("l_returnflag", "feature")
        .agg(count(lit(1)).as("n"),
          sum(round(col("v") * 100).cast("long")).as("sum_cents"),
          round(avg("v"), 6).as("avg_v"))
        .orderBy("l_returnflag", "feature"),
      Some("""WITH m AS (
                SELECT l_returnflag, 'l_quantity' AS feature,
                  l_quantity AS v FROM lineitem
                UNION ALL SELECT l_returnflag, 'l_extendedprice',
                  l_extendedprice FROM lineitem
                UNION ALL SELECT l_returnflag, 'l_discount', l_discount
                FROM lineitem)
              SELECT l_returnflag, feature, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                round(avg(v), 6) AS avg_v
              FROM m GROUP BY 1, 2 ORDER BY 1, 2""")),

    // exact join-size forecast for the events-on-user SELF-join — the
    // quadratic pre-flight (sessions × sessions per user) computed from
    // two skinny key supports, never the join. The ops primitive behind
    // every gate this repo ships: Σ c_l·c_r, top keys = salting worklist.
    Q("q_join_size_forecast",
      (s, dir) => {
        val ev = t(s, dir, "events")
        graft.operators.Warehouse.joinSizeForecast(
          ev, col("user_id"), ev, col("user_id"), topK = 10)
      },
      Some("""WITH la AS (SELECT user_id AS key,
                  CAST(count(*) AS BIGINT) AS c_left
                FROM events GROUP BY 1),
              p AS (SELECT key, c_left, c_left AS c_right,
                  CAST(CAST(c_left AS DECIMAL(38,0)) * c_left AS BIGINT)
                    AS product
                FROM la),
              t AS (SELECT CAST(sum(CAST(product AS DECIMAL(38,0)))
                    AS BIGINT) AS total_rows,
                  CAST(count(*) AS BIGINT) AS shared_keys FROM p)
              SELECT key, c_left, c_right, product, t.total_rows,
                t.shared_keys
              FROM p, t ORDER BY product DESC, key LIMIT 10""")),

    // OHLC daily bars per event type — the candlestick/metrics-rollup
    // downsampler: open/close picked by (sec, id) row_number (no
    // first_value frame semantics to align), high/low/sum exact units.
    Q("q_ohlc_bars",
      (s, dir) => graft.operators.Downsample.ohlcBars(
        t(s, dir, "events"), col("event_type"), col("ts"),
        col("event_id"), round(col("value") * 100).cast("long"),
        bucketSec = 86400L),
      Some("""WITH e AS (SELECT event_type AS key,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id,
                  CAST(round(value * 100) AS BIGINT) AS v FROM events),
              b AS (SELECT key, sec // 86400 AS bucket, sec, id, v FROM e),
              r AS (SELECT key, bucket, v,
                  CAST(row_number() OVER w AS BIGINT) AS rn,
                  CAST(count(*) OVER (PARTITION BY key, bucket) AS BIGINT)
                    AS n
                FROM b WINDOW w AS (PARTITION BY key, bucket
                  ORDER BY sec, id))
              SELECT key, bucket, max(n) AS n,
                max(CASE WHEN rn = 1 THEN v END) AS open,
                max(v) AS high, min(v) AS low,
                max(CASE WHEN rn = n THEN v END) AS close,
                CAST(sum(v) AS BIGINT) AS sum_units
              FROM r GROUP BY key, bucket ORDER BY key, bucket""")),

    // time-weighted average value per user (step-function hold until the
    // next event) — the irregular-sampling mean; unit×seconds areas in
    // decimal(38,0), <2-instant keys explicitly NULL.
    Q("q_twap",
      (s, dir) => graft.operators.Downsample.twap(
        t(s, dir, "events"), col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast("long"), topK = 20),
      Some("""WITH e AS (SELECT user_id AS key,
                  CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                  event_id AS id,
                  CAST(round(value * 100) AS BIGINT) AS v FROM events),
              l AS (SELECT key, v, sec, lead(sec) OVER (PARTITION BY key
                  ORDER BY sec, id) AS sec_next FROM e),
              a AS (SELECT key, CAST(count(*) AS BIGINT) AS n_events,
                  CAST(max(sec) - min(sec) AS BIGINT) AS span_sec,
                  sum(CASE WHEN sec_next IS NOT NULL THEN
                    CAST(v AS DECIMAL(38,0)) * (sec_next - sec) END)
                    AS area
                FROM l GROUP BY key)
              SELECT key, n_events, span_sec,
                CASE WHEN span_sec > 0 THEN
                  round(CAST(area AS DOUBLE) / span_sec, 6) END AS twap
              FROM a ORDER BY twap DESC NULLS LAST, key LIMIT 20""")),

    // Merkle-style snapshot reconciliation: snapshot B is lineitem minus
    // the orderkey-0 rows; 64-bucket fingerprints locate the diff in a
    // bucket compare — two scans, no row join; only disagreeing buckets
    // surface (empty output would BE the parity certificate).
    Q("q_fingerprint_diff",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val canon = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long"),
          col("l_quantity").cast("long"), col("l_returnflag"))
        graft.operators.RankEval.fingerprintDiff(
          li, li.filter(col("l_orderkey") =!= 0), canon, canon,
          buckets = 64L)
      },
      Some {
        val canon = "CAST(l_orderkey AS VARCHAR) || '|' || " +
          "CAST(l_linenumber AS VARCHAR) || '|' || " +
          "CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)" +
          " || '|' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)" +
          " || '|' || l_returnflag"
        val m = graft.operators.RankEval.FingerprintMod
        def side(where: String) =
          s"""SELECT ${graft.operators.PortableHash.duckSql(
                "'fpd:' || c")} % 64 AS bucket,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(${graft.operators.PortableHash.duckSql(
                "'fp1:' || c")}) % $m AS BIGINT) AS fp1,
              CAST(sum(${graft.operators.PortableHash.duckSql(
                "'fp2:' || c")}) % $m AS BIGINT) AS fp2
              FROM (SELECT $canon AS c FROM lineitem $where)
              GROUP BY 1"""
        s"""WITH sa AS (${side("")}),
              sb AS (${side("WHERE l_orderkey <> 0")})
              SELECT coalesce(sa.bucket, sb.bucket) AS bucket,
                coalesce(sa.n_rows, 0) AS n_rows_a,
                coalesce(sb.n_rows, 0) AS n_rows_b,
                sa.fp1 AS fp1_a, sb.fp1 AS fp1_b
              FROM sa FULL OUTER JOIN sb ON sa.bucket = sb.bucket
              WHERE coalesce(sa.n_rows, -1) <> coalesce(sb.n_rows, -1)
                OR coalesce(sa.fp1, -1) <> coalesce(sb.fp1, -1)
                OR coalesce(sa.fp2, -1) <> coalesce(sb.fp2, -1)
              ORDER BY bucket"""
      }),

    // ABC (Pareto) classification of brands by revenue: cumulative-share
    // classes on cross-multiplied integers (100·cum ≤ 80·total → A,
    // ≤ 95 → B, else C; the crossing brand falls to the next class —
    // the cum ≤ threshold convention, mirrored in the oracle). Support-
    // bounded window over the brand roll-up. The cross-multiplications
    // run in decimal(38,0) on BOTH engines: cum/total are corpus-wide
    // revenue cents, and 100·cum passes int64 near ~9.2e16 cents total
    // (inside the ×1000 envelope) where Spark would wrap silently while
    // DuckDB errors — the house Dec convention (gini/quantileNormalize).
    Q("q_abc_class",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("rev"))
        val w = Window.orderBy(col("rev").desc, col("brand"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = broadcast(rev.agg(sum("rev").as("total")))
        val dec = "decimal(38,0)"
        rev.withColumn("cum", sum("rev").over(w))
          .crossJoin(tot)
          .withColumn("abc",
            when(col("cum").cast(dec) * 100 <= col("total").cast(dec) * 80,
              "A")
              .when(
                col("cum").cast(dec) * 100 <= col("total").cast(dec) * 95,
                "B")
              .otherwise("C"))
          .groupBy("abc")
          .agg(count(lit(1)).as("n_brands"), sum("rev").as("revenue_cents"),
            round(sum("rev").cast("double") / max("total"), 6).as("share"))
          .orderBy("abc")
      },
      Some("""WITH rev AS (SELECT p_brand AS brand,
                  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY 1),
              c AS (SELECT brand, rev,
                  CAST(sum(rev) OVER (ORDER BY rev DESC, brand) AS BIGINT)
                    AS cum,
                  CAST(sum(rev) OVER () AS BIGINT) AS total
                FROM rev),
              k AS (SELECT rev, total,
                  CASE WHEN 100 * CAST(cum AS DECIMAL(38,0))
                      <= 80 * CAST(total AS DECIMAL(38,0)) THEN 'A'
                    WHEN 100 * CAST(cum AS DECIMAL(38,0))
                      <= 95 * CAST(total AS DECIMAL(38,0)) THEN 'B'
                    ELSE 'C' END AS abc
                FROM c)
              SELECT abc, CAST(count(*) AS BIGINT) AS n_brands,
                CAST(sum(rev) AS BIGINT) AS revenue_cents,
                round(CAST(sum(rev) AS DOUBLE) / max(total), 6) AS share
              FROM k GROUP BY abc ORDER BY abc""")),

    // DAU/WAU stickiness: per day, distinct actives vs distinct users
    // active in the trailing 7 days — the exact sliding-distinct via the
    // dedup-then-explode trick (each user-day contributes to the 7
    // forward windows; 7× fan-out of the DEDUPED user-day table, never
    // of raw events), restricted to full-window days.
    Q("q_dau_wau",
      (s, dir) => {
        // ud feeds three consumers UNCACHED, deliberately: persisting it
        // was tried and MEASURED WORSE at ×1000 (89.5 s vs 63.9 s in-run
        // — materializing 10M cached rows costs more than three 2-column
        // parquet scans whose dedup exchanges are cheap map-side folds)
        // day = floor(epoch/86400), not `div` (truncation): pre-1970
        // events have negative epochs and the oracle's `//` floors —
        // the pmod form is floor-valued for all signs in long arithmetic
        val ud = t(s, dir, "events")
          .select(col("user_id").as("u"),
            expr("(unix_timestamp(ts) - pmod(unix_timestamp(ts), 86400))" +
              " div 86400").as("day"))
          .distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = ud
          .withColumn("d", explode(sequence(col("day"), col("day") + 6)))
          .select("u", "d").distinct()
          .groupBy(col("d").as("day")).agg(count(lit(1)).as("wau"))
        val bounds = broadcast(ud.agg(min("day").as("lo"), max("day").as("hi")))
        dau.join(wau, Seq("day")).crossJoin(bounds)
          .filter(col("day") >= col("lo") + 6 && col("day") <= col("hi"))
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau").cast("double") / col("wau"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                FROM events),
              dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM ud GROUP BY day),
              f AS (SELECT DISTINCT u, unnest(generate_series(day, day + 6))
                  AS d FROM ud),
              wau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS wau
                FROM f GROUP BY d),
              b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud)
              SELECT day, dau, wau,
                round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
              FROM dau JOIN wau USING (day), b
              WHERE day >= b.lo + 6 AND day <= b.hi
              ORDER BY day""")),

    // DAU/WAU stickiness, SKETCH twin — the corpus-scale dashboard path
    // beside q_dau_wau's exact sliding distinct: per-day Datasketches
    // HLL sketches (one groupBy straight over events — the sketch
    // absorbs duplicates, so no user-day dedup shuffle), then the 7-day
    // trailing union merges 7 SKETCH ROWS per day — fan-out is 7× the
    // per-day sketch table (days × ~2 KB at lgK=14), never 7× user-days.
    // Measured ×1000 (BENCH_SF10 r12 addenda 3/6): sketch-only 2.8 s vs
    // exact 62.2 s at L7 (22×), 4.3 s vs 63.8 s at L28 (15×) — the exact
    // form's wall is the scan + first user-day dedup, NOT the window
    // fan-out (the predicted L28 4× did not materialize), so the sketch
    // case is the 15–22× constant plus the memory shape, not an
    // asymptotic in window length.
    // Published values stay EXACT (oracle-checkable); sketch estimates
    // surface only through audited error booleans (the q_approx_distinct
    // convention: a sketch regression flips the boolean). lgK=14 ⇒ RSE
    // ≈ 0.81%, tol = 4% (~5σ) with an absolute floor of 16 for
    // small-count days; full 7-day windows only (n_days = 7), the same
    // day set as the oracle's distinct-day self-join count.
    Q("q_dau_wau_approx",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id").as("u"),
            expr("(unix_timestamp(ts) - pmod(unix_timestamp(ts), 86400))" +
              " div 86400").as("day"))
        // daily feeds TWO consumers (window union + per-day estimate):
        // localCheckpoint the ~days-row sketch table once or Catalyst
        // re-inlines the corpus-scale sketch pass per consumer (the
        // house multi-consumer rule; the table is days × ~2 KB)
        val daily = ev.groupBy("day")
          .agg(expr("hll_sketch_agg(u, 14)").as("sk"))
          .localCheckpoint()
        val winEst = daily
          .withColumn("d", explode(sequence(col("day"), col("day") + 6)))
          .groupBy(col("d").as("day"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("wau_est"),
            count(lit(1)).as("n_days"))
          .filter(col("n_days") === 7)
        val dauEst = daily.select(col("day"),
          expr("hll_sketch_estimate(sk)").as("dau_est"))
        val ud = ev.distinct()
        val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
        val wau = ud
          .withColumn("d", explode(sequence(col("day"), col("day") + 6)))
          .select("u", "d").distinct()
          .groupBy(col("d").as("day")).agg(count(lit(1)).as("wau"))
        dau.join(wau, Seq("day")).join(winEst, Seq("day"))
          .join(dauEst, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            (abs(col("dau_est") - col("dau")).cast("double") <=
              greatest(col("dau").cast("double") * 0.04, lit(16.0)))
              .as("dau_within_tol"),
            (abs(col("wau_est") - col("wau")).cast("double") <=
              greatest(col("wau").cast("double") * 0.04, lit(16.0)))
              .as("wau_within_tol"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                FROM events),
              dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                FROM ud GROUP BY day),
              f AS (SELECT DISTINCT u, unnest(generate_series(day, day + 6))
                  AS d FROM ud),
              wau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS wau
                FROM f GROUP BY d),
              days AS (SELECT DISTINCT day FROM ud),
              cnt AS (SELECT a.day, count(*) AS n_days FROM days a
                JOIN days b ON b.day BETWEEN a.day - 6 AND a.day
                GROUP BY 1)
              SELECT day, dau, wau, TRUE AS dau_within_tol,
                TRUE AS wau_within_tol
              FROM dau JOIN wau USING (day) JOIN cnt USING (day)
              WHERE n_days = 7 ORDER BY day""")),

    // new-vs-returning decomposition per day: actives split by whether
    // the day is the user's first-ever day; one user-level min plus one
    // join of deduped user-days — the growth-accounting readout.
    Q("q_new_returning",
      (s, dir) => {
        // uncached for the same measured reason as q_dau_wau (the
        // persist experiment read 16.8 s vs 12.0 s in-run at ×1000)
        // floor-div day bucketing for sign-correctness (see q_dau_wau)
        val ud = t(s, dir, "events")
          .select(col("user_id").as("u"),
            expr("(unix_timestamp(ts) - pmod(unix_timestamp(ts), 86400))" +
              " div 86400").as("day"))
          .distinct()
        val first = ud.groupBy("u").agg(min("day").as("first_day"))
        ud.join(first, Seq("u"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("n_new"))
          .select(col("day"), col("n_active"), col("n_new"),
            (col("n_active") - col("n_new")).as("n_returning"),
            round(col("n_new").cast("double") / col("n_active"), 6)
              .as("new_share"))
          .orderBy("day")
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u,
                  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                FROM events),
              fst AS (SELECT u, min(day) AS first_day FROM ud GROUP BY u),
              j AS (SELECT ud.day,
                  CASE WHEN ud.day = fst.first_day THEN 1 ELSE 0 END
                    AS is_new
                FROM ud JOIN fst ON ud.u = fst.u)
              SELECT day, CAST(count(*) AS BIGINT) AS n_active,
                CAST(sum(is_new) AS BIGINT) AS n_new,
                CAST(count(*) - sum(is_new) AS BIGINT) AS n_returning,
                round(CAST(sum(is_new) AS DOUBLE) / count(*), 6)
                  AS new_share
              FROM j GROUP BY day ORDER BY day""")),
  )

  val all: Seq[Q] =
    relational ++ relational2 ++ text ++ sampling ++ embeddings ++ media ++
      taxi ++ session8 ++ session9 ++ session9b ++ session10 ++ session10b ++
      session11 ++ session12
}
