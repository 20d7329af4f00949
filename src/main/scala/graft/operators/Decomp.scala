package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass packed second moments of a vector column: row count, per-dim
  * sums, and the upper-triangular (diagonal included) sum of products,
  * packed row-major into d*(d+1)/2 doubles. The distributed primitive
  * under covariance/correlation matrices and PCA.
  */
final case class Moments(n: Long, s: Array[Double], p: Array[Double])

/** Spectral / second-moment decompositions over an embedding column.
  *
  * The design split mirrors the IVF k-means precedent
  * (Similarity.kmeansCentroids): the CORPUS-sized pass is one distributed
  * aggregation — a typed [[Aggregator]] whose partial state is
  * d*(d+3)/2 + 1 doubles per partition, map-side combined, so the shuffle
  * carries per-partition moment buffers and never row data — while the
  * d×d eigenwork runs on the driver, which holds d² doubles (8 MB at
  * d = 1024; embedding dims don't grow with corpus size). DuckDB replays
  * the whole chain: moments from the raw vectors, then the power
  * iteration unrolled as chained CTEs on the shared decimal grids
  * (covariance 6 dp, iterate 7 dp — the k-means/pageRank convention).
  */
object Decomp {

  /** Typed one-pass moments aggregator. Buffers are mutated in place —
    * safe under the Aggregator contract because each partition/group
    * works on its own deserialized copy of `zero`.
    */
  final class PackedMomentsAgg(dim: Int)
      extends Aggregator[Array[Float], Moments, Moments] {
    private val plen = dim * (dim + 1) / 2
    def zero: Moments = Moments(0L, new Array[Double](dim), new Array[Double](plen))
    def reduce(b: Moments, x: Array[Float]): Moments = {
      var i = 0
      var idx = 0
      while (i < dim) {
        val xi = x(i).toDouble
        b.s(i) += xi
        var j = i
        while (j < dim) {
          b.p(idx) += xi * x(j).toDouble
          idx += 1
          j += 1
        }
        i += 1
      }
      Moments(b.n + 1, b.s, b.p)
    }
    def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      var k = 0
      while (k < plen) { a.p(k) += b.p(k); k += 1 }
      Moments(a.n + b.n, a.s, a.p)
    }
    def finish(r: Moments): Moments = r
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** The one corpus pass: null/ragged vectors are dropped (the loader's
    * contract elsewhere in the repo), everything else folds into a single
    * [[Moments]] row collected to the driver — a bounded d-quadratic
    * payload, independent of corpus size.
    */
  def packedMoments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(vecCol))
      .as[Array[Float]]
      .select(new PackedMomentsAgg(dim).toColumn.name("m"))
      .head()
    require(m.n > 0, s"packedMoments: no rows with a $dim-dim '$vecCol'")
    m
  }

  private def round(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def packedIdx(dim: Int, i: Int, j: Int): Int = {
    val (a, b) = if (i <= j) (i, j) else (j, i)
    a * dim - a * (a - 1) / 2 + (b - a)
  }

  /** Full symmetric population covariance matrix on the 6-dp anchor grid:
    * cov(i)(j) = round(E[x_i x_j] - E[x_i]E[x_j], 6). The 6-dp snap is the
    * cross-engine float boundary — raw sums differ only in summation order
    * (~1e-13 relative) between engines, so both land on the same grid cell.
    */
  def covariance6(m: Moments, dim: Int): Array[Array[Double]] = {
    val n = m.n.toDouble
    Array.tabulate(dim, dim) { (i, j) =>
      round(m.p(packedIdx(dim, i, j)) / n - (m.s(i) / n) * (m.s(j) / n), 6)
    }
  }

  /** Top principal component by fixed-round power iteration on the 6-dp
    * covariance anchor: v0 = uniform unit vector on the 7-dp grid, each
    * round is matvec → L2-normalize → 7-dp snap (the pageRank replay
    * convention), and the eigenvalue is the final Rayleigh quotient
    * vᵀCv / vᵀv on the 6-dp output grid. Deterministic sign: the all-
    * positive start and fixed grid make the iterate's sign a pure
    * function of the data in any engine.
    *
    * Returns one row per dimension: (dim 1-based, loading, eigenvalue).
    */
  def pcaTopComponent(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      rounds: Int = 8): DataFrame = {
    require(rounds >= 1, "need rounds >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val cov = covariance6(packedMoments(df, vecCol, dim), dim)
    val (v, lambda) = powerIterate(cov, dim, rounds)
    v.zipWithIndex
      .map { case (l, i) => (i + 1L, l, lambda) }
      .toSeq
      .toDF("dim", "loading", "eigenvalue")
  }

  private def powerIterate(
      cov: Array[Array[Double]],
      dim: Int,
      rounds: Int): (Array[Double], Double) = {
    var v = Array.fill(dim)(round(1.0 / math.sqrt(dim.toDouble), 7))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      require(nrm > 0, "power iteration collapsed to the zero vector")
      v = w.map(x => round(x / nrm, 7))
    }
    val cv = Array.tabulate(dim) { i =>
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
      acc
    }
    val lambda = round(
      v.zip(cv).map { case (a, b) => a * b }.sum / v.map(x => x * x).sum, 6)
    (v, lambda)
  }

  /** Top-k principal components by power iteration WITH HOTELLING
    * DEFLATION: after extracting (v, λ), the next component runs on
    * cov' = round(cov - λ·v·vᵀ, 6) — deflated back onto the SAME 6-dp
    * anchor grid the first covariance sits on, so each component's
    * iteration reads a fully replayable matrix (an engine can chain
    * k × rounds CTEs without ever seeing an unrounded intermediate).
    * The grid snap costs ~1e-6 of orthogonality per deflation — the
    * price of exactness-by-construction, documented rather than hidden.
    *
    * Corpus cost is IDENTICAL to [[pcaTopComponent]]: the one moments
    * pass; everything after is driver d×d work, k·rounds matvecs.
    * Returns (component 1-based, dim 1-based, loading, eigenvalue).
    */
  def pcaTopComponents(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      k: Int,
      rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var cov = covariance6(packedMoments(df, vecCol, dim), dim)
    val rows = (1 to k).flatMap { c =>
      val (v, lambda) = powerIterate(cov, dim, rounds)
      if (c < k)
        cov = Array.tabulate(dim, dim)((i, j) =>
          round(cov(i)(j) - lambda * v(i) * v(j), 6))
      v.zipWithIndex.map { case (l, i) => (c.toLong, i + 1L, l, lambda) }
    }
    rows.toDF("component", "dim", "loading", "eigenvalue")
  }

  /** Top-k most correlated dimension pairs from the same one-pass moments:
    * corr(i,j) = cov_ij / sqrt(var_i var_j) on the 6-dp grid (unrounded
    * covariances inside the ratio — the division would amplify a grid snap,
    * while raw cross-engine drift stays ~1e-13 against the 5e-7 boundary).
    * Ordered by |corr| desc, then (i, j). Returns (i, j, corr), 1-based.
    */
  def corrTopPairs(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = packedMoments(df, vecCol, dim)
    val n = m.n.toDouble
    def rawCov(i: Int, j: Int): Double =
      m.p(packedIdx(dim, i, j)) / n - (m.s(i) / n) * (m.s(j) / n)
    val pairs = for {
      i <- 0 until dim
      j <- (i + 1) until dim
    } yield {
      val c = round(rawCov(i, j) / math.sqrt(rawCov(i, i) * rawCov(j, j)), 6)
      (i + 1L, j + 1L, c)
    }
    pairs
      .sortBy { case (i, j, c) => (-math.abs(c), i, j) }
      .take(k)
      .toDF("i", "j", "corr")
  }
}
