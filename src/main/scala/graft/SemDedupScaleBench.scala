package graft

import org.apache.spark.sql.functions._

import graft.operators.{OperatorCaches, Similarity}

/** Scale benchmark for [[Similarity.semDedup]] with k SCALED to the corpus
  * — the configuration the operator's scaladoc prescribes for large n
  * (k ≈ n / target cluster size) and the one the fixed-k catalog entry
  * cannot use (its k = 8 is pinned so the DuckDB oracle replays the
  * centroid set; at 100× that fixed k is the documented misconfiguration:
  * Σ n_c² grows as n²/k and only k partitions carry the join).
  *
  * Times assignment + rank + the within-cluster dominance join end-to-end
  * (result row count forces the full plan) and prints one JSON line in the
  * Bench convention. Centroids come from the hash-deterministic sample —
  * training them (kmeansCentroids) adds Lloyd rounds of the same
  * assignment cost and does not change the pair-join shape being measured.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<tier> runMain graft.SemDedupScaleBench
  *        [targetClusterSize] [threshold] [superClusters]
  *        (defaults 250, 0.3, 0 = flat; pass e.g. isqrt(k) to measure the
  *        two-level assignment)
  */
object SemDedupScaleBench {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.map(_.toInt).getOrElse(250)
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.3)
    val superArg = args.lift(2).map(_.toInt).getOrElse(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.local("semdedup-scale")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val k = math.max(8, (n / target).toInt)
    val s = if (superArg < 0) math.max(1, math.sqrt(k.toDouble).toInt) else superArg
    val centroids = Similarity.sampleCentroids(emb, k, "vec_id", "embedding")
    val t0 = System.nanoTime()
    val out = Similarity.semDedup(emb, centroids, threshold, superClusters = s)
    val total = out.count()
    val dropped = out.filter(col("dropped")).count()
    val ms = (System.nanoTime() - t0) / 1e6
    OperatorCaches.releaseAll()
    println(s"""{"metric":"semdedup_scaled_k","value":${math.round(ms)},""" +
      s""""unit":"ms","n":$n,"k":$k,"super":$s,"dropped":$dropped,"total":$total,""" +
      s""""sf":"${sfDir.split('/').last}"}""")
    spark.stop()
  }
}
