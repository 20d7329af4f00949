package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering-quality indices over an embedding corpus — the acceptance
  * gate after any clustering step (IVF cells, SemDedup groups, label
  * prototypes): did the partition actually separate the space?
  *
  * Both members use the CENTROID-BASED forms (simplified silhouette,
  * Davies–Bouldin): the textbook silhouette needs all-pairs distances
  * (quadratic — dead at corpus scale), while against centroids every
  * point costs k distance evaluations, one narrow corpus pass. Centroids
  * are k·d driver doubles (the k-means/k-center precedent) on the 7-dp
  * mean grid; per-point distances ride the engine-portable
  * (CosineSimilarity ↔ list_cosine_similarity) pair on the 4-dp grid, so
  * every downstream comparison and ratio is over identical doubles in
  * any engine.
  */
object ClusterEval {

  /** Per-label centroids as driver state: Map(label → 7-dp mean vector).
    * One posexplode + groupBy(label, dim) pass; the collect is k·d
    * doubles — bounded by the cluster count, not the corpus.
    */
  def centroids(
      df: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): Map[Long, Seq[Double]] =
    df.select(col(labelCol).cast("long").as("l"),
        posexplode(Similarity.toDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("l", "dim")
      .agg(round(avg("x"), 7).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (l, rs) =>
        l -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }

  /** Simplified silhouette (centroid form, cosine distance): per point,
    * a = distance to its own centroid, b = min distance to any other
    * centroid, s = (b − a)/max(a, b) — s near 1 means compact and far
    * from the nearest rival cluster, s < 0 means the point sits closer
    * to another prototype than its own.
    *
    * Distances snap to the 4-dp grid BEFORE the min/ratio (the
    * bruteForceTopK convention), so s is identical cross-engine; the
    * per-cluster means are the only free-order summations and land on
    * the 4-dp output grid (the label_centroids noise envelope). A point
    * coincident with all centroids (max(a,b) = 0) scores 0 by an
    * explicit guard.
    *
    * Returns one row per cluster: (label, n, avg_a, avg_b, avg_sil).
    */
  def simplifiedSilhouette(
      df: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val cent = centroids(df, labelCol, vecCol)
    val labels = cent.keys.toSeq.sorted
    require(labels.size >= 2,
      s"simplifiedSilhouette: need >= 2 clusters, got ${labels.size}")
    val ed = Similarity.toDouble(col(vecCol))
    def dist(l: Long): Column =
      round(lit(1.0) - Similarity.cosine(ed, array(cent(l).map(lit): _*)), 4)
    def byLabel(f: Long => Column): Column =
      labels.tail.foldLeft(
        when(col(labelCol) === labels.head, f(labels.head))) {
        (acc, l) => acc.when(col(labelCol) === l, f(l))
      }
    val aCol = byLabel(dist)
    val bCol = byLabel { l =>
      val others = labels.filterNot(_ == l).map(dist)
      if (others.size == 1) others.head else least(others: _*)
    }
    df.select(col(labelCol).cast("long").as("label"),
        aCol.as("a"), bCol.as("b"))
      .withColumn("sil",
        when(greatest(col("a"), col("b")) > 0.0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(0.0))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg("a"), 4).as("avg_a"),
        round(avg("b"), 4).as("avg_b"),
        round(avg("sil"), 4).as("avg_sil"))
      .orderBy("label")
  }

  /** Davies–Bouldin index (cosine distance): with per-cluster scatter
    * s_i = mean distance to the own centroid and centroid separation
    * d_ij, each cluster's worst similarity ratio is
    * max_{j≠i} (s_i + s_j)/d_ij, and the index is the mean of those —
    * LOWER is better; a ratio > 1 means some rival cluster is closer
    * than the cluster is tight.
    *
    * Scatters ride the 6-dp grid (free-order mean of 4-dp distances,
    * noise ~1e-13 against the 5e-7 boundary); centroid separations are
    * computed by the SAME portable cosine pair over the k×k centroid
    * table, so every ratio divides identical doubles. Coincident
    * centroids (d_ij rounds to 0) are excluded from the max by an
    * explicit guard (NULL, ignored by max in any engine).
    *
    * Returns one row per cluster: (label, scatter, worst_ratio,
    * db_index) — db_index repeated audit-style.
    */
  def daviesBouldin(
      df: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cent = centroids(df, labelCol, vecCol)
    val labels = cent.keys.toSeq.sorted
    require(labels.size >= 2,
      s"daviesBouldin: need >= 2 clusters, got ${labels.size}")
    val ed = Similarity.toDouble(col(vecCol))
    def dist(l: Long): Column =
      round(lit(1.0) - Similarity.cosine(ed, array(cent(l).map(lit): _*)), 4)
    val aCol = labels.tail.foldLeft(
      when(col(labelCol) === labels.head, dist(labels.head))) {
      (acc, l) => acc.when(col(labelCol) === l, dist(l))
    }
    val scat = df.select(col(labelCol).cast("long").as("label"), aCol.as("a"))
      .groupBy("label").agg(round(avg("a"), 6).as("s"))
    val centDf = labels.map(l => (l, cent(l))).toDF("cl", "cv")
    val pairs = centDf
      .crossJoin(centDf.select(col("cl").as("cr"), col("cv").as("cw")))
      .filter(col("cl") =!= col("cr"))
      .select(col("cl"), col("cr"),
        round(lit(1.0) - Similarity.cosine(col("cv"), col("cw")), 4)
          .as("dij"))
    val ratios = pairs
      .join(scat.select(col("label").as("cl"), col("s").as("si")), Seq("cl"))
      .join(scat.select(col("label").as("cr"), col("s").as("sj")), Seq("cr"))
      .select(col("cl").as("label"),
        when(col("dij") > 0.0, (col("si") + col("sj")) / col("dij"))
          .as("ratio"))
      .groupBy("label")
      .agg(round(max("ratio"), 4).as("worst_ratio"))
    val db = ratios.agg(round(avg("worst_ratio"), 4).as("db_index"))
    ratios
      .join(scat, Seq("label"))
      .crossJoin(broadcast(db))
      .select(col("label"), col("s").as("scatter"), col("worst_ratio"),
        col("db_index"))
      .orderBy("label")
  }
}
