package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("every vector gets exactly one centroid; k centroids used") {
    val (assigned, centroids) = Similarity.ivfAssign(emb, k = 8)
    assert(centroids.length === 8)
    assert(assigned.count() === emb.count())
    val used = assigned.select("centroid_id").distinct().count()
    assert(used > 1 && used <= 8)
  }

  test("IVF top-k with generous probes recovers most of brute-force top-k") {
    val q = Similarity.collectQueryVec(emb, 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(rest, q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val (assigned, centroids) = Similarity.ivfAssign(rest, k = 8)
    val ivf = Similarity.ivfTopK(assigned, centroids, q, k = 10, nProbe = 6)
      .collect().map(_.getLong(0)).toSet
    // 6 of 8 cells probed → recall should be high on 500 random vectors
    assert((exact intersect ivf).size >= 6, s"recall too low: $exact vs $ivf")
  }

  test("probing all centroids equals brute force exactly") {
    val q = Similarity.collectQueryVec(emb, 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(rest, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (assigned, centroids) = Similarity.ivfAssign(rest, k = 8)
    val ivf = Similarity.ivfTopK(assigned, centroids, q, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === exact)
  }
}
