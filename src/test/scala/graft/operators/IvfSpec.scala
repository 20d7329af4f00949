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

  test("k-means training monotonically improves the spherical objective") {
    def objective(cs: Array[(Long, Seq[Double])]): Double = {
      val scored = cs.map { case (cid, cv) =>
        struct(coalesce(Similarity.cosine(Similarity.toDouble(col("embedding")),
          array(cv.map(lit): _*)), lit(-2.0)).as("sim"), lit(cid).as("cid"))
      }
      emb.select(array_max(array(scored.toIndexedSeq: _*)).getField("sim").as("s"))
        .agg(avg("s")).head().getDouble(0)
    }
    val init = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    val trained = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    assert(trained.length === 8)
    assert(trained.map(_._1).toSeq === (0L until 8L)) // stable cluster ids
    assert(objective(trained) >= objective(init) - 1e-9)
  }

  test("trained centroids slot into the same IVF plan; probe-all stays exact") {
    val q = Similarity.collectQueryVec(emb, 0)
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.bruteForceTopK(rest, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val centroids = Similarity.kmeansCentroids(rest, k = 8, iters = 3)
    val assigned = Similarity.ivfAssignWith(rest, centroids)
    val ivf = Similarity.ivfTopK(assigned, centroids, q, k = 10, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === exact)
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

  test("k-means join-path training equals the literal-expression path") {
    // the large-k broadcast-join packed argmax must train the IDENTICAL
    // quantizer (same rounded argmax, same 7-dp means) as the literal
    // expression path — forced on small data via the assignByJoin knob
    val expr = Similarity.kmeansCentroids(emb, k = 8, iters = 3,
      assignByJoin = Some(false))
    val joined = Similarity.kmeansCentroids(emb, k = 8, iters = 3,
      assignByJoin = Some(true))
    assert(expr.map(_._1).toSeq === joined.map(_._1).toSeq)
    expr.zip(joined).foreach { case ((_, a), (_, b)) => assert(a === b) }
    OperatorCaches.releaseAll()
  }
}
