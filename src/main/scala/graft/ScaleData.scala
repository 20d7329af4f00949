package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-test data amplifier: writes a `factor`-times copy of a testdata
  * tier, for scale-proofing the catalog beyond the largest generated tier
  * (the driver ships sf0.001/0.01/0.1; ×10 of sf0.1 ≈ sf1).
  *
  * Replication preserves the properties the operators' cost models depend
  * on, rather than stamping identical rows:
  *  - Every key column shifts by replica × 10^8, ACROSS tables consistently
  *    (l_orderkey moves with o_orderkey, o_custkey with c_custkey...), so
  *    join fan-outs and key cardinalities scale linearly instead of
  *    overlapping 10 replicas onto the same keys.
  *  - Document text is re-lettered per replica (a caesar rotation via
  *    translate): each replica keeps the original's INTERNAL near/exact-dup
  *    structure — so dup pairs grow linearly, like a real 10× corpus —
  *    while replicas never near-match each other (appending a marker token
  *    instead would make every doc a J≈1 near-dup of its 9 siblings and
  *    blow candidate generation up quadratically, which no honest 10×
  *    corpus does). Pure-digit tokens survive rotation unchanged; that
  *    trickle of cross-replica shared grams is harmless.
  *  - Embeddings rotate component-wise per replica: norms and within-
  *    replica geometry are preserved, cross-replica cosine structure is
  *    scrambled, and vector count × 10.
  *  - Dimension tables (region, nation) stay as-is — dims don't grow with
  *    fact data.
  * Replica 0 is bit-identical to the source, so id-addressed queries
  * (collectQueryVec(id=1), derived re-crawl batches) keep their anchors.
  *
  * Usage: runMain graft.ScaleData <srcDir> <outDir> [factor]
  */
object ScaleData {

  private val Stride = 100000000L // replica key offset; source keys are << 10^8

  private def shifted(c: String, r: Int): Column =
    (col(c) + lit(r * Stride)).as(c)

  /** Per-replica caesar rotation over letters (digits/punct untouched).
    * Rotation keys repeat with period 26, so distinct replicas are only
    * guaranteed distinct text for factor ≤ 26 — enforced in main (a repeat
    * would make replica r+26 an exact cross-replica duplicate of replica r
    * and quietly break the linear-dup-growth invariant).
    */
  private def relettered(c: String, r: Int): Column =
    if (r == 0) col(c)
    else {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val k = (r - 1) % 25 + 1
      translate(col(c), lower + upper,
        lower.drop(k) + lower.take(k) + upper.drop(k) + upper.take(k)).as(c)
    }

  /** Rotate an array column left by r positions (norm-preserving). */
  private def rotated(c: String, r: Int, dim: Int): Column = {
    val k = r % dim
    if (k == 0) col(c)
    else concat(slice(col(c), k + 1, dim - k), slice(col(c), 1, k)).as(c)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // caesar keys repeat past 26 replicas → exact cross-replica text dups
    // → quadratic dup-pair growth the amplifier exists to avoid
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (got $factor): re-lettering keys repeat past 26")
    val spark = GraftSession.builder("graft-scaledata",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key columns per table; everything else copies through unchanged
    val keyCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    def replica(df: DataFrame, table: String, r: Int, embDim: Int): DataFrame = {
      val keys = keyCols(table)
      df.select(df.columns.map {
        case c if keys.contains(c) => shifted(c, r)
        case "text" if table == "documents" => relettered("text", r)
        case "embedding" if table == "embeddings" => rotated("embedding", r, embDim)
        case c => col(c)
      }.toIndexedSeq: _*)
    }

    for (table <- keyCols.keys.toSeq.sorted) {
      // raw read (no ts repair) so the scaled files keep the source schema
      val base = spark.read.parquet(s"$src/$table.parquet")
      // rotation dim comes from the DATA, not a constant: a hardcoded 64
      // against a different-width embedding column would silently slice
      // short/misrotated vectors into every replica
      val embDim =
        if (table == "embeddings") base.select(size(col("embedding"))).head().getInt(0)
        else 0
      val scaledUp = (0 until factor).map(replica(base, table, _, embDim))
        .reduce(_ unionByName _)
      scaledUp.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scale] $table x$factor")
    }
    for (dim <- Seq("nation", "region")) {
      spark.read.parquet(s"$src/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")
      println(s"[scale] $dim (dim, unscaled)")
    }
    println(s"[scale] wrote $out")
    spark.stop()
  }
}
