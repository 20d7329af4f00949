package graft.tools

import graft.GraftSession
import graft.operators.{MediaGen, Multimodal, OperatorCaches}
import graft.sources.Tables

/** Scale benchmark for the perceptual media near-dup pipelines at the
  * PRODUCTION radius (r ≤ 3) — the configuration the catalog's r = 6
  * planted-recall entries deliberately do not run at ×1000
  * (expectedHammingCandidates puts r = 6 at ~4.4e11 banded candidates on
  * 5M sketches; r = 3 is the measured-flat regime). Times encode → decode
  * → sketch → banded hamming join end-to-end per modality and prints one
  * JSON line each in the Bench convention.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<tier> runMain graft.tools.MediaScaleBench
  *        [maxHamming] [image|audio|both]
  */
object MediaScaleBench {
  def main(args: Array[String]): Unit = {
    val r = args.headOption.map(_.toInt).getOrElse(3)
    val which = args.lift(1).getOrElse("both")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      sys.error("set SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.builder("media-scale",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time(name: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val pairs = f().count()
      val ms = (System.nanoTime() - t0) / 1e6
      OperatorCaches.releaseAll()
      println(s"""{"metric":"${name}_r$r","value":${math.round(ms)},""" +
        s""""unit":"ms","pairs":$pairs,"sf":"${sfDir.split('/').last}"}""")
    }
    if (which == "both" || which == "image")
      time("media_image_neardup",
        () => Multimodal.imageNearDupPairs(MediaGen.imageItems(docs), maxHamming = r))
    if (which == "both" || which == "audio")
      time("media_audio_neardup",
        () => Multimodal.audioNearDupPairs(MediaGen.audioItems(docs), maxHamming = r))
    spark.stop()
  }
}
