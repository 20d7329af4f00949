package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, OperatorCaches}
import graft.sources.Tables

/** Gate-sizing probe: prints the candidate-volume estimates the opt-in
  * pre-flight ceilings compare against, for a given data dir — the number
  * an operator re-runs when the gate's diagnosis says "reproduce this
  * estimate" while sizing maxDf / threshold / ceiling for a new corpus.
  * Usage: runMain graft.tools.Preflight <sfDir> [threshold]
  */
object Preflight {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(0.3)
    val spark = GraftSession.builder("graft-preflight",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val cont = Dedup.expectedContainmentCandidates(docs, threshold = threshold)
    println(s"PREFLIGHT containment t=$threshold $sfDir = $cont")
    OperatorCaches.releaseAll()
    spark.stop()
  }
}
