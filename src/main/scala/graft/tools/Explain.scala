package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan inspector: prints the formatted physical plan for named catalog
  * queries (all queries when none named). Usage:
  *   runMain graft.tools.Explain <sfDir> [q1,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).headOption.map(_.split(",").map(_.trim).toSet)
    // a typo'd name silently explaining nothing defeats the tool's purpose
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[explain] no such query: $n")))
    val spark = GraftSession.local("graft-explain")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        println(s"\n================ $name ================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
