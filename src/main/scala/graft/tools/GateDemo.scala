package graft.tools

import graft.GraftSession
import graft.queries.QueryCatalog

/** Demonstrates a pre-flight gate at scale: runs a named catalog entry
  * against a data dir, times it, and prints either the success row count
  * or the gate's sized diagnosis — the artifact row for "fails fast in
  * milliseconds instead of timing out in an hour".
  *
  * Usage: runMain graft.tools.GateDemo <queryName> <dataDir>
  */
object GateDemo {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateDemo <queryName> <dataDir>")
    val (name, dir) = (args(0), args(1))
    val q = QueryCatalog.all.find(_.name == name)
      .getOrElse(sys.error(s"no catalog entry named $name"))
    val spark = GraftSession.builder("gate-demo",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    try {
      val n = q.fn(spark, dir).count()
      val ms = (System.nanoTime() - t0) / 1e6
      println(s"""{"gate":"$name","outcome":"ran","ms":${math.round(ms)},""" +
        s""""rows":$n,"dir":"$dir"}""")
    } catch {
      case e: IllegalArgumentException =>
        val ms = (System.nanoTime() - t0) / 1e6
        val msg = e.getMessage.replace("\"", "'").replace("\n", " ")
        println(s"""{"gate":"$name","outcome":"failed_fast",""" +
          s""""ms":${math.round(ms)},"diagnosis":"$msg","dir":"$dir"}""")
    } finally spark.stop()
  }
}
