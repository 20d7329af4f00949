package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graftnative.CosineSimilarity

/** SparkSessionExtensions entry point — the supported way to ship graft's
  * native expressions into any session (including spark-submit jobs that
  * never touch graft code directly):
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * Registers `cosine_sim(array<double>, array<double>) → double` as a
  * permanent builtin-like function (available to pure-SQL users, unlike the
  * per-session temp registration in CosineSimilarity.register).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graftnative.VectorOpRewrites)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graftnative.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity.build(exprs)))
  }
}
