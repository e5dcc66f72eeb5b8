package graft.plans

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer: makes graft's native expressions
  * available to pure-SQL sessions via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — no code changes in
  * the consuming application, the idiomatic way to ship engine extensions
  * to a shared cluster. Shares the builder list (with its input coercion)
  * with `GraftFunctions.registerAll`, so the two registration paths can't
  * drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
