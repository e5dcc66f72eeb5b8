package graft.plans

import graft.functions.{CosineSimilarity, HaversineKm, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer: makes graft's native expressions
  * available to pure-SQL sessions via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — no code changes in
  * the consuming application, the idiomatic way to ship engine extensions
  * to a shared cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("haversine_km"),
      new ExpressionInfo(classOf[HaversineKm].getName, "haversine_km"),
      es => HaversineKm(es(0), es(1), es(2), es(3))))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      es => RollingHash(es.head)))
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      es => CosineSimilarity(es(0), es(1))))
  }
}
