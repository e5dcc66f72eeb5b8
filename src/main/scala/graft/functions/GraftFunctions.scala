package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

/** Column-API and SQL-registry surface for graft's native expressions.
  *
  * `import graft.functions.GraftFunctions._` for the Column wrappers;
  * `GraftFunctions.registerAll(spark)` to make them usable from
  * `spark.sql(...)` / `expr(...)` strings.
  */
object GraftFunctions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftSqlBridge.column(e)
  private def ex(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    GraftSqlBridge.expression(c)

  /** True haversine great-circle km (see [[HaversineKm]]). */
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    col(HaversineKm(ex(lat1.cast("double")), ex(lon1.cast("double")),
      ex(lat2.cast("double")), ex(lon2.cast("double"))))

  /** Portable polynomial rolling-hash fingerprint (see [[RollingHash]]). */
  def rolling_hash(s: Column): Column = col(RollingHash(ex(s.cast("string"))))

  /** Fused-pass cosine similarity over embedding arrays (see [[CosineSimilarity]]). */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(ex(a), ex(b)))

  /** Fused 16-slot MinHash signature over word 3-shingles (see [[MinHashSig]]). */
  def minhash_sig(s: Column, k: Int = 16): Column = col(MinHashSig(ex(s.cast("string")), k))

  /** Fused 16-bit SimHash over token hashes (see [[SimHash]]). */
  def simhash16(s: Column, k: Int = 16): Column = col(SimHash(ex(s.cast("string")), k))

  /** Register all graft expressions for SQL usage. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "haversine_km",
      es => HaversineKm(es(0), es(1), es(2), es(3)))
    GraftSqlBridge.registerFunction(spark, "rolling_hash", es => RollingHash(es.head))
    GraftSqlBridge.registerFunction(spark, "cosine_similarity",
      es => CosineSimilarity(es(0), es(1)))
    GraftSqlBridge.registerFunction(spark, "minhash_sig", es => MinHashSig(es.head))
    GraftSqlBridge.registerFunction(spark, "simhash16", es => SimHash(es.head))
  }
}
