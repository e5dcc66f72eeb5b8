package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Join / set / order operators (SURVEY §2.4, §2.9, §2.10).
  *
  * The reference has no relational join; its joins are positional — align by
  * row index (reference: model_architecture.py:66-73) or cyclic modulo
  * assignment (:140-147). Those reduce to equi-joins once an index column is
  * explicit, and Spark then picks broadcast/sort-merge via AQE.
  */
object Relational {

  /** Attach a dense 0-based row index following `orderCols`.
    *
    * Scalable form of `row_number() OVER (ORDER BY …)`: sort (range
    * partitioned, stays distributed), then `zipWithIndex` — which needs only
    * per-partition counts, not a single-partition window. Values equal the
    * window form exactly, so oracle SQL can still use `row_number()-1`.
    */
  def withRowIndex(df: DataFrame, orderCols: Seq[String],
                   out: String = "idx"): DataFrame = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** J1 — positional equi-join: index both sides by their own order, join on
    * the index (model_architecture.py:66-73 `__getitem__` alignment). */
  def positionalJoin(left: DataFrame, leftOrder: Seq[String],
                     right: DataFrame, rightOrder: Seq[String]): DataFrame =
    withRowIndex(left, leftOrder).join(withRowIndex(right, rightOrder), "idx")

  /** J2 — cyclic/round-robin modulo assignment: pair item i of `big` with
    * item (i mod |small|) of `small` (model_architecture.py:140-147). The
    * small side is broadcast — no shuffle of the big side. */
  def moduloJoin(big: DataFrame, bigOrder: Seq[String],
                 small: DataFrame, smallOrder: Seq[String]): DataFrame = {
    val smallIdx = withRowIndex(small, smallOrder)
    val n = smallIdx.count()
    withRowIndex(big, bigOrder)
      .withColumn("idx", col("idx") % lit(n))
      .join(broadcast(smallIdx), "idx")
  }

  /** O3 — top-k with deterministic tie-break; plans as
    * TakeOrderedAndProject (per-partition heap + driver merge, no full sort). */
  def topK(df: DataFrame, k: Int, sortCols: org.apache.spark.sql.Column*): DataFrame =
    df.orderBy(sortCols: _*).limit(k)

  /** U1 — union-all of homogeneous frames by column name; replaces the
    * reference's driver-side `pd.concat` materialization
    * (read_csv_s3_train.py:122-134) with one lazy plan. */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** O4 — seeded random split (Best-Model-architecture-for-local.py:106-109).
    * Deterministic per seed; excluded from the oracle (SURVEY §7.4.4). */
  def randomSplit(df: DataFrame, weights: Array[Double], seed: Long): Array[DataFrame] =
    df.randomSplit(weights, seed)

  /** Skew-resistant equi-join: salt the skewed (big) side's key into
    * `salts` sub-keys and replicate the small side across all salt values,
    * spreading a hot key over `salts` reducers. Use when AQE's runtime
    * skew-split isn't available (e.g., the skew is in a non-shuffle child).
    * Semantics identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
