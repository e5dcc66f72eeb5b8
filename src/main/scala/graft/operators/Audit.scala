package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-quality audit operators (SURVEY §2.5 A1/A2).
  *
  * The reference audits per-column null counts before and after cleaning and
  * hard-asserts zero missing values before the sink
  * (reference: Image_Train_Model/read_csv_s3_train.py:86-94,112-116,137-139).
  * Each audit here is one hash-aggregate pass — no per-column jobs, no
  * collect of data rows.
  */
object Audit {

  /** A1 — single-row frame of per-column null counts, one agg pass. */
  def nullCounts(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("_rows"),
      df.columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*)

  /** A1 (long form) — `(column, n_null)` rows; drops the `_rows` helper. */
  def nullCountsLong(df: DataFrame): DataFrame = {
    val wide = nullCounts(df)
    val stack = df.columns
      .map(c => s"'$c', `$c`")
      .mkString(s"stack(${df.columns.length}, ", ", ", ") as (column, n_null)")
    wide.selectExpr(stack)
  }

  /** A2 — total null count across all columns (the reference's
    * `isna().sum().sum()` assert input). */
  def totalNulls(df: DataFrame): Long = {
    val row = nullCounts(df).drop("_rows").collect()(0)
    (0 until row.length).map(i => row.getLong(i)).sum
  }

  /** A2 — the reference's pre-sink hard assertion (read_csv_s3_train.py:137-139). */
  def assertNoNulls(df: DataFrame): Unit = {
    val n = totalNulls(df)
    require(n == 0, s"Dataset contains $n missing values after cleaning")
  }

  /** §5.1 row 2 — write-then-reload round-trip verification: persist to
    * parquet, re-read, check row count and schema echo. Returns the re-read
    * frame for further assertions. */
  def roundTrip(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    require(back.count() == df.count(), s"round-trip row-count mismatch at $path")
    back
  }
}
