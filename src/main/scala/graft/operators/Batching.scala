package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Grouping / batching / chunked-sink operators (SURVEY §2.6, §2.2).
  *
  * The reference's signature pattern: fixed-count 200-image micro-batches
  * (reference: Image_Train_Model/process_test_train_Images.py:49-64),
  * 10^6-row CSV chunks (split and upload/split_csv_script.py:30-40) and a
  * 1 GiB running-byte-budget splitter
  * (split and upload/split_image_Script.py:22-54).
  *
  * Two tiers:
  *  - *analytic* batch-id assignment (window over an explicit order) for
  *    when batch membership must be a queryable column;
  *  - *physical* chunked writes via `maxRecordsPerFile` — the scalable path
  *    (no global sort, files sized by the committer).
  */
object Batching {

  /** G1 — fixed-count micro-batch id over an explicit total order
    * (process_test_train_Images.py:49). NOTE: an unpartitioned row_number is
    * a single-partition sort; use only when batch ids must be globally
    * consecutive (else prefer [[writeChunked]]). */
  def microBatchId(df: DataFrame, orderCols: Seq[String], batchSize: Int,
                   out: String = "batch_id"): DataFrame =
    df.withColumn(out,
      floor((row_number().over(Window.orderBy(orderCols.map(col): _*)) - 1)
        .cast("double") / batchSize).cast("long"))

  /** G3 — running byte-budget chunk id (split_image_Script.py:22-54): row
    * size is estimated (the reference's `sum(len(str(v)))+1`, :35),
    * cumulated in order, bucketed by `floor((cum-1)/budget)`.
    *
    * Deliberate deviation: the reference cuts greedily BEFORE overflow
    * (stateful scan, inherently sequential); the cumulative-sum bucketing is
    * the parallelizable form and may overshoot a bucket by at most one row's
    * bytes — irrelevant at a 1 GiB budget, and the same formula is what the
    * DuckDB oracle computes, so parity holds by construction. */
  def byteBudgetChunkId(df: DataFrame, orderCols: Seq[String],
                        budgetBytes: Long, sizeCols: Seq[String],
                        out: String = "chunk_id"): DataFrame = {
    val rowBytes = sizeCols
      .map(c => length(col(c).cast("string")))
      .reduce(_ + _) + lit(1)
    val w = Window.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_row_bytes", rowBytes.cast("long"))
      .withColumn(out, floor((sum(col("_row_bytes")).over(w) - 1)
        .cast("double") / budgetBytes).cast("long"))
      .drop("_row_bytes")
  }

  /** G1/G2/K1/K3/K4 physical form — chunked parquet/csv write without any
    * global sort: `maxRecordsPerFile` bounds records per output file the way
    * the reference bounds images per `.pt` (200) and rows per CSV chunk
    * (10^6). This is the 100-TB path. */
  def writeChunked(df: DataFrame, path: String, maxRecordsPerFile: Long,
                   format: String = "parquet"): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .format(format).save(path)

  /** K1 — header'd CSV chunk write (split_csv_script.py:36-40). */
  def writeCsvChunks(df: DataFrame, path: String, maxRecordsPerFile: Long): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("header", "true").csv(path)

  /** A5/O3 — resumable next-chunk number: `max(existing)+1` with default 0
    * (split_image_Script.py:13-20). */
  def nextChunkNumber(existing: DataFrame, c: String): Long =
    existing.agg(coalesce(max(col(c)), lit(-1L)) + 1L).collect()(0).getLong(0)
}
