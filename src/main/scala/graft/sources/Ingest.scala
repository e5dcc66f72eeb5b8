package graft.sources

import graft.meta.Schemas
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scan/source operators (SURVEY §2.1).
  *
  * The reference reads CSVs in bounded-memory chunks with explicit dtypes
  * and NA tokens (reference: Image_Train_Model/read_csv_s3_train.py:47-53),
  * splits raw CSVs by row/byte budget (the "split and upload" scripts), and lists +
  * suffix-filters object stores (model_architecture.py:27-30). Spark
  * subsumes chunking with partitioned FileScan: a "chunk" is a split, and
  * memory stays bounded by partition size, not file size.
  */
object Ingest {

  /** S2 — typed, null-aware CSV scan: explicit schema (never inferSchema —
    * that is a second full pass over 100 TB), the reference's NA tokens,
    * permissive mode. With `corruptColumn` set, malformed rows additionally
    * land verbatim in that column (audit-able, routable) — the reference's
    * per-row try/except skip with a paper trail
    * (process_test_train_Images.py:57-58); without it they parse to nulls.
    */
  def csvTyped(spark: SparkSession, path: String, schema: StructType,
               naTokens: Seq[String] = Schemas.osv5mNaTokens,
               corruptColumn: Option[String] = None): DataFrame = {
    val readSchema = corruptColumn match {
      case Some(c) => StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))
      case None => schema
    }
    val reader = spark.read
      .schema(readSchema)
      .option("header", "true")
      .option("nullValue", naTokens.headOption.getOrElse(""))
      .option("mode", "PERMISSIVE")
    corruptColumn.foreach(c => reader.option("columnNameOfCorruptRecord", c))
    reader.csv(path)
  }

  /** S2 (post-scan NA normalization) — pandas `na_values` accepts a token
    * LIST; Spark CSV takes one `nullValue`, so remaining tokens are mapped
    * post-scan. Only needed for string columns; typed columns fail-to-null
    * in PERMISSIVE mode already. */
  def normalizeNaTokens(df: DataFrame, tokens: Seq[String]): DataFrame =
    graft.operators.Clean.sentinelsToNull(
      df,
      df.schema.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq,
      tokens)

  /** [[csvTyped]]'s JSONL twin — the LLM-corpus interchange format (one
    * JSON object per line ⇒ line-splittable, so partitioned FileScan
    * bounds memory exactly as with CSV): explicit schema (inference is a
    * second full pass over 100 TB), permissive mode, optional verbatim
    * corrupt-record capture. Reads what [[graft.operators.Batching
    * .writeJsonlShards]] writes — the round trip IS the shard-handoff
    * contract. */
  def jsonlTyped(spark: SparkSession, path: String, schema: StructType,
                 corruptColumn: Option[String] = None): DataFrame = {
    val readSchema = corruptColumn match {
      case Some(c) => StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))
      case None => schema
    }
    val reader = spark.read.schema(readSchema).option("mode", "PERMISSIVE")
    corruptColumn.foreach(c => reader.option("columnNameOfCorruptRecord", c))
    reader.json(path)
  }

  /** S1/S3 — plain header'd CSV scan (split_csv_script.py:33-35). */
  def csvWithHeader(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** S4/S8 — binary-file scan with pushed-down path filtering: the
    * reference's `.endswith('.zip')` suffix filter becomes `pathGlobFilter`,
    * applied at listing time (never fetches non-matching objects — the
    * 100-TB analogue of not GETing the object at all). Returns
    * (path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** S8 — file-listing scan as a DataFrame (path, length, modified), sorted
    * for the reference's deterministic processing order
    * (model_architecture.py:30 `sorted(...)`). */
  def listFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    binaryFiles(spark, dir, glob)
      .select(col("path"), col("length"), col("modificationTime"))
      .orderBy("path")

  /** P3 — suffix predicate on an already-scanned path column
    * (Upload_Zip_S3.py:28, process_test_train_Images.py:42). */
  def filterSuffix(df: DataFrame, pathCol: String, suffixes: Seq[String]): DataFrame = {
    // an empty list would crash reduce with an opaque error; a caller with
    // a config-driven list that resolved empty should hear it plainly
    require(suffixes.nonEmpty, "filterSuffix needs at least one suffix")
    df.where(suffixes.map(sfx => col(pathCol).endsWith(sfx)).reduce(_ || _))
  }
}
