package graft.meta

import org.apache.spark.sql.types._

/** Declared schemas.
  *
  * `osv5m` mirrors the reference's explicit 32-column dtype map for the
  * OSV5M metadata CSV (reference: Image_Train_Model/read_csv_s3_train.py:11-44).
  * The reference passes a pandas dtype dict to `read_csv` to disable type
  * re-inference (`low_memory=False`, :51); the Spark-native equivalent is an
  * explicit `StructType` handed to `spark.read.schema(...)` — never
  * `inferSchema` (one extra full pass at 100 TB).
  *
  * Testdata schemas (FIXTURES.md §A) are self-describing parquet; no
  * StructType needed there.
  */
object Schemas {

  /** pandas `Int64` (nullable int) → LongType nullable; `string` → StringType;
    * `int64`/`float64` → Long/Double. Column order follows the reference map.
    */
  val osv5m: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("thumb_original_url", StringType),
    StructField("country", StringType),
    StructField("sequence", StringType),
    StructField("captured_at", LongType), // Unix epoch millis
    StructField("lon_bin", LongType),
    StructField("lat_bin", LongType),
    StructField("cell", StringType),
    StructField("region", StringType),
    StructField("sub-region", StringType),
    StructField("city", StringType),
    StructField("land_cover", LongType),
    StructField("road_index", DoubleType),
    StructField("drive_side", LongType),
    StructField("climate", LongType),
    StructField("soil", LongType),
    StructField("dist_sea", DoubleType),
    StructField("quadtree_10_5000", LongType),
    StructField("quadtree_10_25000", LongType),
    StructField("quadtree_10_1000", LongType),
    StructField("quadtree_10_50000", LongType),
    StructField("quadtree_10_12500", LongType),
    StructField("quadtree_10_500", LongType),
    StructField("quadtree_10_2500", LongType),
    StructField("unique_region", StringType),
    StructField("unique_sub-region", StringType),
    StructField("unique_city", StringType),
    StructField("unique_country", StringType),
    StructField("creator_username", StringType),
    StructField("creator_id", StringType),
  ))

  /** NA tokens the reference maps to null at scan time
    * (read_csv_s3_train.py:52 `na_values=["", " ", "NA", "NULL"]`). */
  val osv5mNaTokens: Seq[String] = Seq("", " ", "NA", "NULL")

  /** Categorical columns the reference trims + label-encodes
    * (read_csv_s3_train.py:68-69, 96-100). */
  val osv5mCategoricals: Seq[String] =
    Seq("country", "region", "sub-region", "city", "unique_country")

  /** Columns the reference forward/backward-fills (read_csv_s3_train.py:77-80). */
  val osv5mFfillCols: Seq[String] = Seq(
    "region", "sub-region", "city",
    "unique_region", "unique_sub-region", "unique_city", "unique_country")

  /** Continuous columns the reference standard-scales (read_csv_s3_train.py:106-109). */
  val osv5mScaleCols: Seq[String] =
    Seq("latitude", "longitude", "dist_sea", "road_index")
}
