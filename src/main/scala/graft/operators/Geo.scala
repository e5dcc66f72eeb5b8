package graft.operators

import graft.functions.GraftFunctions.haversine_km
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Geospatial distance operators (SURVEY §2.7 F7, §2.5 A8).
  *
  * The reference's evaluation metric is labelled "Haversine Distance" but is
  * computed as Euclidean distance on (scaled) degrees
  * (reference: model_architecture.py:119 vs label :154). We ship both: the
  * Euclidean form for reference parity and true haversine (native codegen'd
  * expression, [[graft.functions.HaversineKm]]) for correct semantics.
  */
object Geo {

  /** F7 (reference-faithful) — `sqrt((x1-x2)^2 + (y1-y2)^2)` on degrees.
    * Squares via multiplication, not `pow` — bit-reproducible across engines. */
  def euclideanDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt((lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2))

  /** F7 (corrected) — great-circle km. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversine_km(lat1, lon1, lat2, lon2)

  /** A8 — the flagship geolocation-error report: mean/max distance between
    * predicted and actual coordinates per group
    * (model_architecture.py:113-121 evaluation loop, distilled to one
    * aggregate). Distances are computed row-wise inside whole-stage codegen;
    * the aggregate is a partial-final hash agg — one shuffle of |groups|.
    */
  def errorReport(df: DataFrame, groupCols: Seq[String],
                  latP: Column, lonP: Column, latA: Column, lonA: Column): DataFrame = {
    val km = haversineKm(latP, lonP, latA, lonA)
    val deg = euclideanDeg(latP, lonP, latA, lonA)
    df.withColumn("_km", km).withColumn("_deg", deg)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("_km")), 4).as("mean_km"),
        round(max(col("_km")), 4).as("max_km"),
        round(min(col("_km")), 4).as("min_km"),
        round(avg(col("_deg")), 4).as("mean_deg"))
  }
}
