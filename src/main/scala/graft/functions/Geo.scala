package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions.
  *
  * The reference computes witness-edge lengths with ArangoDB's
  * `GEO_DISTANCE(a, b)` (reference `src/arango_queries.py:152`) and converts
  * h3 cells to GeoJSON points with `h3.h3_to_geo` (reference
  * `src/blockchain_queries.py:124-128,149-152`). Haversine is pure column
  * arithmetic (stays inside whole-stage codegen — no UDF); cell decoding has
  * no Spark built-in and is isolated behind [[cellToPseudoLatLng]].
  */
object Geo {

  /** Mean Earth radius in meters (spherical model, same class of
    * approximation as Arango's GEO_DISTANCE haversine default).
    */
  val EarthRadiusM = 6371000.0

  /** Great-circle distance in meters between (lat1,lng1) and (lat2,lng2)
    * in degrees (F8). Composable built-ins only: codegen-friendly.
    */
  def haversineMeters(lat1: Column, lng1: Column, lat2: Column, lng2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLng = radians(lng2 - lng1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLng), 2.0)
    lit(2.0 * EarthRadiusM) * asin(least(lit(1.0), sqrt(a)))
  }

  /** GeoJSON Point struct `{coordinates: [lng, lat], type: "Point"}` —
    * the hotspot `geo_location` shape (reference
    * `src/blockchain_queries.py:126,150-152`). Null-safe per P8: null
    * coordinates produce a Point with null coordinate entries, matching the
    * reference's `except TypeError: None` path.
    */
  def geoJsonPoint(lat: Column, lng: Column): Column =
    struct(array(lng, lat).as("coordinates"), lit("Point").as("type"))

  /** Deterministic PSEUDO cell decode — explicitly NOT h3. Maps any cell id
    * to stable in-range coordinates (lat ∈ [-85, 85), lng ∈ [-175, 175))
    * via md5, null-safely (P8). It preserves the *pipeline contract* of the
    * reference's `h3_to_geo` call — fixed fan-in to [[geoJsonPoint]],
    * null cell → null coords — and is the single seam where a real
    * icosahedral decode (`com.uber:h3`'s `cellToLatLng`) drops in for
    * production; until that library is available, downstream geometry is
    * deterministic but geographically meaningless, and the DuckDB oracle
    * applies the identical formula.
    */
  def cellToPseudoLatLng(cell: Column): (Column, Column) = {
    val h = md5(cell)
    val lat = (conv(substring(h, 1, 8), 16, 10).cast("double") % 170.0) - 85.0
    val lng = (conv(substring(h, 9, 8), 16, 10).cast("double") % 350.0) - 175.0
    (when(cell.isNotNull, lat), when(cell.isNotNull, lng))
  }
}
