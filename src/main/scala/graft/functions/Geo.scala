package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions.
  *
  * The reference computes witness-edge lengths with ArangoDB's
  * `GEO_DISTANCE(a, b)` (reference `src/arango_queries.py:152`) and converts
  * h3 cells to GeoJSON points with `h3.h3_to_geo` (reference
  * `src/blockchain_queries.py:124-128,149-152`). Haversine is pure column
  * arithmetic (stays inside whole-stage codegen — no UDF); h3 decoding has
  * no Spark built-in and is isolated behind [[h3ToLatLng]].
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

  /** h3 cell → (lat, lng). The real decode (icosahedral IJK math, as in the
    * public h3 library the reference calls) is not available in this
    * container; this deterministic placeholder preserves the *pipeline
    * contract* — null-safe, fixed fan-in to [[geoJsonPoint]] — and is the
    * single seam where `com.uber:h3`'s `cellToLatLng` drops in for
    * production. Deterministic: derived from the md5 of the cell id.
    */
  def h3ToLatLng(cell: Column): (Column, Column) = {
    val h = md5(cell)
    val lat = (conv(substring(h, 1, 8), 16, 10).cast("double") % 170.0) - 85.0
    val lng = (conv(substring(h, 9, 8), 16, 10).cast("double") % 350.0) - 175.0
    (when(cell.isNotNull, lat), when(cell.isNotNull, lng))
  }
}
