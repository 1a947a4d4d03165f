package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dist(lat1: Double, lng1: Double, lat2: Double, lng2: Double): Double =
    Seq((lat1, lng1, lat2, lng2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineMeters(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()

  test("haversine: zero distance for identical points") {
    assert(dist(45.0, 7.0, 45.0, 7.0) == 0.0)
  }

  test("haversine: quarter meridian ≈ 10,007.5 km (spherical model)") {
    val d = dist(0.0, 0.0, 90.0, 0.0)
    assert(math.abs(d - math.Pi / 2 * Geo.EarthRadiusM) < 1.0)
  }

  test("haversine: one degree of longitude at the equator ≈ 111.19 km") {
    val d = dist(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(d - Geo.EarthRadiusM * math.Pi / 180) < 1.0)
  }

  test("haversine is symmetric") {
    assert(dist(10.0, 20.0, -30.0, 40.0) == dist(-30.0, 40.0, 10.0, 20.0))
  }

  test("geoJsonPoint builds {coordinates:[lng,lat], type:Point}") {
    val json = Seq((51.5, -0.1)).toDF("lat", "lng")
      .select(to_json(Geo.geoJsonPoint(col("lat"), col("lng"))).as("j"))
      .as[String].head()
    assert(json == """{"coordinates":[-0.1,51.5],"type":"Point"}""")
  }

  test("cellToPseudoLatLng placeholder is null-safe and in-range (P8)") {
    val df = Seq(Some("8828308281fffff"), None).toDF("cell")
    val (lat, lng) = Geo.cellToPseudoLatLng(col("cell"))
    val rows = df.select(lat.as("lat"), lng.as("lng"))
      .as[(Option[Double], Option[Double])].collect()
    val (someLat, someLng) = (rows(0)._1.get, rows(0)._2.get)
    assert(someLat >= -90 && someLat <= 90 && someLng >= -180 && someLng <= 180)
    assert(rows(1) == ((None, None))) // null cell → null coords, no error
  }
}
