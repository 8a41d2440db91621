package graft.plans

/** Bounding boxes for the xql custom geo predicates (`city = '…'`,
  * `country = '…'`), matching the reference's constants table
  * (xql/src/xql/constant.py:16-34). Boxes are (latMin, latMax, lonMin,
  * lonMax) in signed-longitude convention; xql converts negative longitudes
  * to 0..360 when the underlying grid needs it (xql/src/xql/where.py:152-153)
  * — see GeoFunctions.lonTo0360.
  */
object GeoConstants {
  final case class Box(latMin: Double, latMax: Double, lonMin: Double, lonMax: Double)

  val countries: Map[String, Box] = Map(
    "india" -> Box(6.5546079, 35.4940095078, 68.1766451354, 97.4025614766),
    "canada" -> Box(41.6751050889, 83.23324, -140.99778, -52.6480987209),
    "japan" -> Box(31.0295791692, 45.5514834662, 129.408463169, 145.543137242),
    "united kingdom" -> Box(49.959999905, 58.6350001085, -7.57216793459, 1.68153079591),
    "south africa" -> Box(-34.8191663551, -22.0913127581, 16.3449768409, 32.830120477),
    "australia" -> Box(-44, -10, 113, 154),
    "united states" -> Box(24.396308, 49.384358, -125.0, -66.93457))

  val cities: Map[String, Box] = Map(
    "delhi" -> Box(28.404, 28.883, 76.838, 77.348),
    "new york" -> Box(40.4774, 40.9176, -74.2591, -73.7002),
    "san francisco" -> Box(37.6398, 37.9298, -122.5975, -122.3210),
    "los angeles" -> Box(33.7036, 34.3373, -118.6682, -118.1553),
    "london" -> Box(51.3849, 51.6724, -0.3515, 0.1482))

  def lookup(kind: String, name: String): Option[Box] = kind match {
    case "city" => cities.get(name.toLowerCase)
    case "country" => countries.get(name.toLowerCase)
    case _ => None
  }
}
