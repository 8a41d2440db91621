package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column expressions re-expressing the reference mover's geo
  * helpers as pure Catalyst expressions (codegen-friendly, no UDFs).
  *
  * Reference semantics:
  *  - geo point GeoJSON: weather_mv/loader_pipeline/bq.py:483-490
  *  - grid-cell polygon with half-resolution offsets, pole/antimeridian
  *    clamping: bq.py:493-563
  *  - longitude sanitize to [-180, 180): bq.py:219
  *  - grid resolution inference from coordinate extent: bq.py:248-264
  *  - xql custom-coord convention converts negative lon to 0..360 instead
  *    (xql/src/xql/where.py:152-153) — two conventions, kept separate.
  */
object GeoFunctions {

  /** `((lon % 360) + 540) % 360 - 180` — normalize any longitude into
    * [-180, 180). bq.py:219. Spark and ANSI SQL `%` both take the sign of
    * the dividend, so the double-mod trick is portable. */
  def sanitizeLon(lon: Column): Column =
    (((lon % 360) + 540) % 360) - 180

  /** xql's convention: negative longitude -> 0..360 (where.py:152-153). */
  def lonTo0360(lon: Column): Column =
    when(lon < 0, lon + 360).otherwise(lon)

  /** Valid WGS84 point predicate (bq.py:484-486 range checks). */
  def isValidPoint(lat: Column, lon: Column): Column =
    lat.between(-90, 90) && lon.between(-180, 180)

  /** Double -> string for GeoJSON payloads. Rounded to 6 dp (≈0.1 m) first so
    * the rendered text is identical across engines (both Spark and DuckDB
    * render shortest-round-trip decimals; rounding removes the long-tail
    * binary artifacts like 40.075000000000003). */
  private def d2s(c: Column): Column = round(c.cast("double"), 6).cast("string")

  /** GeoJSON `Point` string, `{"type": "Point", "coordinates": [lon, lat]}`
    * (bq.py:483-490; coordinates are [longitude, latitude] per GeoJSON).
    * NULL outside the valid range, mirroring the reference's error path. */
  def geoPointJson(lat: Column, lon: Column): Column =
    when(isValidPoint(lat, lon),
      concat(lit("{\"type\": \"Point\", \"coordinates\": ["),
        d2s(lon), lit(", "), d2s(lat), lit("]}")))

  /** Clamp a polygon corner latitude at the poles and wrap longitude across
    * the antimeridian (bq.py:516-563 `bound_point`). */
  def boundLat(lat: Column): Column = greatest(lit(-90.0), least(lit(90.0), lat))
  def wrapLon(lon: Column): Column =
    when(lon < -180, lon + 360).when(lon > 180, lon - 360).otherwise(lon)

  /** GeoJSON closed-ring grid-cell polygon around (lat, lon) with
    * half-resolution offsets (bq.py:493-514: corners at lat±latRes, lon±lonRes
    * where the caller passes half the grid step — see gridResolution). Ring
    * order follows the reference: (low,low) (low,high) (high,high) (high,low)
    * back to (low,low), as [lon, lat] pairs. */
  def geoPolygonJson(lat: Column, lon: Column, latRes: Column, lonRes: Column): Column = {
    val latLo = boundLat(lat - latRes)
    val latHi = boundLat(lat + latRes)
    val lonLo = wrapLon(lon - lonRes)
    val lonHi = wrapLon(lon + lonRes)
    def pt(lo: Column, la: Column): Column =
      concat(lit("["), d2s(lo), lit(", "), d2s(la), lit("]"))
    concat(
      lit("{\"type\": \"Polygon\", \"coordinates\": [["),
      pt(lonLo, latLo), lit(", "),
      pt(lonHi, latLo), lit(", "),
      pt(lonHi, latHi), lit(", "),
      pt(lonLo, latHi), lit(", "),
      pt(lonLo, latLo),
      lit("]]}"))
  }

  /** Half grid resolution from a coordinate column's extent:
    * `(max-min)/count/2` over the distinct values (bq.py:248-264 uses
    * `ptp(lat)/len(lat)/2` on the sample file's coordinate vector). Returns a
    * one-row DataFrame aggregate expression. */
  def halfResolution(coord: Column): Column =
    (max(coord) - min(coord)) / count_distinct(coord) / 2
}
