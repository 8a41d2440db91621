package graft.sources

/** CF-convention time-coordinate units ("<unit> since <datetime>") — the
  * encoding every real netCDF/Zarr archive uses for its time axis (ERA5
  * netCDF downloads ship `hours since 1900-01-01 00:00:00.0`). The
  * reference reads these through xarray's decode_cf for free
  * (weather_mv/loader_pipeline/sinks.py engine dispatch); here the parsed
  * (base, seconds-per-unit) pair converts coordinate arrays to epoch
  * seconds ONCE at metadata load, so row building and predicate pruning
  * keep operating on plain epoch seconds.
  *
  * Calendar handling: only absent/standard/gregorian/proleptic_gregorian
  * calendars convert (Java epoch arithmetic is proleptic Gregorian, which
  * matches udunits for post-1582 bases — all operational archives).
  * Non-standard calendars (360_day, noleap, ...) are left as plain numeric
  * columns rather than decoded wrong.
  */
object CfTime {

  /** `toEpochSeconds(v) = base + v * perUnit`. */
  final case class Units(baseEpochSec: Double, secondsPerUnit: Double)
      extends Serializable {
    def toEpochSeconds(v: Double): Double = baseEpochSec + v * secondsPerUnit
    /** Already plain epoch seconds — conversion would be a no-op. */
    def isIdentity: Boolean = baseEpochSec == 0.0 && secondsPerUnit == 1.0
  }

  private val unitSeconds: Map[String, Double] = Map(
    "microsecond" -> 1e-6, "us" -> 1e-6,
    "millisecond" -> 1e-3, "msec" -> 1e-3, "ms" -> 1e-3,
    "second" -> 1.0, "sec" -> 1.0, "s" -> 1.0,
    "minute" -> 60.0, "min" -> 60.0,
    "hour" -> 3600.0, "hr" -> 3600.0, "h" -> 3600.0,
    "day" -> 86400.0, "d" -> 86400.0,
    "week" -> 604800.0)

  // "<unit>[s] since YYYY-M-D[ H:M[:S[.frac]]][ Z|UTC|+HH[:MM]]"
  private val Pattern =
    ("""^\s*([A-Za-z]+)\s+since\s+(\d{1,4})-(\d{1,2})-(\d{1,2})""" +
      """(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d+))?)?)?""" +
      """\s*(Z|UTC|[+-]\d{1,2}(?::?\d{2})?)?\s*$""").r

  private val okCalendars =
    Set("standard", "gregorian", "proleptic_gregorian")

  def parse(units: Option[String], calendar: Option[String]): Option[Units] = {
    if (!calendar.forall(c => okCalendars(c.trim.toLowerCase))) return None
    units.flatMap {
      case Pattern(unit, y, mo, d, h, mi, sec, frac, tz) =>
        // try the raw abbreviation BEFORE de-pluralizing: "s"/"ms"/"us"
        // would otherwise strip to non-units
        val lc = unit.toLowerCase
        unitSeconds.get(lc).orElse(unitSeconds.get(lc.stripSuffix("s")))
          .flatMap { perUnit =>
          try {
            val offSec = Option(tz).map(_.trim).filter(_.nonEmpty) match {
              case None | Some("Z") | Some("UTC") => 0
              case Some(o) =>
                val sign = if (o.startsWith("-")) -1 else 1
                val digits = o.drop(1).replace(":", "")
                val (hh, mm) =
                  if (digits.length <= 2) (digits.toInt, 0)
                  else (digits.dropRight(2).toInt, digits.takeRight(2).toInt)
                sign * (hh * 3600 + mm * 60)
            }
            val base = java.time.LocalDateTime.of(
              y.toInt, mo.toInt, d.toInt,
              Option(h).map(_.toInt).getOrElse(0),
              Option(mi).map(_.toInt).getOrElse(0),
              Option(sec).map(_.toInt).getOrElse(0))
              .toEpochSecond(java.time.ZoneOffset.ofTotalSeconds(offSec))
            val fracSec = Option(frac)
              .map(f => f.toDouble / math.pow(10.0, f.length)).getOrElse(0.0)
            Some(Units(base + fracSec, perUnit))
          } catch { case _: java.time.DateTimeException => None }
        }
      case _ => None
    }
  }

  /** Convert a coordinate vector in place-for-copy: identity units return
    * the input array untouched. */
  def convert(values: Array[Double], u: Option[Units]): Array[Double] =
    u match {
      case Some(cf) if !cf.isIdentity => values.map(cf.toEpochSeconds)
      case _ => values
    }
}
