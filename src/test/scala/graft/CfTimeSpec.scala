package graft

import org.apache.spark.sql.functions._

import graft.sources.CfTime

class CfTimeSpec extends SparkSpec {
  import spark.implicits._

  private def epoch(s: String): Long =
    java.time.LocalDateTime.parse(s).toEpochSecond(java.time.ZoneOffset.UTC)

  test("CF units strings parse across units, base dates, fractions, zones") {
    // ERA5's exact units string
    val era5 = CfTime.parse(Some("hours since 1900-01-01 00:00:0.0"), None).get
    assert(era5.secondsPerUnit == 3600.0)
    assert(era5.baseEpochSec == epoch("1900-01-01T00:00:00").toDouble)
    assert(era5.toEpochSeconds(876576.0) ==
      epoch("2000-01-01T00:00:00").toDouble) // 876576 h = 36524 d = 1900 -> 2000

    assert(CfTime.parse(Some("days since 2000-1-2"), Some("gregorian")).get
      .toEpochSeconds(1.5) == epoch("2000-01-03T12:00:00").toDouble)
    assert(CfTime.parse(Some("minutes since 2026-01-02 03:04:05Z"), None).get
      .toEpochSeconds(2.0) == epoch("2026-01-02T03:06:05").toDouble)
    // offset zones shift the base
    assert(CfTime.parse(Some("seconds since 1970-01-01 01:00:00 +01:00"), None)
      .get.baseEpochSec == 0.0)
    assert(CfTime.parse(Some("seconds since 1970-01-01 00:00:00 -0230"), None)
      .get.baseEpochSec == 2.5 * 3600)
    // fractional base seconds survive
    assert(CfTime.parse(Some("seconds since 1970-01-01 00:00:00.25"), None)
      .get.baseEpochSec == 0.25)
    // the identity spelling is recognized as such
    assert(CfTime.parse(Some("seconds since 1970-01-01"), None).get.isIdentity)
  }

  test("unsupported calendars and non-time units stay numeric") {
    // unknown calendar names stay numeric instead of decoding wrong
    assert(CfTime.parse(Some("hours since 1900-01-01"), Some("weird_cal")).isEmpty)
    assert(CfTime.parse(Some("K"), None).isEmpty)
    assert(CfTime.parse(Some("degrees_north"), None).isEmpty)
    assert(CfTime.parse(Some("fortnights since 2000-01-01"), None).isEmpty)
    assert(CfTime.parse(Some("hours since 2000-13-40"), None).isEmpty)
    assert(CfTime.parse(None, None).isEmpty)
    // standard calendars pass
    assert(CfTime.parse(Some("hours since 1900-01-01"),
      Some("proleptic_gregorian")).isDefined)
  }

  test("NetCDF-3 ERA5-style hours-since-1900 time axis decodes to timestamps") {
    import graft.sources.netcdf.{NetCDF3, NetCDF3Reader, NetCDF3Writer => NW}
    val dir = java.nio.file.Files.createTempDirectory("cft3").toString
    val path = s"$dir/era5ish.nc"
    // 2020-01-01 .. +2 h steps, as hours since 1900
    val base = 1051896.0 // hours from 1900-01-01 to 2020-01-01
    NW.write(path,
      dims = Seq(NW.DimSpec("time", 3, record = true), NW.DimSpec("x", 2)),
      vars = Seq(
        NW.VarSpec("time", Seq("time"), NetCDF3.NC_DOUBLE,
          Seq(base, base + 2, base + 4),
          attrs = Seq("units" -> "hours since 1900-01-01 00:00:0.0",
            "calendar" -> "gregorian")),
        NW.VarSpec("x", Seq("x"), NetCDF3.NC_DOUBLE, Seq(0.0, 1.0)),
        NW.VarSpec("t2m", Seq("time", "x"), NetCDF3.NC_DOUBLE,
          (0 until 6).map(_.toDouble))))
    val df = NetCDF3Reader.readLongFormat(spark, path)
    assert(df.schema("time").dataType.typeName == "timestamp_ntz")
    val times = df.select(date_format($"time", "yyyy-MM-dd HH:mm:ss"))
      .distinct().as[String].collect().sorted.toSeq
    assert(times == Seq("2020-01-01 00:00:00", "2020-01-01 02:00:00",
      "2020-01-01 04:00:00"))
  }

  test("netCDF-4 days-since axis and Zarr minutes-since axis decode alike") {
    import graft.sources.hdf5.{Hdf5Writer => HW}
    import graft.sources.netcdf.NetCDF4Reader
    val dir = java.nio.file.Files.createTempDirectory("cft4").toString
    val p4 = s"$dir/d.nc"
    HW.write(p4, Seq(
      HW.VarSpec("time", Seq("time"), Seq(2), Seq(7305.0, 7306.5),
        units = Some("days since 2000-01-01")),
      HW.VarSpec("v", Seq("time"), Seq(2), Seq(1.0, 2.0))))
    val df4 = NetCDF4Reader.readLongFormat(spark, p4)
    val t4 = df4.select(date_format($"time", "yyyy-MM-dd HH:mm"))
      .as[String].collect().sorted.toSeq
    assert(t4 == Seq("2020-01-01 00:00", "2020-01-02 12:00"))

    import graft.sources.zarr.{ZarrWriter => ZW}
    val zs = s"$dir/z.zarr"
    ZW.write(zs, Seq(
      ZW.VarSpec("time", Seq("time"), Seq(2), Seq(2), data = Seq(0.0, 90.0),
        units = Some("minutes since 2026-01-02 03:00:00")),
      ZW.VarSpec("temp", Seq("time"), Seq(2), Seq(2), data = Seq(5.0, 6.0))))
    val dfz = spark.read.format("zarr").load(zs)
    val tz = dfz.select(date_format($"time", "yyyy-MM-dd HH:mm"))
      .as[String].collect().sorted.toSeq
    assert(tz == Seq("2026-01-02 03:00", "2026-01-02 04:30"))
    // time pruning still works on the converted axis
    assert(dfz.filter($"time" > java.sql.Timestamp.valueOf("2026-01-02 04:00:00"))
      .count() == 1)
  }

  test("fixed-length CF calendars decode to field-preserving timestamps") {
    // CMIP noleap: day 59 of the model year is Mar 1 (Feb 29 never exists),
    // even though Gregorian 2000 IS a leap year — the discriminating case
    // plain epoch arithmetic gets wrong by a day
    val nl = CfTime.parse(Some("days since 2000-01-01"), Some("noleap")).get
    assert(nl.toEpochSeconds(58.0) == epoch("2000-02-28T00:00:00").toDouble)
    assert(nl.toEpochSeconds(59.0) == epoch("2000-03-01T00:00:00").toDouble)
    assert(nl.toEpochSeconds(365.0) == epoch("2001-01-01T00:00:00").toDouble)
    assert(nl.toEpochSeconds(-1.0) == epoch("1999-12-31T00:00:00").toDouble)
    assert(nl.toEpochSeconds(0.25) == epoch("2000-01-01T06:00:00").toDouble)

    val al = CfTime.parse(Some("days since 2000-01-01"), Some("all_leap")).get
    assert(al.toEpochSeconds(59.0) == epoch("2000-02-29T00:00:00").toDouble)
    assert(al.toEpochSeconds(366.0) == epoch("2001-01-01T00:00:00").toDouble)
    // 2001-02-29 exists in all_leap but not in Gregorian -> NaT
    assert(al.toEpochSeconds(366.0 + 59.0).isNaN)

    val d3 = CfTime.parse(Some("hours since 2000-01-01"), Some("360_day")).get
    assert(d3.toEpochSeconds(24.0 * 360) == epoch("2001-01-01T00:00:00").toDouble)
    assert(d3.toEpochSeconds(24.0 * 89 + 6) == epoch("2000-03-30T06:00:00").toDouble)
    // Feb 29 exists in 360_day; Gregorian 2000 is leap, so it maps
    assert(d3.toEpochSeconds(24.0 * 58) == epoch("2000-02-29T00:00:00").toDouble)
    // Feb 30 never exists in Gregorian
    assert(d3.toEpochSeconds(24.0 * 59).isNaN)

    // aliases and un-Gregorian base dates (counted in the calendar's days)
    assert(CfTime.parse(Some("days since 2000-01-01"), Some("365_day")).get
      .calendar.contains(CfTime.NoLeap))
    assert(CfTime.parse(Some("days since 2000-01-01"), Some("366_day")).get
      .calendar.contains(CfTime.AllLeap))
    val b30 = CfTime.parse(Some("days since 2000-02-30"), Some("360_day")).get
    assert(b30.toEpochSeconds(0.0).isNaN)
    assert(b30.toEpochSeconds(1.0) == epoch("2000-03-01T00:00:00").toDouble)

    // base dates the CALENDAR can't represent leave the axis numeric —
    // neither a crash (month 14) nor a silent shift (noleap Feb 30)
    assert(CfTime.parse(Some("days since 2000-14-01"), Some("noleap")).isEmpty)
    assert(CfTime.parse(Some("days since 2000-02-30"), Some("noleap")).isEmpty)
    assert(CfTime.parse(Some("days since 2000-02-29"), Some("noleap")).isEmpty)
    assert(CfTime.parse(Some("days since 2000-02-29"), Some("all_leap")).isDefined)
    assert(CfTime.parse(Some("days since 2000-01-32"), Some("360_day")).isEmpty)
  }

  test("a noleap netCDF-3 axis reads as timestamps; 360_day Feb 30 is null") {
    import graft.sources.netcdf.{NetCDF3, NetCDF3Reader, NetCDF3Writer => NW}
    val dir = java.nio.file.Files.createTempDirectory("cfcal").toString
    def write(path: String, cal: String): Unit = NW.write(path,
      dims = Seq(NW.DimSpec("time", 2, record = true), NW.DimSpec("x", 2)),
      vars = Seq(
        NW.VarSpec("time", Seq("time"), NetCDF3.NC_DOUBLE, Seq(58.0, 59.0),
          attrs = Seq("units" -> "days since 2000-01-01",
            "calendar" -> cal)),
        NW.VarSpec("x", Seq("x"), NetCDF3.NC_DOUBLE, Seq(0.0, 1.0)),
        NW.VarSpec("v", Seq("time", "x"), NetCDF3.NC_DOUBLE,
          (0 until 4).map(_.toDouble))))
    write(s"$dir/noleap.nc", "noleap")
    val nl = NetCDF3Reader.readLongFormat(spark, s"$dir/noleap.nc")
    assert(nl.schema("time").dataType.typeName == "timestamp_ntz")
    assert(nl.select(date_format($"time", "yyyy-MM-dd")).distinct()
      .as[String].collect().sorted.toSeq == Seq("2000-02-28", "2000-03-01"))
    // date_trunc bucketing — the A2 path the decode exists for — works
    assert(nl.groupBy(date_trunc("month", $"time")).count().count() == 2)

    write(s"$dir/d360.nc", "360_day")
    val d3 = NetCDF3Reader.readLongFormat(spark, s"$dir/d360.nc")
    // day 58 = Feb 29 (Gregorian-2000 representable), day 59 = Feb 30 (NaT)
    assert(d3.filter($"time".isNull).count() == 2)
    assert(d3.filter($"time".isNotNull)
      .select(date_format($"time", "yyyy-MM-dd")).distinct()
      .as[String].collect().toSeq == Seq("2000-02-29"))
  }

  test("proleptic-julian calendar decodes field-preserving; 1900 Feb 29 is NaT") {
    // julian leaps every 4 years without exception: 1900 IS julian-leap
    // but not Gregorian-leap — the discriminating year
    val ju = CfTime.parse(Some("days since 1900-01-01"), Some("julian")).get
    assert(ju.calendar.contains(CfTime.Julian))
    assert(ju.toEpochSeconds(0.0) == epoch("1900-01-01T00:00:00").toDouble)
    assert(ju.toEpochSeconds(58.0) == epoch("1900-02-28T00:00:00").toDouble)
    assert(ju.toEpochSeconds(59.0).isNaN) // julian 1900-02-29: no Gregorian date
    assert(ju.toEpochSeconds(60.0) == epoch("1900-03-01T00:00:00").toDouble)
    assert(ju.toEpochSeconds(366.0) == epoch("1901-01-01T00:00:00").toDouble)
    assert(ju.toEpochSeconds(-1.0) == epoch("1899-12-31T00:00:00").toDouble)
    // 2000 is leap in both calendars: Feb 29 maps
    val j2 = CfTime.parse(Some("days since 2000-01-01"), Some("julian")).get
    assert(j2.toEpochSeconds(59.0) == epoch("2000-02-29T00:00:00").toDouble)
    assert(j2.toEpochSeconds(59.25) == epoch("2000-02-29T06:00:00").toDouble)
    // civil <-> days round-trips across leap structure and year sign
    for (d <- -800L to 800L) {
      val (y, m, dd) = CfTime.Julian.civilFromDays(d)
      assert(CfTime.Julian.daysFromCivil(y, m, dd) == d, s"day $d -> ($y,$m,$dd)")
    }
    // pre-1-CE dates: cftime's julian has no year zero (its BCE numbering
    // diverges from the astronomical arithmetic here), so they are NaT
    // rather than one-year-off — and bases before 1 CE stay numeric
    assert(ju.toEpochSeconds(-365.25 * 1902).isNaN)
    assert(CfTime.parse(Some("days since 0000-01-01"), Some("julian")).isEmpty)
  }
}
