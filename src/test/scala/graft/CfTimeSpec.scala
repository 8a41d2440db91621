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

  test("non-standard calendars and non-time units stay numeric") {
    assert(CfTime.parse(Some("hours since 1900-01-01"), Some("360_day")).isEmpty)
    assert(CfTime.parse(Some("hours since 1900-01-01"), Some("noleap")).isEmpty)
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

  test("a non-standard-calendar axis stays a plain double column") {
    import graft.sources.netcdf.{NetCDF3, NetCDF3Reader, NetCDF3Writer => NW}
    val dir = java.nio.file.Files.createTempDirectory("cfcal").toString
    val path = s"$dir/noleap.nc"
    NW.write(path,
      dims = Seq(NW.DimSpec("time", 2, record = true), NW.DimSpec("x", 2)),
      vars = Seq(
        NW.VarSpec("time", Seq("time"), NetCDF3.NC_DOUBLE, Seq(10.0, 20.0),
          attrs = Seq("units" -> "days since 2000-01-01",
            "calendar" -> "noleap")),
        NW.VarSpec("x", Seq("x"), NetCDF3.NC_DOUBLE, Seq(0.0, 1.0)),
        NW.VarSpec("v", Seq("time", "x"), NetCDF3.NC_DOUBLE,
          (0 until 4).map(_.toDouble))))
    val df = NetCDF3Reader.readLongFormat(spark, path)
    assert(df.schema("time").dataType.typeName == "double")
    assert(df.select($"time").distinct().as[Double].collect().sorted.toSeq ==
      Seq(10.0, 20.0))
  }
}
