package graft

import org.apache.spark.sql.functions._

import graft.functions.MoverFunctions
import graft.operators.{RateLimit, Regrid}
import graft.sources.{FormatRegistry, Tables}
import graft.streaming.Metrics

class RegridSpec extends SparkSpec {
  import spark.implicits._

  test("conservative pooling averages all samples of each coarse cell") {
    val src = Seq(
      (0.25, 0.25, 10.0), (0.75, 0.75, 20.0),   // both in cell (0,0) at 1°
      (1.25, 0.25, 40.0)).toDF("latitude", "longitude", "temp")
    val out = Regrid.conservative(src, "latitude", "longitude", 1.0, Seq("temp"))
      .orderBy($"lat_cell", $"lon_cell").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("temp") == 15.0 && out(0).getAs[Long]("n_samples") == 2)
    assert(out(1).getAs[Double]("temp") == 40.0)
  }

  test("conservative handles negative coordinates (floor, not truncate)") {
    val src = Seq((-0.5, -0.5, 8.0)).toDF("latitude", "longitude", "temp")
    val r = Regrid.conservative(src, "latitude", "longitude", 1.0, Seq("temp")).head()
    assert(r.getAs[Double]("lat_cell") == -1.0 && r.getAs[Double]("lon_cell") == -1.0)
  }

  test("nearest-neighbor regrid assigns each target its closest source cell") {
    val src = Seq(
      (0.0, 0.0, 1.0), (0.0, 0.5, 2.0),
      (0.5, 0.0, 3.0), (0.5, 0.5, 4.0)).toDF("latitude", "longitude", "v")
    val tgt = Seq(
      (0.1, 0.1),   // nearest (0, 0)
      (0.25, 0.4),  // lat ties round up -> (0.5, 0.5)
      (0.45, 0.05), // nearest (0.5, 0)
      (2.0, 2.0))   // no source cell -> dropped
      .toDF("latitude", "longitude")
    val got = Regrid.nearest(src, tgt, "latitude", "longitude", 0.5, 0.5)
      .select($"latitude", $"longitude", $"v")
      .orderBy($"v").collect().map(_.getDouble(2))
    assert(got.toSeq == Seq(1.0, 3.0, 4.0))
  }

  test("corpus stats: approx percentile path tracks the exact one") {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.documents(spark, sfDir)
    val exact = TF.corpusStats(docs, "source", "text", exact = true)
      .orderBy($"source").collect()
    val approx = TF.corpusStats(docs, "source", "text", exact = false)
      .orderBy($"source").collect()
    assert(exact.length == approx.length)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getAs[Long]("n_docs") == a.getAs[Long]("n_docs"))
      // t-digest is exact-rank-adjacent on small groups; allow one token
      assert(math.abs(e.getAs[Double]("p50_tokens") - a.getAs[Double]("p50_tokens")) <= 1.0)
      assert(math.abs(e.getAs[Double]("p95_tokens") - a.getAs[Double]("p95_tokens")) <= 2.0)
    }
  }

  test("bilinear interpolation reproduces values at grid points and midpoints") {
    val src = Seq(
      (0.0, 0.0, 0.0), (0.0, 1.0, 10.0),
      (1.0, 0.0, 20.0), (1.0, 1.0, 30.0)).toDF("latitude", "longitude", "v")
    val targets = Seq((0.0, 0.0), (0.5, 0.5), (0.0, 0.5)).toDF("latitude", "longitude")
    val got = Regrid.bilinear(src, targets, "latitude", "longitude", "v", 1.0)
      .orderBy($"t_lat", $"t_lon").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got(0) == (0.0, 0.0, 0.0))          // exact grid point
    assert(got(1) == (0.0, 0.5, 5.0))          // edge midpoint
    assert(got(2) == (0.5, 0.5, 15.0))         // center: mean of 4 corners
  }
}

class MoverFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("matchDatetime extracts per template; missing parts get 1978 defaults") {
    val got = Seq("gs://b/era5_20240131.nc", "gs://b/other.nc")
      .toDF("uri")
      .select(MoverFunctions.matchDatetime($"uri", "era5_%Y%m%d.nc").as("t"))
      .collect().map(r => Option(r.get(0)).map(_.toString))
    assert(got(0).get.startsWith("2024-01-31T00:00") || got(0).get.startsWith("2024-01-31 00:00"))
    // no match -> all defaults: 1978-01-01
    assert(got(1).get.startsWith("1978-01-01"))
  }

  test("matchDatetime with time fields") {
    val got = Seq("x/2024061512.grib").toDF("uri")
      .select(MoverFunctions.matchDatetime($"uri", "%Y%m%d%H.grib").cast("string"))
      .head().getString(0)
    assert(got.startsWith("2024-06-15 12:00") || got.startsWith("2024-06-15T12:00"))
  }

  test("packedDecode applies scale/offset and masks missing") {
    val got = Seq(100, -32767, 0).toDF("raw")
      .select(MoverFunctions.packedDecode($"raw", 0.5, 10.0, -32767L).as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(got(0).contains(60.0) && got(1).isEmpty && got(2).contains(10.0))
  }

  test("nanToNull masks NaN and infinities") {
    val got = Seq(1.5, Double.NaN, Double.PositiveInfinity).toDF("x")
      .select(MoverFunctions.nanToNull($"x")).collect().map(r => Option(r.get(0)))
    assert(got(0).contains(1.5) && got(1).isEmpty && got(2).isEmpty)
  }
}

class RateLimitSpec extends SparkSpec {
  import spark.implicits._

  test("shardCount matches the reference formula") {
    assert(RateLimit.shardCount(10.0, 0.5, 10) == 5)   // ee defaults -> 5 shards
    assert(RateLimit.shardCount(100.0, 1.0, 10) == 10) // capped by maxConcurrent
    assert(RateLimit.shardCount(0.1, 0.5, 10) == 1)    // floor at 1
  }

  test("token bucket paces calls at the configured interval") {
    var clockNs = 0L
    var slept = Vector.empty[Long]
    val bucket = new RateLimit.TokenBucket(100L, () => clockNs)
    def acquire(): Long = bucket.acquire(n => { slept :+= n; clockNs += n })
    assert(acquire() == 0L)     // first call free
    assert(acquire() == 100L)   // second waits a full interval
    clockNs += 1000             // long idle
    assert(acquire() == 0L)     // no debt after idle
  }

  test("mapRateLimited bounds concurrency via repartition and preserves rows") {
    val ds = spark.range(20).as[Long]
    val out = RateLimit.mapRateLimited(ds, qps = 1000.0, latencySeconds = 0.004,
      maxConcurrent = 4)(x => x * 2)
    assert(out.rdd.getNumPartitions == 4)
    assert(out.collect().sorted.toSeq == (0L until 20L).map(_ * 2))
  }

  test("deterministic shard column spreads keys") {
    val sharded = RateLimit.withShards(Tables.events(spark, sfDir), "event_id", 5)
    val counts = sharded.groupBy($"shard").count().select($"count").as[Long].collect()
    assert(counts.length == 5)
    assert(counts.min > 100) // 1000 events, roughly even
  }
}

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("observeLatency attaches count/min/max/mean without an extra pass") {
    val df = Metrics.observeLatency(
      Tables.events(spark, sfDir).select($"ts", $"value"), "ts", "m")
    // collect() runs df's own QueryExecution (count() would build a new one)
    df.collect()
    val row = df.queryExecution.observedMetrics("m")
    assert(row.getAs[Long]("element_count") == 1000L)
    assert(row.getAs[Double]("data_latency_ms_min") > 0) // fixture is in the past
  }

  test("windowedSummary reduces per window") {
    val m = Tables.events(spark, sfDir).select($"ts", $"value")
    val out = Metrics.windowedSummary(m, "ts", "value", "1 day")
    assert(out.count() == 30)
    assert(out.columns.toSet == Set("win_start", "max_value", "mean_value"))
  }
}

class FormatRegistrySpec extends SparkSpec {
  test("dispatches parquet by extension; extension parsing") {
    val df = FormatRegistry.open(spark, s"$sfDir/lineitem.parquet")
    assert(df.count() > 0)
    assert(FormatRegistry.extensionOf("a/b/c.data.NC") == "nc")
  }

  test("engine option overrides extension sniffing") {
    // engine=grib on a parquet payload reaches the GRIB parser, which
    // rejects the magic — proof the override routed past the extension
    val e = intercept[IllegalArgumentException](
      FormatRegistry.open(spark, s"$sfDir/lineitem.parquet", Map("engine" -> "grib")))
    assert(e.getMessage.contains("not a GRIB file"))
  }

  test("NetCDF-4/HDF5 routes to the native reader, by extension and signature") {
    import graft.sources.hdf5.{Hdf5Writer => HW}
    val dir = java.nio.file.Files.createTempDirectory("h5").toString
    def writeFixture(p: String): Unit = HW.write(p, Seq(
      HW.VarSpec("x", Seq("x"), Seq(3), Seq(0.0, 1.0, 2.0), dtype = "f8"),
      HW.VarSpec("v", Seq("x"), Seq(3), Seq(10.0, 11.0, 12.0), dtype = "f8")))
    // .nc4 extension dispatches straight to the HDF5 reader
    val p4 = s"$dir/data.nc4"
    writeFixture(p4)
    assert(FormatRegistry.open(spark, p4).count() == 3)
    // an HDF5 payload behind a .nc extension is sniffed by signature
    val pNc = s"$dir/sneaky.nc"
    writeFixture(pNc)
    val df = FormatRegistry.open(spark, pNc)
    assert(df.columns.toSeq == Seq("x", "v") && df.count() == 3)
  }

  test("fileStatus returns size and mtime via Hadoop FS") {
    val (size, mtime) = FormatRegistry.fileStatus(spark, s"$sfDir/lineitem.parquet")
    assert(size > 1000 && mtime > 0)
  }
}
