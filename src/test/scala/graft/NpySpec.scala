package graft

import org.apache.spark.sql.functions._

import graft.sources.Npy

class NpySpec extends SparkSpec {
  import spark.implicits._

  test("2-D f8 matrix round-trips with row-range partitions") {
    val dir = java.nio.file.Files.createTempDirectory("npy").toString
    val rows = 100
    val cols = 6
    val vals = for (r <- 0 until rows; c <- 0 until cols)
      yield (r * 31 + c * 7) % 100 / 4.0
    Npy.write(s"$dir/emb.npy", Seq(rows, cols), vals)
    val df = Npy.read(spark, s"$dir/emb.npy")
    assert(df.count() == rows)
    assert(df.rdd.getNumPartitions > 1) // row ranges really fan out
    val r17 = df.filter($"row" === 17).head().getSeq[Double](2)
    assert(r17 == (0 until cols).map(c => (17 * 31 + c * 7) % 100 / 4.0))
    // total checksum across all partitions
    val total = df.select(sum(aggregate($"values", lit(0.0), (a, x) => a + x)))
      .as[Double].head()
    assert(math.abs(total - vals.sum) < 1e-9)
  }

  test("dtypes: f4, i4, u1, bool, big-endian, and f2 decode correctly") {
    val dir = java.nio.file.Files.createTempDirectory("npyd").toString
    val vals = Seq(0.0, 1.0, 3.0, 120.0)
    for ((descr, expect) <- Seq(
        "<f4" -> vals, "<i4" -> vals, "<u1" -> vals, ">f8" -> vals,
        "<i2" -> vals, "|b1" -> Seq(0.0, 1.0, 1.0, 1.0))) {
      val p = s"$dir/a${descr.replaceAll("[<>|]", "_")}.npy"
      Npy.write(p, Seq(4), vals, descr = descr)
      val got = Npy.read(spark, p).orderBy($"idx")
        .select($"value").as[Double].collect().toSeq
      assert(got == expect, s"descr $descr")
    }
    // IEEE half (<f2): 0x3C00 = 1.0, 0xC000 = -2.0, 0x3555 ~ 0.333
    val h = Npy.Header("<f2", fortranOrder = false, Seq(3), 0)
    val bytes = Array[Byte](0x00, 0x3C, 0x00, 0xC0.toByte, 0x55, 0x35)
    assert(Npy.decodeValue(bytes, 0, h) == 1.0)
    assert(Npy.decodeValue(bytes, 2, h) == -2.0)
    assert(math.abs(Npy.decodeValue(bytes, 4, h) - 1.0 / 3) < 1e-3)
  }

  test("fortran-order 2-D reads transposed storage into the same rows") {
    val dir = java.nio.file.Files.createTempDirectory("npyf").toString
    // C-order values for a 3x2 logical matrix...
    val logical = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0))
    // ...stored column-major: (1,3,5,2,4,6)
    Npy.write(s"$dir/f.npy", Seq(3, 2), Seq(1, 3, 5, 2, 4, 6).map(_.toDouble),
      fortranOrder = true)
    val got = Npy.read(spark, s"$dir/f.npy").orderBy($"row")
      .select($"values").as[Seq[Double]].collect().toSeq
    assert(got == logical)
  }

  test("npz archives read all members with array names, stored AND deflated") {
    val dir = java.nio.file.Files.createTempDirectory("npz").toString
    val arrays = Seq(
      ("emb", Seq(4L, 3L), (0 until 12).map(_.toDouble)),
      ("scores", Seq(2L), Seq(0.5, 0.75)))
    // STORED (np.savez layout) and DEFLATED (np.savez_compressed)
    Npy.writeNpz(s"$dir/bundle.npz", arrays)
    Npy.writeNpz(s"$dir/bundle_c.npz", arrays, compressed = true)
    for (f <- Seq("bundle.npz", "bundle_c.npz")) {
      val df = Npy.readNpz(spark, s"$dir/$f")
      assert(df.count() == 6, f)
      assert(df.select($"array_name").distinct().as[String].collect().sorted
        .toSeq == Seq("emb", "scores"))
      val e2 = df.filter($"array_name" === "emb" && $"row" === 2).head()
      assert(e2.getSeq[Double](3) == Seq(6.0, 7.0, 8.0))
      assert(df.filter($"array_name" === "scores" && $"row" === 1).head()
        .getSeq[Double](3) == Seq(0.75))
    }
    // the default really is STORED: the zip central directory says so
    val zf = new java.util.zip.ZipFile(s"$dir/bundle.npz")
    try assert(zf.entries().nextElement().getMethod ==
      java.util.zip.ZipEntry.STORED)
    finally zf.close()
  }

  test("truncated npy fails at plan time with a directed shape/byte message") {
    val dir = java.nio.file.Files.createTempDirectory("npyt").toString
    Npy.write(s"$dir/full.npy", Seq(10, 4), (0 until 40).map(_.toDouble))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/full.npy"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cut.npy"),
      java.util.Arrays.copyOf(bytes, bytes.length - 64))
    val e = intercept[Npy.UnsupportedNpy] { Npy.read(spark, s"$dir/cut.npy") }
    assert(e.getMessage.contains("truncated"))
  }

  test("recordsFrom streams arriving .npy files: stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    val dir = java.nio.file.Files.createTempDirectory("npys").toString
    Npy.write(s"$dir/e.npy", Seq(20, 3),
      (0 until 60).map(k => (k % 13) / 4.0), descr = "<f4")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/e.npy"))
    val batch = Npy.recordsFrom(Seq(("f:a", bytes)).toDF("path", "content"))
      .orderBy($"row").select($"values").as[Seq[Double]].collect().toSeq
    assert(batch == (0 until 20).map(r =>
      (0 until 3).map(c => ((r * 3 + c) % 13) / 4.0)))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Array[Byte])]
    val q = Npy.recordsFrom(in.toDF().toDF("path", "content"))
      .writeStream.format("memory").queryName("npy_stream")
      .outputMode("append").start()
    try {
      in.addData(("f:a", bytes))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("npy_stream").orderBy($"row")
      .select($"values").as[Seq[Double]].collect().toSeq
    assert(streamed == batch)
  }

  test("directed errors: bad magic, 3-D arrays, string dtypes, mixed ranks") {
    val dir = java.nio.file.Files.createTempDirectory("npye").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.npy"),
      "not numpy at all........".getBytes)
    intercept[Npy.UnsupportedNpy] { Npy.read(spark, s"$dir/bad.npy") }
    Npy.write(s"$dir/cube.npy", Seq(2, 2, 2), (0 until 8).map(_.toDouble))
    intercept[Npy.UnsupportedNpy] { Npy.read(spark, s"$dir/cube.npy") }
    // a string dtype header parses but is rejected with a directed message
    val e = intercept[Npy.UnsupportedNpy] {
      Npy.parseHeader({ (off, len) =>
        val full = {
          val dict = "{'descr': '<U10', 'fortran_order': False, 'shape': (3,), }"
          val pad = 64 - (10 + dict.length + 1) % 64
          val header = dict + " " * pad + "\n"
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(0x93); bos.write("NUMPY".getBytes)
          bos.write(1); bos.write(0)
          bos.write(header.length & 0xff); bos.write(header.length >> 8)
          bos.write(header.getBytes)
          bos.toByteArray
        }
        java.util.Arrays.copyOfRange(full, off.toInt, off.toInt + len)
      }, 4096L)
    }
    assert(e.getMessage.contains("dtype class"))
    Npy.write(s"$dir/mix/one.npy", Seq(3), Seq(1.0, 2.0, 3.0))
    Npy.write(s"$dir/mix/two.npy", Seq(2, 2), Seq(1.0, 2.0, 3.0, 4.0))
    intercept[IllegalArgumentException] { Npy.read(spark, s"$dir/mix/*.npy") }
  }
}
