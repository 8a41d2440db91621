package graft

import org.apache.spark.sql.functions._

import graft.sources.TarShards

class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  test("ustar shards round-trip members and group into samples") {
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    def blob(s: String): Array[Byte] = s.getBytes("UTF-8")
    TarShards.write(s"$dir/shard-000.tar", Seq(
      "000000.jpg" -> blob("fake-jpeg-0"),
      "000000.txt" -> blob("a red square"),
      "000001.jpg" -> blob("fake-jpeg-1-longer"),
      "000001.txt" -> blob("a blue circle"),
      "000001.json" -> blob("""{"w": 64}""")))
    TarShards.write(s"$dir/shard-001.tar", Seq(
      "000002.jpg" -> blob("fake-jpeg-2"),
      "000002.txt" -> blob("")))
    val df = TarShards.read(spark, s"$dir/shard-*.tar")
    assert(df.count() == 7)
    assert(df.select($"key").distinct().count() == 3)
    val r = df.filter($"key" === "000001" && $"ext" === "txt").head()
    assert(new String(r.getAs[Array[Byte]]("content"), "UTF-8") == "a blue circle")
    assert(r.getLong(3) == 13)
    // sample grouping: one row per (shard, key), ext -> content map
    val s2 = TarShards.samples(df)
    assert(s2.count() == 3)
    val m = s2.filter($"key" === "000001").head()
      .getAs[Map[String, Array[Byte]]]("parts")
    assert(m.keySet == Set("jpg", "txt", "json"))
    // empty member decodes as zero bytes, not a missing row
    assert(df.filter($"key" === "000002" && $"ext" === "txt")
      .head().getAs[Array[Byte]]("content").isEmpty)
  }

  test("readMeta lists members without fetching content, at header-only IO") {
    val dir = java.nio.file.Files.createTempDirectory("wdsm").toString
    val entries = (0 until 2000).flatMap { i =>
      val key = f"$i%06d"
      Seq(s"$key.img" -> Array.fill[Byte](512)((i % 127).toByte),
        s"$key.txt" -> s"caption $i".getBytes("UTF-8"))
    }
    TarShards.write(s"$dir/big.tar", entries)
    val meta = TarShards.readMeta(spark, s"$dir/big.tar")
    assert(meta.columns.toSeq == Seq("shard_uri", "key", "ext", "size"))
    assert(meta.count() == 4000)
    assert(meta.filter($"ext" === "img").agg(sum($"size")).head().getLong(0)
      == 2000L * 512)
    // sizes agree with the full read
    val full = TarShards.read(spark, s"$dir/big.tar")
      .groupBy($"ext").agg(sum($"size").as("s")).orderBy($"ext").collect()
    val lite = meta.groupBy($"ext").agg(sum($"size").as("s")).orderBy($"ext").collect()
    assert(full.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      lite.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("writeShards round-trips a binary frame through read, losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("wdsw").toString + "/out"
    val rows = (0 until 500).flatMap { i =>
      val key = f"$i%06d"
      Seq((key, "img", Array.fill[Byte](32 + i % 7)((i % 100).toByte)),
        (key, "txt", s"caption $i".getBytes("UTF-8")))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ext",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
    val n = TarShards.writeShards(df, dir)
    assert(n == 4)
    assert(new java.io.File(dir).list().count(_.endsWith(".tar")) == 4)
    val back = TarShards.read(spark, s"$dir/shard-*.tar")
    assert(back.count() == 1000)
    // byte-lossless: md5 digests of every member match the input
    val want = rows.map(r => (r._1, r._2,
      java.security.MessageDigest.getInstance("MD5").digest(r._3)
        .map("%02x".format(_)).mkString)).toSet
    val got = back.select($"key", $"ext", md5($"content"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("GNU long names, pax headers, dirs, and garbage are handled") {
    val dir = java.nio.file.Files.createTempDirectory("wdsx").toString
    val p = s"$dir/x.tar"
    TarShards.write(p, Seq("a.txt" -> "hello".getBytes))
    val raw0 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    // hand-build: dir entry + GNU longname pair + pax-global + the file
    val out = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Int, typ: Char): Array[Byte] = {
      val src = raw0.take(512).clone()
      java.util.Arrays.fill(src, 0, 100, 0.toByte)
      name.getBytes.copyToArray(src, 0)
      val szs = ("%011o".format(size)).getBytes
      szs.copyToArray(src, 124)
      src(156) = typ.toByte
      // recompute checksum
      java.util.Arrays.fill(src, 148, 156, ' '.toByte)
      val sum = src.map(_ & 0xff).sum
      ("%06o".format(sum)).getBytes.copyToArray(src, 148)
      src(154) = 0; src(155) = ' '
      src
    }
    def padded(b: Array[Byte]): Array[Byte] =
      b ++ new Array[Byte]((512 - b.length % 512) % 512)
    out.write(header("data/", 0, '5'))
    val longName = ("d" * 60) + "/sample-42.cls"
    out.write(header("././@LongLink", longName.length, 'L'))
    out.write(padded(longName.getBytes))
    out.write(header("ignored.cls", 4, '0'))
    out.write(padded("九九九九".getBytes("UTF-8").take(4)))
    val pax = "30 mtime=1700000000.123456789\n"
    out.write(header("pax", pax.length, 'g'))
    out.write(padded(pax.getBytes))
    out.write(raw0) // the normal file + terminator
    val p2 = s"$dir/mixed.tar"
    java.nio.file.Files.write(java.nio.file.Paths.get(p2), out.toByteArray)
    val df = TarShards.read(spark, p2)
    val rows = df.select($"key", $"ext").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("sample-42", "cls"), ("a", "txt")))
    // non-tar bytes raise a directed error
    val bad = s"$dir/bad.tar"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad), new Array[Byte](1024 * 3))
    // all-zero file = empty archive, no members
    assert(intercept[IllegalArgumentException] {
      TarShards.read(spark, s"$dir/none-*.tar")
    }.getMessage.contains("no tar shards"))
    val junk = s"$dir/junk.tar"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      Array.fill[Byte](1024)('Z'.toByte))
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.read(spark, junk).count()
    }
    assert(e.getMessage.contains("bad magic") ||
      Option(e.getCause).exists(_.getMessage.contains("bad magic")))
  }
}
