package graft

import org.apache.spark.sql.functions._

import graft.sources.AvroOcf

/** Avro object-container files on the bundled avro library: typed schema
  * mapping (incl. logical types), block-aligned range splits via sync
  * markers, codec matrix, and cross-file schema resolution. */
class AvroOcfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("avro").toString

  private val fullSchema =
    """{"type": "record", "name": "Doc", "fields": [
      |  {"name": "id", "type": "long"},
      |  {"name": "name", "type": "string"},
      |  {"name": "score", "type": ["null", "double"], "default": null},
      |  {"name": "tags", "type": {"type": "array", "items": "long"}},
      |  {"name": "counts", "type": {"type": "map", "values": "long"}},
      |  {"name": "blob", "type": "bytes"},
      |  {"name": "day", "type": {"type": "int", "logicalType": "date"}},
      |  {"name": "ts", "type": {"type": "long",
      |    "logicalType": "timestamp-micros"}},
      |  {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
      |    "precision": 10, "scale": 2}},
      |  {"name": "color", "type": {"type": "enum", "name": "Color",
      |    "symbols": ["RED", "GREEN", "BLUE"]}}
      |]}""".stripMargin

  private def decBytes(unscaled: Long): Array[Byte] =
    java.math.BigInteger.valueOf(unscaled).toByteArray

  test("typed round-trip: primitives, logical types, arrays, maps, enums") {
    val dir = tmp()
    val rows = (0 until 10).map { i =>
      Seq(i.toLong, s"doc-$i",
        if (i % 3 == 0) null else java.lang.Double.valueOf(i * 0.5),
        Seq(i.toLong, i * 2L),
        Map("a" -> i.toLong, "b" -> (i * 10L)),
        Array[Byte](1, i.toByte),
        java.lang.Integer.valueOf(19000 + i), // days since epoch
        java.lang.Long.valueOf(1750000000000000L + i * 1000000L), // micros
        decBytes(12345L + i), // 123.45 + i/100 at scale 2
        if (i % 2 == 0) "RED" else "BLUE")
    }
    AvroOcf.write(s"$dir/a.avro", fullSchema, rows)
    val df = AvroOcf.read(spark, s"$dir/a.avro")
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score", "tags",
      "counts", "blob", "day", "ts", "dec", "color"))
    assert(df.schema("score").nullable && !df.schema("id").nullable)
    assert(df.schema("day").dataType.typeName == "date")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    assert(df.schema("dec").dataType.typeName == "decimal(10,2)")
    val got = df.orderBy($"id").collect()
    assert(got.length == 10)
    (0 until 10).foreach { i =>
      val r = got(i)
      assert(r.getAs[Long]("id") == i)
      assert(r.getAs[String]("name") == s"doc-$i")
      if (i % 3 == 0) assert(r.isNullAt(r.fieldIndex("score")))
      else assert(r.getAs[Double]("score") == i * 0.5)
      assert(r.getSeq[Long](r.fieldIndex("tags")) == Seq(i.toLong, i * 2L))
      assert(r.getAs[Map[String, Long]]("counts") ==
        Map("a" -> i.toLong, "b" -> i * 10L))
      assert(r.getAs[Array[Byte]]("blob").toSeq == Seq[Byte](1, i.toByte))
      assert(r.getAs[java.sql.Date]("day").toLocalDate ==
        java.time.LocalDate.ofEpochDay(19000 + i))
      assert(r.getAs[java.time.LocalDateTime]("ts") ==
        java.time.LocalDateTime.ofEpochSecond(1750000000L + i, 0,
          java.time.ZoneOffset.UTC))
      assert(r.getAs[java.math.BigDecimal]("dec") ==
        new java.math.BigDecimal(java.math.BigInteger.valueOf(12345 + i), 2))
      assert(r.getAs[String]("color") == (if (i % 2 == 0) "RED" else "BLUE"))
    }
  }

  private val flatSchema =
    """{"type": "record", "name": "R", "fields": [
      |  {"name": "id", "type": "long"},
      |  {"name": "payload", "type": "string"}
      |]}""".stripMargin

  test("range splits are block-aligned: many tasks, no dup or loss") {
    val dir = tmp()
    val rows = (0 until 500).map(i => Seq(i.toLong, s"payload-$i-${"x" * 50}"))
    // tiny sync interval -> many blocks -> many legal split points
    AvroOcf.write(s"$dir/big.avro", flatSchema, rows, syncInterval = 256)
    val whole = AvroOcf.read(spark, s"$dir/big.avro")
    val split = AvroOcf.read(spark, s"$dir/big.avro", maxSplitBytes = 2048)
    assert(split.rdd.getNumPartitions > 4,
      s"expected many range tasks, got ${split.rdd.getNumPartitions}")
    assert(split.count() == 500)
    assert(whole.orderBy($"id").collect().toSeq ==
      split.orderBy($"id").collect().toSeq)
  }

  test("codec matrix: deflate, snappy, zstandard round-trip identically") {
    val dir = tmp()
    val rows = (0 until 50).map(i => Seq(i.toLong, s"v-$i"))
    Seq("deflate", "snappy", "zstandard").foreach { codec =>
      AvroOcf.write(s"$dir/$codec.avro", flatSchema, rows, codec = codec)
      val back = AvroOcf.read(spark, s"$dir/$codec.avro")
        .orderBy($"id").collect()
      assert(back.length == 50, codec)
      assert(back(7).getString(1) == "v-7", codec)
      val meta = AvroOcf.readMeta(spark, s"$dir/$codec.avro").head()
      assert(meta.getAs[String]("codec") == codec)
    }
  }

  test("schema evolution: later files with extra defaulted fields resolve") {
    val dir = tmp()
    AvroOcf.write(s"$dir/part-0.avro", flatSchema,
      (0 until 5).map(i => Seq(i.toLong, s"old-$i")))
    val evolved =
      """{"type": "record", "name": "R", "fields": [
        |  {"name": "id", "type": "long"},
        |  {"name": "payload", "type": "string"},
        |  {"name": "extra", "type": "long", "default": 0}
        |]}""".stripMargin
    AvroOcf.write(s"$dir/part-1.avro", evolved,
      (5 until 10).map(i => Seq(i.toLong, s"new-$i", i * 100L)))
    // the driver schema comes from the FIRST file: the evolved file's
    // extra field is skipped by avro's resolution rules
    val df = AvroOcf.read(spark, s"$dir/part-*.avro")
    assert(df.columns.toSeq == Seq("id", "payload"))
    val got = df.orderBy($"id").collect()
    assert(got.length == 10)
    assert(got(3).getString(1) == "old-3" && got(8).getString(1) == "new-8")
  }

  test("distributed shard export round-trips; re-runs clear stale shards") {
    val dir = tmp()
    val df = spark.range(60).select(
      $"id",
      concat(lit("p"), $"id").as("payload"))
    val n1 = AvroOcf.writeShards(df.repartition(4), s"$dir/out", flatSchema)
    assert(n1 == 4)
    val back = AvroOcf.read(spark, s"$dir/out/shard-*.avro")
    assert(back.count() == 60)
    val r = back.orderBy($"id").collect()
    (0 until 60).foreach { i =>
      assert(r(i).getLong(0) == i && r(i).getString(1) == s"p$i")
    }
    val n2 = AvroOcf.writeShards(df.repartition(2), s"$dir/out", flatSchema,
      codec = "zstandard")
    assert(n2 == 2)
    assert(AvroOcf.read(spark, s"$dir/out/shard-*.avro").count() == 60)
  }

  test("writeShards temporal encoding follows the field's logical type") {
    val dir = tmp()
    val ts = "2026-02-03 04:05:06.789"
    val df = spark.range(3).select(
      $"id",
      (to_timestamp_ntz(lit(ts)) + make_interval(
        lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), $"id")).as("t_ms"),
      (to_timestamp_ntz(lit(ts)) + make_interval(
        lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), $"id")).as("t_us"))
    val schema =
      """{"type": "record", "name": "T", "fields": [
           {"name": "id", "type": "long"},
           {"name": "t_ms", "type": {"type": "long",
             "logicalType": "local-timestamp-millis"}},
           {"name": "t_us", "type": {"type": "long",
             "logicalType": "local-timestamp-micros"}}
         ]}"""
    AvroOcf.writeShards(df.repartition(1), s"$dir/t", schema)
    // read back through the logical-type mapping: BOTH columns must carry
    // the original wall-clock instant — a micros value stored into the
    // millis field would read 1000x off
    val back = AvroOcf.read(spark, s"$dir/t/shard-*.avro").orderBy($"id")
      .collect()
    (0 until 3).foreach { i =>
      val want = java.time.LocalDateTime.parse(s"2026-02-03T04:05:0${6 + i}.789")
      assert(back(i).getAs[java.time.LocalDateTime]("t_ms") == want,
        s"t_ms row $i: ${back(i).get(1)}")
      assert(back(i).getAs[java.time.LocalDateTime]("t_us") == want,
        s"t_us row $i: ${back(i).get(2)}")
    }
  }

  test("FormatRegistry opens a DIRECTORY named *.avro (writeShards layout)") {
    val dir = tmp()
    val df = spark.range(20).select($"id", concat(lit("p"), $"id").as("payload"))
    AvroOcf.writeShards(df.repartition(3), s"$dir/out.avro", flatSchema)
    val got = graft.sources.FormatRegistry.open(spark, s"$dir/out.avro")
    assert(got.columns.toSeq == Seq("id", "payload") && got.count() == 20)
  }

  test("recordsFrom streams arriving OCFs: stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    val dir = tmp()
    AvroOcf.write(s"$dir/s.avro", flatSchema,
      (0 until 8).map(i => Seq(i.toLong, s"s$i")), codec = "deflate")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/s.avro"))
    val batch = AvroOcf.recordsFrom(
      Seq(("f:s", bytes)).toDF("path", "content"), flatSchema)
      .orderBy($"id").select($"payload").as[String].collect().toSeq
    assert(batch == (0 until 8).map(i => s"s$i"))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Array[Byte])]
    val q = AvroOcf.recordsFrom(in.toDF().toDF("path", "content"), flatSchema)
      .writeStream.format("memory").queryName("avro_stream")
      .outputMode("append").start()
    try {
      in.addData(("f:s", bytes))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("avro_stream").orderBy($"id")
      .select($"payload").as[String].collect().toSeq
    assert(streamed == batch)
  }

  test("FormatRegistry routes .avro (and .tfrecord) to the native readers") {
    val dir = tmp()
    AvroOcf.write(s"$dir/r.avro", flatSchema,
      (0 until 7).map(i => Seq(i.toLong, s"v$i")))
    val viaRegistry = graft.sources.FormatRegistry.open(spark, s"$dir/r.avro")
    assert(viaRegistry.columns.toSeq == Seq("id", "payload"))
    assert(viaRegistry.count() == 7)
    graft.sources.TfRecord.write(s"$dir/r.tfrecord", Seq(
      graft.sources.TfRecord.encodeExample(Seq("id" -> Seq(1L)))))
    val tf = graft.sources.FormatRegistry.open(spark, s"$dir/r.tfrecord")
    assert(tf.columns.toSeq == Seq("file", "record_index", "content"))
    assert(tf.count() == 1)
    // an extension-less OCF sniffs by the Obj\x01 magic before the
    // parquet guess runs
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/r.avro"),
      java.nio.file.Paths.get(s"$dir/mystery_dump"))
    val sniffed = graft.sources.FormatRegistry.open(spark, s"$dir/mystery_dump")
    assert(sniffed.columns.toSeq == Seq("id", "payload") && sniffed.count() == 7)
    // a GLOB of extension-less OCFs sniffs off the first expanded file
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/r.avro"),
      java.nio.file.Paths.get(s"$dir/mystery_dump2"))
    val many = graft.sources.FormatRegistry.open(spark, s"$dir/mystery_dump*")
    assert(many.count() == 14)
    // an explicit engine option disables the sniff (the registry rule)
    val forced = intercept[Exception] {
      graft.sources.FormatRegistry.open(spark, s"$dir/mystery_dump",
        Map("engine" -> "pq")).count()
    }
    assert(forced != null) // parquet reader rejects the avro bytes
  }

  test("non-nullable multi-branch unions fail directed") {
    val dir = tmp()
    val s =
      """{"type": "record", "name": "R", "fields": [
        |  {"name": "v", "type": ["long", "string"]}
        |]}""".stripMargin
    AvroOcf.write(s"$dir/u.avro", s, Seq(Seq(1L)))
    val e = intercept[Exception] { AvroOcf.read(spark, s"$dir/u.avro") }
    assert(e.getMessage.contains("union"), e.getMessage)
  }

  // the Iceberg manifest shape readFilesLocal exists for: a later writer
  // schema's nested data_file struct GAINS members and the top level
  // gains a column (a v2/v3 manifest mix under one snapshot)
  private val manifestV2 =
    """{"type": "record", "name": "E", "fields": [
      |  {"name": "status", "type": "int"},
      |  {"name": "data_file", "type": {"type": "record", "name": "D",
      |    "fields": [
      |      {"name": "file_path", "type": "string"},
      |      {"name": "record_count", "type": "long"}
      |  ]}}
      |]}""".stripMargin
  private val manifestV3 =
    """{"type": "record", "name": "E", "fields": [
      |  {"name": "status", "type": "int"},
      |  {"name": "data_file", "type": {"type": "record", "name": "D",
      |    "fields": [
      |      {"name": "file_path", "type": "string"},
      |      {"name": "record_count", "type": "long"},
      |      {"name": "referenced_data_file", "type": ["null", "string"],
      |        "default": null}
      |  ]}},
      |  {"name": "sequence_number", "type": "long"}
      |]}""".stripMargin

  private def writeManifestMix(dir: String): Seq[String] = {
    AvroOcf.write(s"$dir/m1.avro", manifestV2,
      Seq(Seq(1, Seq("f1", 10L)), Seq(0, Seq("f2", 20L))))
    AvroOcf.write(s"$dir/m2.avro", manifestV3,
      Seq(Seq(1, Seq("f3", 30L, "ref-a"), 7L),
        Seq(2, Seq("f4", 40L, null), 8L)))
    Seq(s"$dir/m1.avro", s"$dir/m2.avro")
  }

  test("readFilesLocal equals readFiles across writer schemas (nested merge)") {
    val files = writeManifestMix(tmp())
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toSeq
      df.selectExpr("__src", "status", "sequence_number",
        "data_file.file_path", "data_file.record_count",
        "data_file.referenced_data_file")
        .collect().map(_.toString).sorted.toSeq ++ cols
    }
    val dist = AvroOcf.readFiles(spark, files, sourceFileCol = Some("__src"))
    val local = AvroOcf.readFilesLocal(spark, files,
      sourceFileCol = Some("__src"))
    assert(snap(local) == snap(dist))
  }

  test("readFilesLocal select+collect folds to a LocalRelation (no job)") {
    val files = writeManifestMix(tmp())
    val local = AvroOcf.readFilesLocal(spark, files)
    // ConvertToLocalRelation must fold the manifest-replay projection so
    // the driver's collect launches zero Spark jobs — the property the
    // Iceberg snapshot replay's job count rests on
    val proj = local.select(col("status"),
      col("data_file.file_path").as("p"),
      coalesce(col("sequence_number"), lit(0L)).as("seq"))
    assert(proj.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(proj.collect().length == 4)
  }

  test("readFilesLocal falls back to the distributed read above the byte cap") {
    val files = writeManifestMix(tmp())
    val df = AvroOcf.readFilesLocal(spark, files, maxLocalBytes = 1L)
    assert(!df.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(df.count() == 4)
  }
}
