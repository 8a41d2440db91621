package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.sources.{ColumnStats, DeltaTable, DeltaWriter, IcebergTable,
  IcebergWriter}

/** Statistics-based file skipping — the scan-planning half of both table
  * formats: footer-derived stats written at commit, min/max/null-count
  * pruning at read. Every pruning arm asserts BOTH halves: the scanned
  * file set shrinks (inputFiles) AND the result equals the unpruned
  * read + filter — pruning must never change a result, only the IO. */
class StatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("prune").toString

  private val conf = new Configuration()

  // ------------------------------------------------------ unit: mayMatch

  private def fs(cols: (String, ColumnStats.ColStats)*): ColumnStats.FileStats =
    ColumnStats.FileStats(Some(100L), cols.toMap)
  private def cs(min: Any, max: Any, nulls: Long = 0L): ColumnStats.ColStats =
    ColumnStats.ColStats(Option(min), Option(max), Some(nulls))

  test("mayMatch: signed zeros compare equal (Spark SQL order)") {
    val types = Map("d" -> (DoubleType: DataType))
    // a foreign writer's bound may carry EITHER zero; Spark treats them
    // equal — a prune on the sign bit would lose matching rows
    assert(ColumnStats.mayMatch(EqualTo("d", 0.0),
      fs("d" -> cs(-5.0, -0.0)), types), "max=-0.0 must keep =+0.0")
    assert(ColumnStats.mayMatch(EqualTo("d", -0.0),
      fs("d" -> cs(0.0, 5.0)), types), "min=+0.0 must keep =-0.0")
    assert(ColumnStats.mayMatch(LessThanOrEqual("d", -0.0),
      fs("d" -> cs(0.0, 5.0)), types), "min=+0.0 must keep <=-0.0")
    assert(ColumnStats.mayMatch(GreaterThanOrEqual("d", 0.0),
      fs("d" -> cs(-5.0, -0.0)), types) /* fractional never prunes > */)
    // genuine pruning is untouched
    assert(!ColumnStats.mayMatch(EqualTo("d", 0.1),
      fs("d" -> cs(-5.0, -0.0)), types))
    assert(!ColumnStats.mayMatch(EqualTo("d", -0.1),
      fs("d" -> cs(0.0, 5.0)), types))
  }

  test("delta stats json: wide string bounds truncate, max rounds up") {
    val schema = StructType(Seq(StructField("s", StringType)))
    def roundTrip(min: String, max: String): ColumnStats.ColStats = {
      val js = ColumnStats.deltaStatsJson(
        fs("s" -> cs(min, max)), schema)
      assert(js.length < 32 * 8 + 200,
        s"stats json must not embed full wide strings: ${js.length}")
      ColumnStats.parseDeltaStats(js, schema).cols("s")
    }
    val c1 = roundTrip("a" * 40, "b" * 39 + "z")
    assert(c1.min.contains("a" * 32), "min is the 32-char prefix")
    assert(c1.max.contains("b" * 31 + "c"),
      s"max rounds its last kept char UP, got ${c1.max}")
    assert(ColumnStats.cmpUtf8(
      c1.max.get.asInstanceOf[String], "b" * 39 + "z") > 0,
      "the truncated max must stay a valid upper bound")
    // pruning with truncated bounds keeps every true row: a value
    // between the real max and the rounded-up bound is KEPT, a value
    // beyond the rounded bound still prunes
    val st1 = ColumnStats.FileStats(Some(100L), Map("s" -> c1))
    val types = Map("s" -> (StringType: DataType))
    assert(ColumnStats.mayMatch(EqualTo("s", "b" * 40), st1, types))
    assert(!ColumnStats.mayMatch(EqualTo("s", "zz"), st1, types))
    assert(!ColumnStats.mayMatch(EqualTo("s", "A"), st1, types))
    // surrogate pair straddling the cut: never split — min cuts short
    val emoji = new String(Character.toChars(0x1F600))
    val c2 = roundTrip("x" * 31 + emoji + "y" * 7, "x" * 31 + emoji + "z" * 7)
    assert(c2.min.contains("x" * 31), "a split pair backs off one char")
    // a max of all-U+10FFFF has no successor: the bound is OMITTED
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    val c3 = roundTrip("a", maxCp * 20)
    assert(c3.max.isEmpty, "no valid successor → max omitted")
    assert(ColumnStats.mayMatch(
      EqualTo("s", maxCp * 25),
      ColumnStats.FileStats(Some(100L), Map("s" -> c3)), types),
      "an omitted max keeps the file")
  }

  test("iceberg bounds: wide strings truncate in manifest entries") {
    val table = tmp()
    val wide = ("k" * 60) + "tail"
    IcebergWriter.writeAppend(spark,
      Seq((1L, wide), (2L, "aa")).toDF("id", "s"), table)
    // the manifest's own bytes must not embed the 64-char value…
    val conf0 = new Configuration()
    val fsys = new org.apache.hadoop.fs.Path(table).getFileSystem(conf0)
    val manifests = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$table/metadata"))
      .filter(_.getPath.getName.endsWith(".avro")).map(_.getPath)
    val bytes = manifests.map { p =>
      val in = fsys.open(p)
      try { val b = new Array[Byte](fsys.getFileStatus(p).getLen.toInt)
        in.readFully(b); new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
      } finally in.close()
    }.mkString
    assert(!bytes.contains("k" * 40),
      "manifest bounds must carry truncated strings only")
    // …and an exact-match read on the full value still finds the row
    val hit = IcebergTable.readWhere(spark, table, Seq(EqualTo("s", wide)))
    assert(hit.count() == 1L, "truncated bounds must stay conservative")
  }

  test("mayMatch: comparison pruning across types") {
    val types = Map[String, DataType]("id" -> LongType, "s" -> StringType,
      "d" -> DoubleType, "b" -> BooleanType)
    val st = fs("id" -> cs(10L, 20L), "s" -> cs("ham", "spam"),
      "d" -> cs(1.5, 2.5), "b" -> cs(false, false))
    def may(f: Filter) = ColumnStats.mayMatch(f, st, types)
    assert(may(EqualTo("id", 15L)) && !may(EqualTo("id", 25L)) &&
      !may(EqualTo("id", 5L)))
    assert(may(EqualTo("id", 10)) && may(EqualTo("id", 20)),
      "int literal against long column, boundary inclusive")
    assert(may(GreaterThan("id", 19L)) && !may(GreaterThan("id", 20L)))
    assert(may(GreaterThanOrEqual("id", 20L)) &&
      !may(GreaterThanOrEqual("id", 21L)))
    assert(may(LessThan("id", 11L)) && !may(LessThan("id", 10L)))
    assert(may(LessThanOrEqual("id", 10L)) &&
      !may(LessThanOrEqual("id", 9L)))
    assert(may(In("id", Array(1L, 15L))) && !may(In("id", Array(1L, 2L))))
    assert(!may(In("id", Array[Any]())) && !may(EqualTo("id", null)))
    assert(may(EqualTo("s", "lamb")) && !may(EqualTo("s", "zebra")))
    assert(may(StringStartsWith("s", "ha")) &&
      !may(StringStartsWith("s", "zz")) && !may(StringStartsWith("s", "a")))
    assert(!may(EqualTo("b", true)) && may(EqualTo("b", false)))
    // And/Or composition
    assert(!may(And(EqualTo("id", 15L), EqualTo("s", "zebra"))))
    assert(may(Or(EqualTo("id", 25L), EqualTo("s", "lamb"))))
    assert(!may(Or(EqualTo("id", 25L), EqualTo("s", "zebra"))))
    // unknown column / no stats: keep
    assert(may(EqualTo("nope", 1L)))
    assert(ColumnStats.mayMatch(EqualTo("id", 1L), ColumnStats.NoStats, types))
    // unsupported filter shape: keep
    assert(may(StringEndsWith("s", "x")))
  }

  test("mayMatch: null semantics and NaN safety") {
    val types = Map[String, DataType]("x" -> LongType, "d" -> DoubleType)
    val someNulls = fs("x" -> cs(1L, 5L, nulls = 3L))
    val noNulls = fs("x" -> cs(1L, 5L, nulls = 0L))
    val allNull = ColumnStats.FileStats(Some(4L),
      Map("x" -> ColumnStats.ColStats(None, None, Some(4L))))
    def may(f: Filter, s: ColumnStats.FileStats) =
      ColumnStats.mayMatch(f, s, types)
    assert(may(IsNull("x"), someNulls) && !may(IsNull("x"), noNulls))
    assert(may(IsNotNull("x"), someNulls) && !may(IsNotNull("x"), allNull))
    assert(!may(EqualTo("x", 3L), allNull),
      "an all-null column matches no value predicate")
    assert(may(EqualNullSafe("x", null), someNulls) &&
      !may(EqualNullSafe("x", null), noNulls))
    assert(may(EqualNullSafe("x", 3L), noNulls))
    // fractional upper bounds never prune > / >= (NaN hides above them)
    val d = fs("d" -> cs(1.0, 2.0))
    assert(may(GreaterThan("d", 100.0), d) &&
      may(GreaterThanOrEqual("d", 100.0), d))
    assert(!may(LessThan("d", 1.0), d), "lower bounds still prune <")
    assert(!may(EqualTo("d", 100.0), d), "equality still prunes")
    // Not(EqualTo): only a constant file prunes
    val constFile = fs("x" -> cs(7L, 7L, nulls = 0L))
    assert(!may(Not(EqualTo("x", 7L)), constFile))
    assert(may(Not(EqualTo("x", 7L)), noNulls))
    assert(may(Not(GreaterThan("x", 3L)), noNulls), "general Not keeps")
  }

  test("delta stats json: round trip across types") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("s", StringType), StructField("d", DoubleType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("b", BooleanType),
      StructField("dec", DecimalType(10, 2))))
    val ts = java.time.Instant.parse("2024-03-05T06:07:08.123456Z")
    val us = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
    val st = ColumnStats.FileStats(Some(42L), Map(
      "i" -> cs(-3L, 9L, 1L), "l" -> cs(10L, 20L),
      "s" -> cs("a\"b", "z"), "d" -> cs(1.5, 2.5),
      "dt" -> cs(java.time.LocalDate.parse("2024-03-05").toEpochDay,
        java.time.LocalDate.parse("2024-03-07").toEpochDay),
      "ts" -> cs(us, us + 1L),
      "b" -> cs(false, true), "dec" -> cs(BigDecimal("1.25"),
        BigDecimal("99.50"))))
    val json = ColumnStats.deltaStatsJson(st, schema)
    val back = ColumnStats.parseDeltaStats(json, schema)
    assert(back.numRecords.contains(42L))
    for (c <- Seq("i", "l", "s", "d", "dt", "b", "dec")) {
      assert(back.cols(c).min == st.cols(c).min, s"$c min")
      assert(back.cols(c).max == st.cols(c).max, s"$c max")
    }
    assert(back.cols("i").nullCount.contains(1L))
    // micros round-trip exactly; a whole-millis upper bound widens 999us
    assert(back.cols("ts").min.contains(us))
    assert(back.cols("ts").max.contains(us + 1L))
    val wholeMs = ColumnStats.FileStats(Some(1L),
      Map("ts" -> cs(1000000L, 2000000L)))
    val w = ColumnStats.parseDeltaStats(
      ColumnStats.deltaStatsJson(wholeMs, schema), schema)
    assert(w.cols("ts").min.contains(1000000L) &&
      w.cols("ts").max.contains(2000999L),
      "millis-precision writers floor the true max — widen upper bounds")
    // garbage and empty stats parse to NoStats, never throw
    assert(ColumnStats.parseDeltaStats("not json", schema).isEmptyStats)
    assert(ColumnStats.parseDeltaStats("", schema).isEmptyStats)
  }

  test("iceberg bound codec: appendix D round trip") {
    val cases: Seq[(DataType, Any)] = Seq(
      (IntegerType, 123L), (IntegerType, -7L), (LongType, 1L << 40),
      (DateType, 19790L), (TimestampType, 1709618828123456L),
      (FloatType, 1.5), (DoubleType, -2.25),
      (StringType, "héllo"), (BooleanType, true),
      (DecimalType(10, 2), BigDecimal("12.34")))
    cases.foreach { case (dt, v) =>
      val bytes = ColumnStats.icebergBound(dt, v).get
      assert(ColumnStats.icebergBoundValue(dt, bytes).contains(v),
        s"$dt / $v")
    }
    // NaN bounds decode to None (unusable), truncated buffers too
    val nan = ColumnStats.icebergBound(DoubleType, Double.NaN).get
    assert(ColumnStats.icebergBoundValue(DoubleType, nan).isEmpty)
    assert(ColumnStats.icebergBoundValue(LongType, Array[Byte](1, 2)).isEmpty)
  }

  // ----------------------------------------------------- delta end-to-end

  test("delta: footer stats land in the commit and prune reads") {
    val table = tmp()
    // four appends with DISJOINT id ranges → four+ files, prunable
    for (k <- 0 until 4)
      DeltaWriter.writeAppend(spark,
        spark.range(k * 100, (k + 1) * 100)
          .select($"id", concat(lit(s"doc$k-"), $"id").as("text"),
            ($"id" * 1.5).as("score")), table)
    val full = DeltaTable.read(spark, table)
    assert(full.inputFiles.length >= 4)
    // every add in the log carries stats with numRecords 100
    val log = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$table/_delta_log")).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
    val addLines = log.flatMap(p =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))).split('\n').filter(_.contains("\"add\"")))
    assert(addLines.nonEmpty && addLines.forall(l =>
      l.contains("\\\"numRecords\\\":") &&
        l.contains("\\\"minValues\\\":{\\\"id\\\":")), "stats written")

    val pruned = DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 150L)))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    assert(pruned.select($"text").as[String].collect().toSeq ==
      Seq("doc1-150"))
    // range predicate: only the covering file(s)
    val range = DeltaTable.readWhere(spark, table,
      Seq(GreaterThanOrEqual("id", 300L)))
    assert(range.count() == 100 &&
      range.inputFiles.length < full.inputFiles.length)
    // no match anywhere: zero files scanned, schema intact
    val none = DeltaTable.readWhere(spark, table,
      Seq(GreaterThan("id", 10000L)))
    assert(none.inputFiles.isEmpty && none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "text", "score"))
    // equivalence against the unpruned read under every arm
    for (f <- Seq[Filter](EqualTo("id", 150L), LessThan("id", 37L),
      In("id", Array(5L, 305L)), StringStartsWith("text", "doc2-"),
      Or(EqualTo("id", 5L), EqualTo("id", 399L)))) {
      val a = DeltaTable.readWhere(spark, table, Seq(f))
        .orderBy($"id").collect().toSeq
      val b = full.filter(ColumnStats.filterColumn(f))
        .orderBy($"id").collect().toSeq
      assert(a == b, s"pruned != unpruned for $f")
    }
    // empty filter list is the plain read
    assert(DeltaTable.readWhere(spark, table, Nil).count() == 400)
  }

  test("delta: partition values prune through the same path") {
    val table = tmp()
    DeltaWriter.writeAppend(spark,
      Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"),
        (4L, null.asInstanceOf[String], "d"))
        .toDF("id", "lang", "text"), table, partitionBy = Seq("lang"))
    val full = DeltaTable.read(spark, table)
    val en = DeltaTable.readWhere(spark, table, Seq(EqualTo("lang", "en")))
    assert(en.inputFiles.length < full.inputFiles.length)
    assert(en.inputFiles.forall(_.contains("lang=en")), en.inputFiles.toSeq)
    assert(en.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // null partition: IsNull reaches only the null dir; value predicates
    // prune it
    val isNull = DeltaTable.readWhere(spark, table, Seq(IsNull("lang")))
    assert(isNull.select($"id").as[Long].collect().toSeq == Seq(4L))
    assert(isNull.inputFiles.length == 1)
    assert(!en.select($"id").as[Long].collect().contains(4L))
    // composition: partition + data column
    val both = DeltaTable.readWhere(spark, table,
      Seq(EqualTo("lang", "en"), GreaterThan("id", 1L)))
    assert(both.select($"text").as[String].collect().toSeq == Seq("b"))
  }

  test("delta: stats survive DV deletes, checkpoints, and optimize") {
    val table = tmp()
    for (k <- 0 until 3)
      DeltaWriter.writeAppend(spark,
        spark.range(k * 100, (k + 1) * 100)
          .select($"id", ($"id" % 7).as("bucket")), table)
    // DV delete: the re-added file keeps its (superset) stats
    DeltaWriter.writeDelete(spark, table, $"id" === 150L, mode = "dv")
    val afterDv = DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 151L)))
    assert(afterDv.count() == 1 && afterDv.inputFiles.length <
      DeltaTable.read(spark, table).inputFiles.length)
    assert(DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 150L))).count() == 0,
      "stats keep the file but the DV kills the row")
    // checkpoint: stats carry into the parquet checkpoint verbatim —
    // prune from a checkpoint-only log (every commit json swept away)
    DeltaWriter.writeCheckpoint(spark, table)
    val logDir = java.nio.file.Paths.get(s"$table/_delta_log")
    java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .filter(p => p.endsWith(".json") && !p.contains("checkpoint"))
      .foreach(p => java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
    val fromCkpt = DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 250L)))
    assert(fromCkpt.count() == 1 && fromCkpt.inputFiles.length == 1,
      s"checkpoint-sourced stats must still prune: " +
        s"${fromCkpt.inputFiles.length} files")
    // optimize rewrites small files WITH fresh stats
    DeltaWriter.compact(spark, table)
    val afterOpt = DeltaTable.readWhere(spark, table,
      Seq(GreaterThan("id", 10000L)))
    assert(afterOpt.inputFiles.isEmpty && afterOpt.count() == 0)
    assert(DeltaTable.read(spark, table).count() == 299)
  }

  test("delta: files without stats are kept, never pruned") {
    val table = tmp()
    spark.range(0, 10).select($"id").coalesce(1)
      .write.mode("overwrite").parquet(table)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(table))
      .toArray.map(_.toString)
      .find(p => p.endsWith(".parquet") && !p.contains("_")).get
      .split('/').last
    // a hand-rolled log whose add has NO stats field (pre-stats writer)
    val logDir = java.nio.file.Paths.get(s"$table/_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    val schema = """{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}"""
    java.nio.file.Files.write(logDir.resolve("00000000000000000000.json"),
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" + "\n" +
        s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schema","partitionColumns":[],"configuration":{}}}""" + "\n" +
        s"""{"add":{"path":"$part","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""")
        .getBytes)
    val r = DeltaTable.readWhere(spark, table, Seq(EqualTo("id", 10000L)))
    assert(r.inputFiles.length == 1, "no stats — the file must be kept")
    assert(r.count() == 0, "the residual filter still applies")
  }

  test("review arms: NaN equality, UTF-8 order, decimal precision, " +
    "timestamp partition zone") {
    val types = Map[String, DataType]("d" -> DoubleType, "s" -> StringType)
    // EqualTo/In with a NaN literal: bounds exclude NaN and NaN = NaN is
    // TRUE in Spark — never prune
    val d = fs("d" -> cs(1.0, 2.0))
    assert(ColumnStats.mayMatch(EqualTo("d", Double.NaN), d, types))
    assert(ColumnStats.mayMatch(
      In("d", Array[Any](Double.NaN)), d, types))
    // code-point (= UTF-8 byte) order: supplementary chars sort ABOVE
    // the BMP, unlike String.compareTo's UTF-16 code units
    val emoji = new String(Character.toChars(0x1F600))
    assert("￿".compareTo(emoji) > 0, "UTF-16 order (the trap)")
    assert(ColumnStats.cmpUtf8("￿", emoji) < 0, "code-point order")
    val sf = fs("s" -> cs(emoji, emoji))
    assert(ColumnStats.mayMatch(GreaterThanOrEqual("s", "￿"), sf,
      types), "the emoji row matches >= \\uFFFF under Spark's collation")
    // decimal bounds round-trip at full precision (no double squeeze)
    val decSchema = StructType(Seq(StructField("x", DecimalType(38, 10))))
    val big = BigDecimal("12345678901234567890.1234567890")
    val st = ColumnStats.FileStats(Some(1L), Map("x" -> cs(big, big)))
    val back = ColumnStats.parseDeltaStats(
      ColumnStats.deltaStatsJson(st, decSchema), decSchema)
    assert(back.cols("x").min.contains(big) &&
      back.cols("x").max.contains(big))
    // timestamp partition values parse as UTC wall clock regardless of
    // the machine's default zone
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      val c = ColumnStats.partitionValueStats(
        Some("2024-01-01 00:00:00"), TimestampType, Some(10L))
      val expect = java.time.Instant.parse("2024-01-01T00:00:00Z")
      assert(c.min.contains(
        expect.getEpochSecond * 1000000L), c.min.toString)
    } finally java.util.TimeZone.setDefault(tz)
  }

  test("delta: DV re-add widens carried stats to tightBounds=false") {
    val table = tmp()
    DeltaWriter.writeAppend(spark,
      spark.range(0, 100).select($"id"), table)
    DeltaWriter.writeDelete(spark, table, $"id" === 5L, mode = "dv")
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$table/_delta_log/00000000000000000001.json")))
    val addLine = log.split('\n').find(_.contains("\"add\"")).get
    assert(addLine.contains("tightBounds\\\":false"), addLine)
    // stats still prune, DV still kills
    assert(DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 5L))).count() == 0)
    assert(DeltaTable.readWhere(spark, table,
      Seq(EqualTo("id", 6L))).count() == 1)
    assert(DeltaTable.readWhere(spark, table,
      Seq(GreaterThan("id", 1000L))).inputFiles.isEmpty)
  }

  test("readWhere plans: the residual predicate reaches the parquet " +
    "scan as PushedFilters") {
    // file pruning is metadata-side; ROW-GROUP skipping inside kept
    // files comes free only if the residual filter pushes down
    val table = tmp()
    for (k <- 0 until 2)
      DeltaWriter.writeAppend(spark,
        spark.range(k * 100, (k + 1) * 100).select($"id"), table)
    val plan = DeltaTable.readWhere(spark, table,
      Seq(GreaterThanOrEqual("id", 150L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,150)"), plan.take(2000))
    val it = tmp()
    IcebergWriter.writeAppend(spark,
      spark.range(0, 100).select($"id"), it)
    val iplan = IcebergTable.readWhere(spark, it,
      Seq(EqualTo("id", 5L)))
      .queryExecution.executedPlan.toString
    assert(iplan.contains("PushedFilters") &&
      iplan.contains("EqualTo(id,5)"), iplan.take(2000))
  }

  test("delta: NaN rows survive > pruning on double columns") {
    val table = tmp()
    DeltaWriter.writeAppend(spark,
      Seq((1L, 0.5), (2L, Double.NaN)).toDF("id", "v"), table)
    DeltaWriter.writeAppend(spark,
      Seq((3L, 0.1), (4L, 0.2)).toDF("id", "v"), table)
    // Spark orders NaN above every double — the NaN row matches > 1e300
    // and stats-based pruning must not lose it
    val r = DeltaTable.readWhere(spark, table,
      Seq(GreaterThan("v", 1e300)))
    assert(r.select($"id").as[Long].collect().toSeq == Seq(2L))
  }

  // --------------------------------------------------- iceberg end-to-end

  test("iceberg: manifest bounds land in the commit and prune reads") {
    val table = tmp()
    for (k <- 0 until 4)
      IcebergWriter.writeAppend(spark,
        spark.range(k * 100, (k + 1) * 100)
          .select($"id", concat(lit(s"doc$k-"), $"id").as("text"),
            ($"id" * 1.5).as("score")), table)
    val full = IcebergTable.read(spark, table)
    assert(full.inputFiles.length >= 4)
    val pruned = IcebergTable.readWhere(spark, table,
      Seq(EqualTo("id", 150L)))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"${pruned.inputFiles.length} vs ${full.inputFiles.length}")
    assert(pruned.select($"text").as[String].collect().toSeq ==
      Seq("doc1-150"))
    val none = IcebergTable.readWhere(spark, table,
      Seq(GreaterThan("id", 10000L)))
    assert(none.inputFiles.isEmpty && none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "text", "score"))
    for (f <- Seq[Filter](EqualTo("id", 150L), LessThan("id", 37L),
      In("id", Array(5L, 305L)), StringStartsWith("text", "doc2-"),
      EqualTo("score", 450.0))) {
      val a = IcebergTable.readWhere(spark, table, Seq(f))
        .orderBy($"id").collect().toSeq
      val b = full.filter(ColumnStats.filterColumn(f))
        .orderBy($"id").collect().toSeq
      assert(a == b, s"pruned != unpruned for $f")
    }
    assert(IcebergTable.readWhere(spark, table, Nil).count() == 400)
  }

  test("iceberg: deletes and rewrites keep pruning correct") {
    val table = tmp()
    for (k <- 0 until 3)
      IcebergWriter.writeAppend(spark,
        spark.range(k * 100, (k + 1) * 100).select($"id",
          ($"id" % 5).cast("int").as("grp")), table)
    // positional delete: the delete file is never pruned, so the killed
    // row stays dead under any pruning filter
    IcebergWriter.writeDelete(spark, table, $"id" === 150L)
    val afterDel = IcebergTable.readWhere(spark, table,
      Seq(EqualTo("id", 150L)))
    assert(afterDel.count() == 0)
    assert(IcebergTable.readWhere(spark, table,
      Seq(EqualTo("id", 151L))).count() == 1)
    // merge appends carry stats: a merge-written file prunes too
    IcebergWriter.writeMerge(spark, table,
      spark.range(1000, 1100).select($"id",
        ($"id" % 5).cast("int").as("grp")), keys = Seq("id"))
    val merged = IcebergTable.readWhere(spark, table,
      Seq(GreaterThanOrEqual("id", 1000L)))
    assert(merged.count() == 100)
    assert(merged.inputFiles.length <
      IcebergTable.read(spark, table).inputFiles.length,
      "the merge-written file carries bounds that exclude old files")
    // rewriteDataFiles emits fresh stats for the compacted files
    IcebergWriter.rewriteDataFiles(spark, table)
    val afterRw = IcebergTable.readWhere(spark, table,
      Seq(GreaterThan("id", 100000L)))
    assert(afterRw.inputFiles.isEmpty && afterRw.count() == 0)
    assert(IcebergTable.read(spark, table).count() == 399)
  }

  test("iceberg: identity-partitioned pruning via data-file bounds") {
    val table = tmp()
    // identity partitioning keeps the column IN the data files, so the
    // same bounds prune partition predicates — no separate path needed
    IcebergWriter.writeAppend(spark,
      Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"))
        .toDF("id", "lang", "text"), table, partitionBy = Seq("lang"))
    val full = IcebergTable.read(spark, table)
    val en = IcebergTable.readWhere(spark, table, Seq(EqualTo("lang", "en")))
    assert(en.inputFiles.length < full.inputFiles.length)
    assert(en.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
