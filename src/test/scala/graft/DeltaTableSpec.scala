package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{DeletionVector, DeltaTable}

/** Delta Lake snapshot reads over hand-authored protocol fixtures (the
  * PROTOCOL.md shapes): log replay, add/remove reconciliation, partition
  * reconstruction, time travel, checkpoint + tail, and the directed
  * guards for reader features that change data decoding. */
class DeltaTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("delta").toString

  private val fullSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType))) // partition column

  private val dataSchema = StructType(fullSchema.filterNot(_.name == "lang"))

  /** One data file under the table, returning its log-relative path. */
  private def dataFile(table: String, rel: String, ids: Seq[Long]): String = {
    val df = ids.toDF("id").select($"id", concat(lit("t"), $"id").as("text"))
    val target = s"$table/$rel"
    df.coalesce(1).write.mode("overwrite").parquet(s"$target.dir")
    // single parquet part -> the exact path the log will reference
    val part = new java.io.File(s"$target.dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/${rel.split('/').dropRight(1).mkString("/")}").mkdirs()
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$target.dir"))
    rel
  }

  private def metaDataJson: String = {
    val schemaStr = fullSchema.json.replace("\"", "\\\"")
    s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
      s""""configuration":{},"createdTime":1750000000000}}"""
  }

  private def addJson(path: String, lang: String): String =
    s"""{"add":{"path":"$path","partitionValues":{"lang":"$lang"},""" +
      s""""size":1000,"modificationTime":1750000000000,"dataChange":true}}"""

  private def writeCommit(table: String, version: Long,
      lines: Seq[String]): Unit = {
    val dir = s"$table/_delta_log"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(f"$dir/$version%020d.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private def commitInfo(op: String, ts: Long): String =
    s"""{"commitInfo":{"timestamp":$ts,"operation":"$op"}}"""

  test("snapshot read: replay, partitions, remove reconciliation, time travel") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "lang=de/part-001.parquet", Seq(3L))
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 1750000000000L),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson,
      addJson(f0, "en"), addJson(f1, "de")))
    // v1: add another en file, remove the de file
    val f2 = dataFile(table, "lang=en/part-002.parquet", Seq(4L, 5L))
    writeCommit(table, 1, Seq(
      commitInfo("MERGE", 1750000060000L),
      addJson(f2, "en"),
      s"""{"remove":{"path":"$f1","deletionTimestamp":1750000060000,"dataChange":true}}"""))

    val latest = DeltaTable.read(spark, table).orderBy($"id")
    assert(latest.columns.toSeq == Seq("id", "text", "lang"))
    assert(latest.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((1L, "t1", "en"), (2L, "t2", "en"),
        (4L, "t4", "en"), (5L, "t5", "en")))

    val v0 = DeltaTable.read(spark, table, versionAsOf = Some(0L)).orderBy($"id")
    assert(v0.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "en"), (2L, "en"), (3L, "de")))

    val hist = DeltaTable.history(spark, table).orderBy($"version").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(hist.map(_.getString(2)).toSeq == Seq("WRITE", "MERGE"))

    val e = intercept[Exception] {
      DeltaTable.read(spark, table, versionAsOf = Some(9L))
    }
    assert(e.getMessage.contains("not in the log"), e.getMessage)
  }

  private val ckptDdl =
    "protocol struct<minReaderVersion:int,minWriterVersion:int>, " +
      "metaData struct<id:string,schemaString:string," +
      "partitionColumns:array<string>>, " +
      "add struct<path:string,partitionValues:map<string,string>," +
      "size:bigint,modificationTime:bigint,dataChange:boolean>, " +
      "remove struct<path:string,deletionTimestamp:bigint>"

  test("checkpoint + commit tail: replay starts at the checkpoint") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "lang=fr/part-001.parquet", Seq(7L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson, addJson(f0, "en")))
    writeCommit(table, 1, Seq(addJson(f1, "fr")))
    // checkpoint at v1: protocol + metaData + both adds as parquet rows
    val actionLines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson,
      addJson(f0, "en"), addJson(f1, "fr"))
    val ckpt = spark.read.schema(ckptDdl).json(actionLines.toDS())
    ckpt.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_delta_log/ckpt.dir")
    val part = new java.io.File(s"$table/_delta_log/ckpt.dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(
      f"$table/_delta_log/${1L}%020d.checkpoint.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$table/_delta_log/ckpt.dir"))
    // log cleanup: the pre-checkpoint commits vanish (the VACUUM shape);
    // v2 then adds one more file
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      f"$table/_delta_log/${0L}%020d.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      f"$table/_delta_log/${1L}%020d.json"))
    val f2 = dataFile(table, "lang=en/part-002.parquet", Seq(9L))
    writeCommit(table, 2, Seq(addJson(f2, "en")))

    val df = DeltaTable.read(spark, table).orderBy($"id")
    assert(df.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "en"), (2L, "en"), (7L, "fr"), (9L, "en")))
  }

  test("v2 checkpoint: sidecar parquets carry the file actions") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "lang=fr/part-001.parquet", Seq(7L))
    // two sidecars under _delta_log/_sidecars/, one add each
    val scDdl = "add struct<path:string,partitionValues:map<string,string>," +
      "size:bigint,modificationTime:bigint,dataChange:boolean>"
    def sidecar(name: String, addLine: String): Unit = {
      val df = spark.read.schema(scDdl).json(Seq(addLine).toDS())
      df.coalesce(1).write.mode("overwrite")
        .parquet(s"$table/_delta_log/_sidecars/$name.dir")
      val part = new java.io.File(s"$table/_delta_log/_sidecars/$name.dir")
        .listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$table/_delta_log/_sidecars/$name"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$table/_delta_log/_sidecars/$name.dir"))
    }
    sidecar("sc-1.parquet", addJson(f0, "en"))
    sidecar("sc-2.parquet", addJson(f1, "fr"))
    // the V2 top-level parquet: protocol + metaData + checkpointMetadata
    // + the two sidecar pointers
    val topDdl =
      "protocol struct<minReaderVersion:int,minWriterVersion:int," +
        "readerFeatures:array<string>>, " +
        "metaData struct<id:string,schemaString:string," +
        "partitionColumns:array<string>>, " +
        "checkpointMetadata struct<version:bigint>, " +
        "sidecar struct<path:string,sizeInBytes:bigint,modificationTime:bigint>"
    val topLines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"]}}""",
      metaDataJson,
      """{"checkpointMetadata":{"version":1}}""",
      """{"sidecar":{"path":"sc-1.parquet","sizeInBytes":10,"modificationTime":0}}""",
      """{"sidecar":{"path":"sc-2.parquet","sizeInBytes":10,"modificationTime":0}}""")
    val top = spark.read.schema(topDdl).json(topLines.toDS())
    top.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_delta_log/top.dir")
    val tp = new java.io.File(s"$table/_delta_log/top.dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(tp.toPath, java.nio.file.Paths.get(
      f"$table/_delta_log/${1L}%020d.checkpoint.80a083e8.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$table/_delta_log/top.dir"))
    // json tail past the checkpoint adds one more file
    val f2 = dataFile(table, "lang=en/part-002.parquet", Seq(9L))
    writeCommit(table, 2, Seq(addJson(f2, "en")))
    val df = DeltaTable.read(spark, table).orderBy($"id")
    assert(df.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "en"), (2L, "en"), (7L, "fr"), (9L, "en")))
  }

  test("v2 checkpoint: JSON top-level with a sidecar") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(4L, 5L))
    val scDdl = "add struct<path:string,partitionValues:map<string,string>," +
      "size:bigint,modificationTime:bigint,dataChange:boolean>"
    val df0 = spark.read.schema(scDdl).json(Seq(addJson(f0, "en")).toDS())
    df0.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_delta_log/_sidecars/sc.dir")
    val part = new java.io.File(s"$table/_delta_log/_sidecars/sc.dir")
      .listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$table/_delta_log/_sidecars/sc-0.parquet"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      f"$table/_delta_log/${0L}%020d.checkpoint.11112222.json"),
      (Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["v2Checkpoint"]}}""",
        metaDataJson,
        """{"checkpointMetadata":{"version":0}}""",
        """{"sidecar":{"path":"sc-0.parquet","sizeInBytes":10,"modificationTime":0}}""")
        .mkString("\n")).getBytes("UTF-8"))
    writeCommit(table, 1, Seq(commitInfo("OPTIMIZE", 1)))
    val got = DeltaTable.read(spark, table).orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4L, 5L))
    assert(got.map(_.getString(2)).distinct.toSeq == Seq("en"))
  }

  test("readChanges serves exactly the files newly active in the range") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson, addJson(f0, "en")))
    val f1 = dataFile(table, "lang=de/part-001.parquet", Seq(3L))
    val f2 = dataFile(table, "lang=en/part-002.parquet", Seq(4L))
    writeCommit(table, 1, Seq(addJson(f1, "de"), addJson(f2, "en"),
      s"""{"remove":{"path":"$f0","deletionTimestamp":1,"dataChange":true}}"""))
    val f3 = dataFile(table, "lang=en/part-003.parquet", Seq(5L))
    writeCommit(table, 2, Seq(addJson(f3, "en"),
      s"""{"remove":{"path":"$f1","deletionTimestamp":2,"dataChange":true}}"""))
    // since v0: f1 added-then-removed never appears; f2 + f3 do; f0 is old
    val delta01 = DeltaTable.readChanges(spark, table, fromVersion = 0L)
    assert(delta01.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
    // since v1: only f3
    val delta12 = DeltaTable.readChanges(spark, table, fromVersion = 1L)
    assert(delta12.collect().map(_.getLong(0)).toSeq == Seq(5L))
    // a bounded range: v0 -> v1 sees f1 and f2 (f1 was active AT v1)
    val bounded = DeltaTable.readChanges(spark, table, 0L, Some(1L))
    assert(bounded.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // nothing new: empty but typed
    assert(DeltaTable.readChanges(spark, table, 2L).count() == 0)
    // a REVERSED range would serve deleted files: directed error
    val e = intercept[Exception] {
      DeltaTable.readChanges(spark, table, 2L, Some(0L))
    }
    assert(e.getMessage.contains("reversed"), e.getMessage)
  }

  test("partition predicates prune whole file groups via constant folding") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "lang=de/part-001.parquet", Seq(3L, 4L))
    val f2 = dataFile(table, "lang=fr/part-002.parquet", Seq(5L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson,
      addJson(f0, "en"), addJson(f1, "de"), addJson(f2, "fr")))
    // partition columns are per-group literals, so a partition predicate
    // constant-folds every other group's union branch away — the file
    // set Spark touches shrinks to the matching partition
    val pruned = DeltaTable.read(spark, table).filter($"lang" === "de")
    val files = pruned.inputFiles
    assert(files.length == 1 && files.head.contains("lang=de"),
      s"expected only the de file, got ${files.toSeq}")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }

  test("reader guards are directed: versions, features") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataJson, addJson(f0, "en")))
    val e = intercept[Exception] { DeltaTable.read(spark, table) }
    assert(e.getMessage.contains("minReaderVersion 2"), e.getMessage)

    // v3 with the deletionVectors feature (and no actual DVs) reads fine —
    // the feature is implemented, not merely tolerated
    val t2 = tmp()
    val g0 = dataFile(t2, "lang=en/part-000.parquet", Seq(1L))
    writeCommit(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaDataJson, addJson(g0, "en")))
    assert(DeltaTable.read(spark, t2).count() == 1)

    // v3 with only harmless features reads fine
    val t3 = tmp()
    val h0 = dataFile(t3, "lang=en/part-000.parquet", Seq(5L))
    writeCommit(t3, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["timestampNtz"],"writerFeatures":["timestampNtz"]}}""",
      metaDataJson, addJson(h0, "en")))
    assert(DeltaTable.read(spark, t3).count() == 1)

    // the columnMapping FEATURE with no mode set reads fine (mode none),
    // as does v2Checkpoint (implemented); an UNKNOWN reader feature that
    // could change data decoding stays directed
    val t4 = tmp()
    val k0 = dataFile(t4, "lang=en/part-000.parquet", Seq(5L))
    writeCommit(t4, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","v2Checkpoint"],""" +
        """"writerFeatures":["columnMapping","v2Checkpoint"]}}""",
      metaDataJson, addJson(k0, "en")))
    assert(DeltaTable.read(spark, t4).count() == 1)
    val t4b = tmp()
    val k1 = dataFile(t4b, "lang=en/part-000.parquet", Seq(5L))
    writeCommit(t4b, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""",
      metaDataJson, addJson(k1, "en")))
    val e4 = intercept[Exception] { DeltaTable.read(spark, t4b) }
    assert(e4.getMessage.contains("typeWidening"), e4.getMessage)

    // not a delta table
    val e5 = intercept[Exception] { DeltaTable.read(spark, tmp()) }
    assert(e5.getMessage.contains("_delta_log"), e5.getMessage)

    // a GAP in the commit log (lost json, mid-sync listing) is a directed
    // error, never a silently wrong snapshot
    val t5 = tmp()
    val m0 = dataFile(t5, "lang=en/part-000.parquet", Seq(1L))
    writeCommit(t5, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson, addJson(m0, "en")))
    writeCommit(t5, 2, Seq(addJson(m0, "en"))) // version 1 missing
    val e6 = intercept[Exception] { DeltaTable.read(spark, t5) }
    assert(e6.getMessage.contains("not contiguous"), e6.getMessage)
  }

  test("column mapping (name mode): nested physical names decode to logical") {
    val table = tmp()
    def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aa", 1)),
      StructField("info", StructType(Seq(
        StructField("score", DoubleType, nullable = true, meta("col-cc", 3)),
        StructField("tags", ArrayType(StructType(Seq(
          StructField("k", StringType, nullable = true, meta("col-ee", 5))))),
          nullable = true, meta("col-dd", 4)))),
        nullable = true, meta("col-bb", 2)),
      StructField("lang", StringType, nullable = true, meta("col-ff", 6))))
    // the parquet file stores PHYSICAL names at every level
    val physRows = Seq(
      Row(1L, Row(0.5, Seq(Row("x"), Row("y")))),
      Row(2L, null)) // a null struct must stay null, not become a row of nulls
    val physSchema = StructType(Seq(
      StructField("col-aa", LongType),
      StructField("col-bb", StructType(Seq(
        StructField("col-cc", DoubleType),
        StructField("col-dd", ArrayType(StructType(Seq(
          StructField("col-ee", StringType))))))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(physRows, 1), physSchema)
    df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp0")
    val part = new java.io.File(s"$table/tmp0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/p").mkdirs()
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$table/p/part-000.parquet"))
    val schemaStr = logical.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 0),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"6"},""" +
        s""""createdTime":0}}""",
      // partitionValues keyed by the PHYSICAL partition-column name
      s"""{"add":{"path":"p/part-000.parquet","partitionValues":{"col-ff":"en"},""" +
        s""""size":10,"modificationTime":0,"dataChange":true}}"""))
    val got = DeltaTable.read(spark, table).orderBy($"id")
    assert(got.columns.toSeq == Seq("id", "info", "lang"))
    val rows = got.collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(2) == "en")
    val info = rows(0).getStruct(1)
    assert(info.getDouble(0) == 0.5)
    assert(info.getSeq[Row](1).map(_.getString(0)) == Seq("x", "y"))
    assert(rows(1).isNullAt(1), "null struct must survive the relabel")
  }

  test("column mapping (id mode): parquet field ids resolve renamed columns") {
    // the id-mode contract: the files' column NAMES are not authoritative
    // — only field ids connect the log schema to the parquet columns.
    // This fixture's parquet names (pq_x/pq_y/pq_z) match NEITHER the
    // logical nor the physical names, so a name-based read would miss
    // every column; field-id resolution must carry it.
    val table = tmp()
    def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aa", 1)),
      StructField("info", StructType(Seq(
        StructField("score", DoubleType, nullable = true, meta("col-cc", 3)))),
        nullable = true, meta("col-bb", 2)),
      StructField("lang", StringType, nullable = true, meta("col-ff", 6))))
    def fid(id: Int): Metadata = new MetadataBuilder()
      .putLong("parquet.field.id", id.toLong).build()
    val fileSchema = StructType(Seq(
      StructField("pq_x", LongType, nullable = true, fid(1)),
      StructField("pq_y", StructType(Seq(
        StructField("pq_z", DoubleType, nullable = true, fid(3)))),
        nullable = true, fid(2))))
    val rows = Seq(Row(1L, Row(0.5)), Row(2L, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), fileSchema)
    df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp0")
    val part = new java.io.File(s"$table/tmp0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/p").mkdirs()
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$table/p/part-000.parquet"))
    val schemaStr = logical.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 0),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"6"},""" +
        s""""createdTime":0}}""",
      s"""{"add":{"path":"p/part-000.parquet","partitionValues":{"col-ff":"en"},""" +
        s""""size":10,"modificationTime":0,"dataChange":true}}"""))
    val got = DeltaTable.read(spark, table).orderBy($"id")
    assert(got.columns.toSeq == Seq("id", "info", "lang"))
    val out = got.collect()
    assert(out(0).getLong(0) == 1L && out(0).getString(2) == "en")
    assert(out(0).getStruct(1).getDouble(0) == 0.5)
    assert(out(1).isNullAt(1), "null struct must survive the relabel")
    // a schema field with no columnMapping id cannot resolve — directed
    val t2 = tmp()
    val noId = StructType(Seq(StructField("id", LongType)))
    val noIdStr = noId.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$noIdStr","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"id"},"createdTime":0}}""",
      s"""{"add":{"path":"p/x.parquet","partitionValues":{},""" +
        s""""size":10,"modificationTime":0,"dataChange":true}}"""))
    val e = intercept[Exception] { DeltaTable.read(spark, t2) }
    assert(e.getMessage.contains("delta.columnMapping.id"), e.getMessage)
  }

  test("change data feed: cdc files verbatim, synthesized insert/delete") {
    val table = tmp()
    val cdfMeta = {
      val schemaStr = fullSchema.json.replace("\"", "\\\"")
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}"""
    }
    // v0: plain insert of f0
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L))
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 1000L),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      cdfMeta, addJson(f0, "en")))
    // v1: an UPDATE with a cdc file (pre/post images) — the cdc rows are
    // authoritative; the accompanying add must NOT synthesize inserts
    val cdcRows = Seq((2L, "t2", "update_preimage"),
      (2L, "t2b", "update_postimage"))
      .toDF("id", "text", "_change_type")
    cdcRows.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_change_data/tmp")
    val cdcPart = new java.io.File(s"$table/_change_data/tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(cdcPart.toPath, java.nio.file.Paths.get(
      s"$table/_change_data/cdc-000.parquet"))
    val f1 = dataFile(table, "lang=en/part-001.parquet", Seq(1L, 2L))
    writeCommit(table, 1, Seq(
      commitInfo("UPDATE", 2000L),
      s"""{"cdc":{"path":"_change_data/cdc-000.parquet","partitionValues":{"lang":"en"},"size":1,"dataChange":false}}""",
      addJson(f1, "en"),
      s"""{"remove":{"path":"$f0","deletionTimestamp":2000,"dataChange":true,"partitionValues":{"lang":"en"}}}"""))
    // v2: no cdc — a dataChange add + remove synthesize insert + delete
    val f2 = dataFile(table, "lang=de/part-002.parquet", Seq(9L))
    writeCommit(table, 2, Seq(
      commitInfo("MERGE", 3000L),
      addJson(f2, "de"),
      s"""{"remove":{"path":"$f1","deletionTimestamp":3000,"dataChange":true,"partitionValues":{"lang":"en"}}}"""))

    val feed = DeltaTable.readCdf(spark, table, 0L)
      .orderBy($"_commit_version", $"_change_type", $"id")
    assert(feed.columns.toSeq == Seq("id", "text", "lang",
      "_change_type", "_commit_version", "_commit_timestamp"))
    val got = feed.collect().map(r => (r.getLong(4), r.getString(3),
      r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (0L, "insert", 1L, "t1", "en"),
      (0L, "insert", 2L, "t2", "en"),
      (1L, "update_postimage", 2L, "t2b", "en"),
      (1L, "update_preimage", 2L, "t2", "en"),
      (2L, "delete", 1L, "t1", "en"),
      (2L, "delete", 2L, "t2", "en"),
      (2L, "insert", 9L, "t9", "de")), got.toSeq.toString)
    // bounded range: version 2 only
    assert(DeltaTable.readCdf(spark, table, 2L).count() == 3)
    // the feed is directed-off without the table property
    val t2 = tmp()
    val g0 = dataFile(t2, "lang=en/part-000.parquet", Seq(1L))
    writeCommit(t2, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataJson, addJson(g0, "en")))
    val e = intercept[Exception] { DeltaTable.readCdf(spark, t2, 0L) }
    assert(e.getMessage.contains("enableChangeDataFeed"), e.getMessage)
    // …and a range REACHING BACK before enablement is directed too, even
    // when the final configuration carries the flag
    val cdfMeta2 = {
      val schemaStr = fullSchema.json.replace("\"", "\\\"")
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}"""
    }
    val g1 = dataFile(t2, "lang=en/part-001.parquet", Seq(2L))
    writeCommit(t2, 1, Seq(cdfMeta2, addJson(g1, "en")))
    val e2 = intercept[Exception] { DeltaTable.readCdf(spark, t2, 0L) }
    assert(e2.getMessage.contains("was not set"), e2.getMessage)
    // from the enablement version on, the feed serves
    assert(DeltaTable.readCdf(spark, t2, 1L).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("change data feed honors deletion vectors in synthesized rows") {
    val table = tmp()
    val cdfMeta = {
      val schemaStr = fullSchema.json.replace("\"", "\\\"")
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}"""
    }
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L, 3L))
    val dv = DeletionVector.serialize(Array(1L)) // id 2 already dead
    val (off, size) = DeletionVector.writeFile(
      s"$table/dv0.bin", dv, spark.sparkContext.hadoopConfiguration)
    val dvJson =
      s""","deletionVector":{"storageType":"p","pathOrInlineDv":"$table/dv0.bin",""" +
        s""""offset":$off,"sizeInBytes":$size,"cardinality":1}"""
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 1000L),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      cdfMeta,
      s"""{"add":{"path":"$f0","partitionValues":{"lang":"en"},"size":10,""" +
        s""""modificationTime":0,"dataChange":true$dvJson}}"""))
    // v0 synthesized inserts = the add's LIVE rows only
    val v0 = DeltaTable.readCdf(spark, table, 0L, Some(0L))
    assert(v0.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // v1 removes the file (same DV): deletes = rows live at removal
    writeCommit(table, 1, Seq(
      commitInfo("DELETE", 2000L),
      s"""{"remove":{"path":"$f0","deletionTimestamp":2000,"dataChange":true,""" +
        s""""partitionValues":{"lang":"en"}$dvJson}}"""))
    val v1 = DeltaTable.readCdf(spark, table, 1L)
    assert(v1.collect().map(r => (r.getLong(0), r.getString(3))).sorted
      .toSeq == Seq((1L, "delete"), (3L, "delete")))
    // a cdc-less DV REWRITE (same path in add+remove with DVs) is directed
    val dv2 = DeletionVector.serialize(Array(0L, 1L))
    val (off2, size2) = DeletionVector.writeFile(
      s"$table/dv1.bin", dv2, spark.sparkContext.hadoopConfiguration)
    writeCommit(table, 2, Seq(
      commitInfo("DELETE", 3000L),
      s"""{"add":{"path":"$f0","partitionValues":{"lang":"en"},"size":10,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"p","pathOrInlineDv":"$table/dv1.bin",""" +
        s""""offset":$off2,"sizeInBytes":$size2,"cardinality":2}}}""",
      s"""{"remove":{"path":"$f0","deletionTimestamp":3000,"dataChange":true,""" +
        s""""partitionValues":{"lang":"en"}$dvJson}}"""))
    val e = intercept[Exception] { DeltaTable.readCdf(spark, table, 2L) }
    assert(e.getMessage.contains("rewrites deletion vectors"), e.getMessage)
  }

  test("deletion vectors compose with column mapping (the Databricks shape)") {
    // modern Databricks tables carry BOTH: physical column names in the
    // parquet AND row-level deletes as DVs — the anti-join must run on
    // the physical read before the logical relabel
    val table = tmp()
    def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", LongType, nullable = true, meta("col-aa", 1)),
      StructField("text", StringType, nullable = true, meta("col-bb", 2))))
    val physSchema = StructType(Seq(
      StructField("col-aa", LongType),
      StructField("col-bb", StringType)))
    val rows = (1L to 5L).map(i => Row(i, s"t$i"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), physSchema)
    df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp0")
    val part = new java.io.File(s"$table/tmp0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$table/part-000.parquet"))
    val dv = DeletionVector.serialize(Array(1L, 3L)) // ids 2 and 4 dead
    val (off, size) = DeletionVector.writeFile(s"$table/dv0.bin", dv,
      spark.sparkContext.hadoopConfiguration)
    val schemaStr = logical.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 0),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping","deletionVectors"],""" +
        """"writerFeatures":["columnMapping","deletionVectors"]}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name"},"createdTime":0}}""",
      s"""{"add":{"path":"part-000.parquet","partitionValues":{},"size":10,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"p","pathOrInlineDv":"$table/dv0.bin",""" +
        s""""offset":$off,"sizeInBytes":$size,"cardinality":2}}}"""))
    val got = DeltaTable.read(spark, table).orderBy($"id")
    assert(got.columns.toSeq == Seq("id", "text"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "t1"), (3L, "t3"), (5L, "t5")))
  }

  test("cdf: a bare remove falls back to the replayed add's deletion vector") {
    // PROTOCOL.md only says remove fields "should" mirror the add — a
    // writer may emit a bare remove of a DV-carrying file. Trusting the
    // remove verbatim would report the already-deleted row as a delete;
    // the replayed add state is authoritative.
    val table = tmp()
    val cdfMeta = {
      val schemaStr = fullSchema.json.replace("\"", "\\\"")
      s"""{"metaData":{"id":"t-1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}"""
    }
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L, 3L))
    val dv = DeletionVector.serialize(Array(1L)) // id 2 already dead
    val (off, size) = DeletionVector.writeFile(
      s"$table/dv0.bin", dv, spark.sparkContext.hadoopConfiguration)
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 1000L),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      cdfMeta,
      s"""{"add":{"path":"$f0","partitionValues":{"lang":"en"},"size":10,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":""" +
        s"""{"storageType":"p","pathOrInlineDv":"$table/dv0.bin",""" +
        s""""offset":$off,"sizeInBytes":$size,"cardinality":1}}}"""))
    // the bare remove also omits partitionValues — both resolve from the
    // replayed add
    writeCommit(table, 1, Seq(
      commitInfo("DELETE", 2000L),
      s"""{"remove":{"path":"$f0","deletionTimestamp":2000,"dataChange":true}}"""))
    val v1 = DeltaTable.readCdf(spark, table, 1L)
    val got = v1.collect()
      .map(r => (r.getLong(0), r.getString(3), r.getString(2))).sorted
    assert(got.toSeq == Seq((1L, "delete", "en"), (3L, "delete", "en")),
      got.toSeq.toString)
  }

  test("path canonicalization: authority-bearing file URIs keep the host") {
    import graft.sources.PathUris
    assert(PathUris.canon("/a/b") == "file:///a/b")
    assert(PathUris.canon("file:/a/b") == "file:///a/b")
    assert(PathUris.canon("file:///a/b") == "file:///a/b")
    assert(PathUris.canon("file:////a/b") == "file:///a/b")
    assert(PathUris.canon("file://localhost/a/b") == "file:///a/b")
    // a non-local authority is a DIFFERENT location, not a path segment
    assert(PathUris.canon("file://host/a/b") == "file://host/a/b")
    assert(PathUris.canon("s3a://bucket/k") == "s3a://bucket/k")
    // the Column twin agrees on every spelling
    val vals = Seq("/a/b", "file:/a/b", "file:///a/b", "file:////a/b",
      "file://localhost/a/b", "file://host/a/b", "s3a://bucket/k")
    val got = vals.toDF("p").select(PathUris.canonCol($"p").as("c"))
      .as[String].collect()
    assert(got.toSeq == vals.map(PathUris.canon), got.toSeq.toString)
  }

  test("deletion vector codec: z85 + portable roaring round trips") {
    // z85: the ZeroMQ spec-32 reference vector
    assert(DeletionVector.z85Encode(
      Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
        .map(_.toByte)) == "HelloWorld")
    assert(DeletionVector.z85Decode("HelloWorld").toSeq ==
      Seq(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte))
    // array container + a second 32-bit key (row index above 2^32)
    val small = Array(0L, 1L, 5L, 70000L, (1L << 32) + 3L, (1L << 32) + 9L)
    assert(DeletionVector.deserialize(
      DeletionVector.serialize(small)).toSeq == small.toSeq)
    // bitmap container: > 4096 values inside one 16-bit chunk
    val dense = (0 until 5000).map(i => (i * 13 % 65536).toLong)
      .distinct.sorted.toArray
    assert(dense.length > 4096)
    assert(DeletionVector.deserialize(
      DeletionVector.serialize(dense)).toSeq == dense.toSeq)
    // magic guard
    val bad = DeletionVector.serialize(small)
    bad(0) = 0x7f
    val e = intercept[Exception] { DeletionVector.deserialize(bad) }
    assert(e.getMessage.contains("magic"), e.getMessage)
  }

  test("deletion vectors applied: on-disk uuid path, inline, mixed groups") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet",
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val f1 = dataFile(table, "lang=de/part-001.parquet", Seq(10L, 11L, 12L))
    val f2 = dataFile(table, "lang=en/part-002.parquet", Seq(20L, 21L))
    // DV for f0 (storageType u): kill positions 1 and 3 (ids 2, 4)
    val uuid = new java.util.UUID(0x0123456789abcdefL, 0x0fedcba987654321L)
    val uuidBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    val data0 = DeletionVector.serialize(Array(1L, 3L))
    new java.io.File(s"$table/ab").mkdirs()
    val (off0, size0) = DeletionVector.writeFile(
      s"$table/ab/deletion_vector_$uuid.bin", data0,
      spark.sparkContext.hadoopConfiguration)
    val pod0 = "ab" + DeletionVector.z85Encode(uuidBytes)
    // DV for f1 (inline): kill position 0 (id 10)
    val data1 = DeletionVector.serialize(Array(0L))
    val pod1 = DeletionVector.z85Encode(
      data1 ++ Array.fill((4 - data1.length % 4) % 4)(0.toByte))
    def addDv(path: String, lang: String, dv: String): String =
      s"""{"add":{"path":"$path","partitionValues":{"lang":"$lang"},""" +
        s""""size":1000,"modificationTime":0,"dataChange":true,""" +
        s""""deletionVector":$dv}}"""
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 0),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaDataJson,
      addDv(f0, "en",
        s"""{"storageType":"u","pathOrInlineDv":"$pod0","offset":$off0,""" +
          s""""sizeInBytes":$size0,"cardinality":2}"""),
      addDv(f1, "de",
        s"""{"storageType":"i","pathOrInlineDv":"$pod1",""" +
          s""""sizeInBytes":${data1.length},"cardinality":1}"""),
      addJson(f2, "en"))) // the en group MIXES DV'd and clean files
    val df = DeltaTable.read(spark, table).orderBy($"id")
    assert(df.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "en"), (3L, "en"), (5L, "en"), (6L, "en"),
        (11L, "de"), (12L, "de"), (20L, "en"), (21L, "en")))
  }

  test("deletion vectors apply across percent-encoded paths (space in dir)") {
    // the silent-resurrection trap: add.path is percent-encoded in the
    // log, Spark's _metadata.file_path is a percent-ENCODED URI, and the
    // DV descriptor keys deletes by the file — all three spellings must
    // meet in the anti-join or deleted rows come back
    val table = tmp()
    val f0 = dataFile(table, "lang=a b/part-000.parquet", Seq(1L, 2L, 3L))
    val data = DeletionVector.serialize(Array(1L)) // kill id 2
    val (off, size) = DeletionVector.writeFile(
      s"$table/dv0.bin", data, spark.sparkContext.hadoopConfiguration)
    writeCommit(table, 0, Seq(
      commitInfo("WRITE", 0),
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaDataJson,
      s"""{"add":{"path":"lang=a%20b/part-000.parquet","partitionValues":{"lang":"a b"},""" +
        s""""size":1000,"modificationTime":0,"dataChange":true,""" +
        s""""deletionVector":{"storageType":"p","pathOrInlineDv":"$table/dv0.bin",""" +
        s""""offset":$off,"sizeInBytes":$size,"cardinality":1}}}"""))
    val got = DeltaTable.read(spark, table).orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      got.map(_.getLong(0)).toSeq.toString)
    assert(got.map(_.getString(2)).distinct.toSeq == Seq("a b"))
  }

  test("malformed DV payloads fail directed, not with a raw buffer error") {
    // an intact-CRC blob whose body lies about its bitmap count
    val data = DeletionVector.serialize(Array(1L, 2L))
    data(4) = 99 // nMaps LE low byte: declare 99 bitmaps
    val e = intercept[Exception] { DeletionVector.deserialize(data) }
    assert(e.isInstanceOf[DeletionVector.BadDeletionVector] &&
      e.getMessage.contains("malformed"), e.toString)
  }

  test("deletion vectors: checkpoint descriptors and the crc guard") {
    val table = tmp()
    val f0 = dataFile(table, "lang=en/part-000.parquet", Seq(1L, 2L, 3L))
    val data = DeletionVector.serialize(Array(2L)) // kill id 3
    val (off, size) = DeletionVector.writeFile(
      s"$table/dv0.bin", data, spark.sparkContext.hadoopConfiguration)
    val dvJson =
      s"""{"storageType":"p","pathOrInlineDv":"$table/dv0.bin",""" +
        s""""offset":$off,"sizeInBytes":$size,"cardinality":1}"""
    // checkpoint at v0 carrying the DV struct; no json tail survives
    val ckptDvDdl =
      "protocol struct<minReaderVersion:int,minWriterVersion:int," +
        "readerFeatures:array<string>>, " +
        "metaData struct<id:string,schemaString:string," +
        "partitionColumns:array<string>>, " +
        "add struct<path:string,partitionValues:map<string,string>," +
        "size:bigint,modificationTime:bigint,dataChange:boolean," +
        "deletionVector:struct<storageType:string,pathOrInlineDv:string," +
        "offset:int,sizeInBytes:int,cardinality:bigint>>"
    val actionLines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"]}}""",
      metaDataJson,
      s"""{"add":{"path":"$f0","partitionValues":{"lang":"en"},"size":10,""" +
        s""""modificationTime":0,"dataChange":true,"deletionVector":$dvJson}}""")
    val ckpt = spark.read.schema(ckptDvDdl).json(actionLines.toDS())
    ckpt.coalesce(1).write.mode("overwrite")
      .parquet(s"$table/_delta_log/ckpt.dir")
    val part = new java.io.File(s"$table/_delta_log/ckpt.dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/_delta_log").mkdirs()
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(
      f"$table/_delta_log/${0L}%020d.checkpoint.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$table/_delta_log/ckpt.dir"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/_delta_log/_last_checkpoint"),
      """{"version":0,"size":3}""".getBytes("UTF-8"))
    writeCommit(table, 1, Seq(commitInfo("OPTIMIZE", 1)))
    assert(DeltaTable.read(spark, table).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))

    // corrupt one DV byte: the checksum guard must refuse, directed
    val raf = new java.io.RandomAccessFile(s"$table/dv0.bin", "rw")
    raf.seek(off + 4 + 2); val b = raf.read(); raf.seek(off + 4 + 2)
    raf.write(b ^ 0x40); raf.close()
    // drop hadoop's LocalFS .crc sidecar so the DV-level guard (not the
    // filesystem's) is what fires
    new java.io.File(s"$table/.dv0.bin.crc").delete()
    val e = intercept[Exception] {
      DeltaTable.read(spark, table).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("checksum") ||
        Option(e.getCause).exists(_.getMessage.contains("checksum"))),
      s"${e.getMessage} / ${Option(e.getCause).map(_.getMessage)}")
  }
}
