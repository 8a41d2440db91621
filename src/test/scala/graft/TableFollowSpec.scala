package graft

import org.apache.spark.sql.functions._

import graft.sources.AvroOcf
import graft.streaming.TableFollow

/** Incremental table consumption: cursor checkpointing, exactly the new
  * files per tick, zero-IO idle ticks, and crash-restart continuity over
  * hand-authored Delta and Iceberg fixtures. */
class TableFollowSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("follow").toString

  // ---------------------------------------------------------- delta fixture

  private val schemaStr = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text",
      org.apache.spark.sql.types.StringType))).json.replace("\"", "\\\"")

  private def dataFile(table: String, rel: String, ids: Seq[Long]): String = {
    val df = ids.toDF("id").select($"id", concat(lit("t"), $"id").as("text"))
    val target = s"$table/$rel"
    df.coalesce(1).write.mode("overwrite").parquet(s"$target.dir")
    val part = new java.io.File(s"$target.dir").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$target.dir"))
    rel
  }

  private def writeCommit(table: String, version: Long,
      lines: Seq[String]): Unit = {
    new java.io.File(s"$table/_delta_log").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(f"$table/_delta_log/$version%020d.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  private def add(rel: String): String =
    s"""{"add":{"path":"$rel","partitionValues":{},"size":10,""" +
      s""""modificationTime":0,"dataChange":true}}"""

  test("delta follow: initial load, per-tick increments, restart continuity") {
    val table = tmp()
    val ckpt = s"$table/cursor"
    val f0 = dataFile(table, "part-000.parquet", Seq(1L, 2L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{},"createdTime":0}}""",
      add(f0)))

    var batches = Vector.empty[(Long, Seq[Long])]
    def proc(df: org.apache.spark.sql.DataFrame, cur: Long): Unit =
      batches :+= (cur, df.select($"id").as[Long].collect().sorted.toSeq)

    // tick 1: never consumed -> full snapshot; tick 2: idle
    assert(TableFollow.followDeltaOnce(spark, table, ckpt)(proc) == Some(0L))
    assert(TableFollow.followDeltaOnce(spark, table, ckpt)(proc).isEmpty)
    assert(batches == Vector((0L, Seq(1L, 2L))))

    // v1 removes f0 and adds f1: the increment is f1's rows only
    val f1 = dataFile(table, "part-001.parquet", Seq(3L))
    writeCommit(table, 1, Seq(add(f1),
      s"""{"remove":{"path":"$f0","deletionTimestamp":1,"dataChange":true}}"""))
    assert(TableFollow.followDeltaOnce(spark, table, ckpt)(proc) == Some(1L))
    assert(batches.last == ((1L, Seq(3L))))

    // RESTART: a fresh loop over the same checkpoint resumes after v1 —
    // v2's rows arrive exactly once, nothing replays
    val f2 = dataFile(table, "part-002.parquet", Seq(4L, 5L))
    writeCommit(table, 2, Seq(add(f2)))
    val n = TableFollow.followDelta(spark, table, ckpt,
      maxPolls = 3, idleStop = 2)(proc)
    assert(n == 1)
    assert(batches.last == ((2L, Seq(4L, 5L))))
    // continuity: accumulated increments == initial + appends, no dup
    assert(batches.flatMap(_._2) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("delta CDF follow: baseline tick, then row-level increments only") {
    val table = tmp()
    val ckpt = s"$table/cursor"
    val cdfMeta = {
      val schemaStr = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
        .json.replace("\"", "\\\"")
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":[],""" +
        s""""configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}"""
    }
    val f0 = dataFile(table, "part-000.parquet", Seq(1L, 2L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      cdfMeta, add(f0)))

    var batches = Vector.empty[(Long, Seq[(Long, String)])]
    def proc(df: org.apache.spark.sql.DataFrame, cur: Long): Unit =
      batches :+= (cur, df.select($"id", $"_change_type")
        .as[(Long, String)].collect().sorted.toSeq)

    // baseline tick: cursor lands at v0 with an EMPTY feed — history
    // before the subscription never serves
    assert(TableFollow.followDeltaCdfOnce(spark, table, ckpt)(proc) ==
      Some(0L))
    assert(batches == Vector((0L, Seq())))
    // idle tick
    assert(TableFollow.followDeltaCdfOnce(spark, table, ckpt)(proc).isEmpty)
    // v1 removes f0 and adds f1: the increment is ROW-level
    val f1 = dataFile(table, "part-001.parquet", Seq(3L))
    writeCommit(table, 1, Seq(add(f1),
      s"""{"remove":{"path":"$f0","deletionTimestamp":1,"dataChange":true,"partitionValues":{}}}"""))
    assert(TableFollow.followDeltaCdfOnce(spark, table, ckpt)(proc) ==
      Some(1L))
    assert(batches.last == ((1L, Seq((1L, "delete"), (2L, "delete"),
      (3L, "insert")))), batches.last.toString)
  }

  test("delta follow: a cursor ahead of the log fails directed") {
    val table = tmp()
    val f0 = dataFile(table, "part-000.parquet", Seq(1L))
    writeCommit(table, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{},"createdTime":0}}""",
      add(f0)))
    val e = intercept[Exception] {
      TableFollow.pollDelta(spark, table, Some(9L))
    }
    assert(e.getMessage.contains("ahead"), e.getMessage)
  }

  // -------------------------------------------------------- iceberg fixture

  private val icebergSchema =
    """{"type": "struct", "schema-id": 0, "fields": [
         {"id": 1, "name": "id", "required": true, "type": "long"},
         {"id": 2, "name": "text", "required": false, "type": "string"}]}"""

  private val mSchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
         {"name": "status", "type": "int"},
         {"name": "data_file", "type": {"type": "record", "name": "r2",
           "fields": [
             {"name": "content", "type": "int"},
             {"name": "file_path", "type": "string"},
             {"name": "file_format", "type": "string"},
             {"name": "record_count", "type": "long"}]}}]}"""

  private val mlSchema =
    """{"type": "record", "name": "manifest_file", "fields": [
         {"name": "manifest_path", "type": "string"},
         {"name": "manifest_length", "type": "long"},
         {"name": "content", "type": "int"}]}"""

  private def icebergMeta(table: String, version: Int, currentId: Long,
      snaps: Seq[(Long, String)]): Unit = {
    new java.io.File(s"$table/metadata").mkdirs()
    val snapJson = snaps.zipWithIndex.map { case ((id, ml), i) =>
      s"""{"snapshot-id": $id, "timestamp-ms": $i,
           "summary": {"operation": "append"}, "manifest-list": "$ml"}"""
    }.mkString(",")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/metadata/v$version.metadata.json"),
      s"""{"format-version": 2, "table-uuid": "u", "location": "$table",
           "current-snapshot-id": $currentId,
           "schemas": [$icebergSchema], "current-schema-id": 0,
           "snapshots": [$snapJson]}""".getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/metadata/version-hint.text"),
      version.toString.getBytes("UTF-8"))
  }

  test("iceberg follow: snapshot-id cursor, appended files only, restart") {
    val table = tmp()
    val ckpt = s"$table/cursor"
    def parquetFile(name: String, ids: Seq[Long]): String =
      s"$table/" + dataFile(table, name, ids)
    val f0 = parquetFile("p0.parquet", Seq(1L, 2L))
    val m0 = s"$table/metadata/m0.avro"
    new java.io.File(s"$table/metadata").mkdirs()
    AvroOcf.write(m0, mSchema, Seq(Seq(1, Seq(0, f0, "PARQUET", 2L))))
    val ml0 = s"$table/metadata/snap-100.avro"
    AvroOcf.write(ml0, mlSchema, Seq(Seq(m0, 100L, 0)))
    icebergMeta(table, 1, 100L, Seq((100L, ml0)))

    var batches = Vector.empty[(Long, Seq[Long])]
    def proc(df: org.apache.spark.sql.DataFrame, cur: Long): Unit =
      batches :+= (cur, df.select($"id").as[Long].collect().sorted.toSeq)

    assert(TableFollow.followIcebergOnce(spark, table, ckpt)(proc) ==
      Some(100L))
    assert(TableFollow.followIcebergOnce(spark, table, ckpt)(proc).isEmpty)
    assert(batches == Vector((100L, Seq(1L, 2L))))

    // snapshot 200: f0 existing + f1 added
    val f1 = parquetFile("p1.parquet", Seq(3L, 4L))
    val m1 = s"$table/metadata/m1.avro"
    AvroOcf.write(m1, mSchema, Seq(
      Seq(0, Seq(0, f0, "PARQUET", 2L)),
      Seq(1, Seq(0, f1, "PARQUET", 2L))))
    val ml1 = s"$table/metadata/snap-200.avro"
    AvroOcf.write(ml1, mlSchema, Seq(Seq(m1, 100L, 0)))
    icebergMeta(table, 2, 200L, Seq((100L, ml0), (200L, ml1)))

    val n = TableFollow.followIceberg(spark, table, ckpt,
      maxPolls = 3, idleStop = 2)(proc)
    assert(n == 1)
    assert(batches.last == ((200L, Seq(3L, 4L))))
    assert(batches.flatMap(_._2) == Seq(1L, 2L, 3L, 4L))
  }

  test("iceberg changelog follow: baseline, delete+insert rows, appends") {
    val table = tmp()
    val ckpt = s"$table/cursor"
    def parquetFile(name: String, ids: Seq[Long]): String =
      s"$table/" + dataFile(table, name, ids)
    val f0 = parquetFile("p0.parquet", Seq(1L, 2L, 3L))
    val m0 = s"$table/metadata/m0.avro"
    new java.io.File(s"$table/metadata").mkdirs()
    AvroOcf.write(m0, mSchema, Seq(Seq(1, Seq(0, f0, "PARQUET", 3L))))
    val ml0 = s"$table/metadata/snap-100.avro"
    AvroOcf.write(ml0, mlSchema, Seq(Seq(m0, 100L, 0)))
    icebergMeta(table, 1, 100L, Seq((100L, ml0)))

    var batches = Vector.empty[(Long, Seq[(Long, String)])]
    def proc(df: org.apache.spark.sql.DataFrame, cur: Long): Unit =
      batches :+= (cur, df.select($"id", $"_change_type")
        .as[(Long, String)].collect().sorted.toSeq)

    // baseline tick: empty typed changelog, cursor at snapshot 100 —
    // history before the subscription never serves
    assert(TableFollow.followIcebergChangelogOnce(spark, table, ckpt)(proc)
      == Some(100L))
    assert(batches == Vector((100L, Seq())))
    assert(TableFollow.followIcebergChangelogOnce(spark, table, ckpt)(proc)
      .isEmpty)

    // snapshot 200: f1 (ids 4,5) added AND a positional delete kills f0's
    // position 1 (id 2) — the increment is ROW-level: insert 4,5 + delete 2
    val f1 = parquetFile("p1.parquet", Seq(4L, 5L))
    val delDf = Seq((f0, 1L)).toDF("file_path", "pos")
    delDf.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-del")
    val delPart = new java.io.File(s"$table/tmp-del").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val delPath = s"$table/del0.parquet"
    java.nio.file.Files.move(delPart.toPath,
      java.nio.file.Paths.get(delPath))
    val m1 = s"$table/metadata/m1.avro"
    AvroOcf.write(m1, mSchema, Seq(
      Seq(0, Seq(0, f0, "PARQUET", 3L)),
      Seq(1, Seq(0, f1, "PARQUET", 2L))))
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, mSchema, Seq(Seq(1, Seq(1, delPath, "PARQUET", 1L))))
    val ml1 = s"$table/metadata/snap-200.avro"
    AvroOcf.write(ml1, mlSchema, Seq(Seq(m1, 100L, 0), Seq(md, 100L, 1)))
    icebergMeta(table, 2, 200L, Seq((100L, ml0), (200L, ml1)))
    assert(TableFollow.followIcebergChangelogOnce(spark, table, ckpt)(proc)
      == Some(200L))
    assert(batches.last == ((200L,
      Seq((2L, "delete"), (4L, "insert"), (5L, "insert")))),
      batches.last.toString)

    // snapshot 300: appends only — the increment is inserts, and the
    // common-file diff takes the zero-IO fast path (delete sets unchanged)
    val f2 = parquetFile("p2.parquet", Seq(9L))
    val m2 = s"$table/metadata/m2.avro"
    AvroOcf.write(m2, mSchema, Seq(
      Seq(0, Seq(0, f0, "PARQUET", 3L)),
      Seq(0, Seq(0, f1, "PARQUET", 2L)),
      Seq(1, Seq(0, f2, "PARQUET", 1L))))
    val ml2 = s"$table/metadata/snap-300.avro"
    AvroOcf.write(ml2, mlSchema, Seq(Seq(m2, 100L, 0), Seq(md, 100L, 1)))
    icebergMeta(table, 3, 300L,
      Seq((100L, ml0), (200L, ml1), (300L, ml2)))
    assert(TableFollow.followIcebergChangelogOnce(spark, table, ckpt)(proc)
      == Some(300L))
    assert(batches.last == ((300L, Seq((9L, "insert")))),
      batches.last.toString)
    // a row deleted and a row inserted in the SAME range never cross:
    // accumulated feed rebuilds the table exactly
    val inserted = batches.flatMap(_._2).collect { case (id, "insert") => id }
    val deleted = batches.flatMap(_._2).collect { case (id, "delete") => id }
    assert((Seq(1L, 2L, 3L) ++ inserted).diff(deleted).sorted ==
      Seq(1L, 3L, 4L, 5L, 9L))
  }
}
