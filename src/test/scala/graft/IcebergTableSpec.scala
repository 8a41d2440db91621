package graft

import org.apache.spark.sql.functions._

import graft.sources.{AvroOcf, IcebergTable}

/** Iceberg snapshot reads over hand-authored spec fixtures: metadata
  * json (v1 and v2 shapes), Avro manifest lists + manifests, status
  * reconciliation, time travel, and the merge-on-read guards. */
class IcebergTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("iceberg").toString

  private val manifestSchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
      |  {"name": "status", "type": "int"},
      |  {"name": "data_file", "type": {"type": "record", "name": "r2",
      |    "fields": [
      |      {"name": "content", "type": "int"},
      |      {"name": "file_path", "type": "string"},
      |      {"name": "file_format", "type": "string"},
      |      {"name": "record_count", "type": "long"}
      |    ]}}
      |]}""".stripMargin

  private val manifestListSchema =
    """{"type": "record", "name": "manifest_file", "fields": [
      |  {"name": "manifest_path", "type": "string"},
      |  {"name": "manifest_length", "type": "long"},
      |  {"name": "content", "type": "int"}
      |]}""".stripMargin

  private def dataFile(table: String, name: String, ids: Seq[Long]): String = {
    val df = ids.toDF("id").select($"id", concat(lit("t"), $"id").as("text"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-$name")
    val part = new java.io.File(s"$table/tmp-$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/data").mkdirs()
    val target = s"$table/data/$name"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$table/tmp-$name"))
    target
  }

  private def manifest(table: String, name: String,
      entries: Seq[(Int, Int, String)]): String = {
    val p = s"$table/metadata/$name"
    new java.io.File(s"$table/metadata").mkdirs()
    AvroOcf.write(p, manifestSchema, entries.map { case (status, content, path) =>
      Seq(status, Seq(content, path, "PARQUET", 1L))
    })
    p
  }

  private def manifestList(table: String, name: String,
      manifests: Seq[(String, Int)]): String = {
    val p = s"$table/metadata/$name"
    AvroOcf.write(p, manifestListSchema,
      manifests.map { case (mp, content) => Seq(mp, 100L, content) })
    p
  }

  private val schemaJson =
    """{"type": "struct", "schema-id": 0, "fields": [
      |  {"id": 1, "name": "id", "required": true, "type": "long"},
      |  {"id": 2, "name": "text", "required": false, "type": "string"}
      |]}""".stripMargin

  private def writeMetadata(table: String, version: Int, body: String): Unit = {
    new java.io.File(s"$table/metadata").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/metadata/v$version.metadata.json"),
      body.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$table/metadata/version-hint.text"),
      version.toString.getBytes("UTF-8"))
  }

  test("v2 snapshot read: manifest list, status reconciliation, time travel") {
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "p1.parquet", Seq(3L))
    val f2 = dataFile(table, "p2.parquet", Seq(4L, 5L))
    // snapshot 100: adds f0 + f1
    val m0 = manifest(table, "m0.avro", Seq((1, 0, f0), (1, 0, f1)))
    val ml0 = manifestList(table, "snap-100.avro", Seq((m0, 0)))
    // snapshot 200: f0 existing, f1 DELETED, f2 added
    val m1 = manifest(table, "m1.avro",
      Seq((0, 0, f0), (2, 0, f1), (1, 0, f2)))
    val ml1 = manifestList(table, "snap-200.avro", Seq((m1, 0)))
    writeMetadata(table, 3, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 200,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [
        {"snapshot-id": 100, "timestamp-ms": 1750000000000,
         "summary": {"operation": "append"}, "manifest-list": "$ml0"},
        {"snapshot-id": 200, "timestamp-ms": 1750000060000,
         "summary": {"operation": "overwrite"}, "manifest-list": "$ml1"}
      ]}""")

    val cur = IcebergTable.read(spark, table).orderBy($"id")
    assert(cur.columns.toSeq == Seq("id", "text"))
    assert(cur.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 5L))

    val old = IcebergTable.read(spark, table, snapshotId = Some(100L))
    assert(old.orderBy($"id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))

    val snaps = IcebergTable.snapshots(spark, table).orderBy($"snapshot_id")
      .collect()
    assert(snaps.map(_.getLong(0)).toSeq == Seq(100L, 200L))
    assert(snaps.map(_.getString(2)).toSeq == Seq("append", "overwrite"))
  }

  test("readAppended diffs two snapshots' active sets, metadata-only") {
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L))
    val f1 = dataFile(table, "p1.parquet", Seq(3L))
    val f2 = dataFile(table, "p2.parquet", Seq(4L, 5L))
    val m0 = manifest(table, "m0.avro", Seq((1, 0, f0), (1, 0, f1)))
    val ml0 = manifestList(table, "snap-100.avro", Seq((m0, 0)))
    val m1 = manifest(table, "m1.avro",
      Seq((0, 0, f0), (2, 0, f1), (1, 0, f2)))
    val ml1 = manifestList(table, "snap-200.avro", Seq((m1, 0)))
    writeMetadata(table, 3, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 200,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [
        {"snapshot-id": 100, "timestamp-ms": 0,
         "summary": {"operation": "append"}, "manifest-list": "$ml0"},
        {"snapshot-id": 200, "timestamp-ms": 1,
         "summary": {"operation": "overwrite"}, "manifest-list": "$ml1"}
      ]}""")
    // 100 -> current: only f2 is new (f0 persists, f1 was deleted)
    val appended = IcebergTable.readAppended(spark, table, fromSnapshotId = 100L)
    assert(appended.orderBy($"id").collect().map(_.getLong(0)).toSeq ==
      Seq(4L, 5L))
    // same snapshot twice: empty but typed
    val none = IcebergTable.readAppended(spark, table, 200L, Some(200L))
    assert(none.count() == 0 && none.columns.toSeq == Seq("id", "text"))
    // a REVERSED range (by snapshot timestamp) is a directed error
    val e = intercept[Exception] {
      IcebergTable.readAppended(spark, table, 200L, Some(100L))
    }
    assert(e.getMessage.contains("reversed"), e.getMessage)
  }

  test("v1 shape: inline schema and inline manifests array") {
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(7L, 8L))
    // v1 manifests lack the content column entirely — exercise the default
    val m0path = s"$table/metadata/m0.avro"
    new java.io.File(s"$table/metadata").mkdirs()
    AvroOcf.write(m0path,
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"}
        |    ]}}
        |]}""".stripMargin,
      Seq(Seq(1, Seq(f0, "PARQUET", 2L))))
    writeMetadata(table, 1, s"""{
      "format-version": 1, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 10,
      "schema": $schemaJson,
      "snapshots": [
        {"snapshot-id": 10, "timestamp-ms": 1750000000000,
         "summary": {"operation": "append"}, "manifests": ["$m0path"]}
      ]}""")
    val df = IcebergTable.read(spark, table).orderBy($"id")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "t7"), (8L, "t8")))
  }

  test("manifest-level identity-partition pruning skips whole files") {
    val table = tmp()
    val fEn = dataFile(table, "pen.parquet", Seq(1L, 2L))
    val fDe = dataFile(table, "pde.parquet", Seq(3L))
    new java.io.File(s"$table/metadata").mkdirs()
    // manifest entries carry a partition struct (identity transform)
    val mp = s"$table/metadata/m0.avro"
    AvroOcf.write(mp,
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "content", "type": "int"},
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"},
        |      {"name": "partition", "type": {"type": "record",
        |        "name": "p", "fields": [
        |          {"name": "lang", "type": "string"}]}}
        |    ]}}
        |]}""".stripMargin,
      Seq(Seq(1, Seq(0, fEn, "PARQUET", 2L, Seq("en"))),
        Seq(1, Seq(0, fDe, "PARQUET", 1L, Seq("de")))))
    val ml = manifestList(table, "snap-1.avro", Seq((mp, 0)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "append"}, "manifest-list": "$ml"}]}""")
    val all = IcebergTable.read(spark, table)
    assert(all.count() == 3)
    val pruned = IcebergTable.readPartitions(spark, table, Map("lang" -> "de"))
    // the en file is never even listed: one input file, one row
    assert(pruned.inputFiles.length == 1 &&
      pruned.inputFiles.head.contains("pde"))
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // a filter nothing matches yields the empty typed table
    assert(IcebergTable.readPartitions(spark, table,
      Map("lang" -> "xx")).count() == 0)
  }

  /** A positional-delete parquet: spec schema (file_path string, pos long),
    * one file under data/, returning its path. */
  private def posDeleteFile(table: String, name: String,
      rows: Seq[(String, Long)]): String = {
    val df = rows.toDF("file_path", "pos")
    df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-$name")
    val part = new java.io.File(s"$table/tmp-$name").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    new java.io.File(s"$table/data").mkdirs()
    val target = s"$table/data/$name"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$table/tmp-$name"))
    target
  }

  test("v2 positional deletes: merge-on-read anti-join, time travel back") {
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L))
    val f1 = dataFile(table, "p1.parquet", Seq(4L, 5L))
    val m0 = manifest(table, "m0.avro", Seq((1, 0, f0), (1, 0, f1)))
    val ml0 = manifestList(table, "snap-100.avro", Seq((m0, 0)))
    // snapshot 200 deletes p0 row 1 (id=2) and p1 row 0 (id=4); the
    // file_path spellings intentionally MIX bare and file: forms — the
    // join must normalize both sides
    val dl = posDeleteFile(table, "del0.parquet",
      Seq((f0, 1L), (s"file:$f1", 0L)))
    val md = manifest(table, "md.avro", Seq((1, 1, dl)))
    val ml1 = manifestList(table, "snap-200.avro", Seq((m0, 0), (md, 1)))
    writeMetadata(table, 3, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 200,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [
        {"snapshot-id": 100, "timestamp-ms": 0,
         "summary": {"operation": "append"}, "manifest-list": "$ml0"},
        {"snapshot-id": 200, "timestamp-ms": 1,
         "summary": {"operation": "delete"}, "manifest-list": "$ml1"}
      ]}""")
    val cur = IcebergTable.read(spark, table).orderBy($"id")
    assert(cur.columns.toSeq == Seq("id", "text"))
    assert(cur.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "t1"), (3L, "t3"), (5L, "t5")))
    // pre-delete snapshot still serves every row
    val old = IcebergTable.read(spark, table, snapshotId = Some(100L))
    assert(old.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // partition-free readAppended across the delete-only snapshot: no new
    // data files, empty but typed
    val appended = IcebergTable.readAppended(spark, table, 100L)
    assert(appended.count() == 0 && appended.columns.toSeq == Seq("id", "text"))
  }

  test("positional deletes compose with identity-partition pruning") {
    val table = tmp()
    val fEn = dataFile(table, "pen.parquet", Seq(1L, 2L))
    val fDe = dataFile(table, "pde.parquet", Seq(3L, 6L))
    new java.io.File(s"$table/metadata").mkdirs()
    val mp = s"$table/metadata/m0.avro"
    AvroOcf.write(mp,
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "content", "type": "int"},
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"},
        |      {"name": "partition", "type": {"type": "record",
        |        "name": "p", "fields": [
        |          {"name": "lang", "type": ["null", "string"]}]}}
        |    ]}}
        |]}""".stripMargin,
      Seq(Seq(1, Seq(0, fEn, "PARQUET", 2L, Seq("en"))),
        Seq(1, Seq(0, fDe, "PARQUET", 2L, Seq("de")))))
    // the delete file kills id=6 in the de partition; its own manifest
    // entry carries a NULL partition value (spec-legal for delete files)
    val dl = posDeleteFile(table, "del0.parquet", Seq((fDe, 1L)))
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md,
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "content", "type": "int"},
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"},
        |      {"name": "partition", "type": {"type": "record",
        |        "name": "p", "fields": [
        |          {"name": "lang", "type": ["null", "string"]}]}}
        |    ]}}
        |]}""".stripMargin,
      Seq(Seq(1, Seq(1, dl, "PARQUET", 1L, Seq(null)))))
    val ml = manifestList(table, "snap-1.avro", Seq((mp, 0), (md, 1)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "append"}, "manifest-list": "$ml"}]}""")
    // pruned to de: one data file served, the delete still applied
    val pruned = IcebergTable.readPartitions(spark, table, Map("lang" -> "de"))
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // unfiltered: everything minus the deleted row
    assert(IcebergTable.read(spark, table).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("positional deletes match files with URI-escapable names") {
    // manifests store RAW paths while Spark's _metadata.file_path is a
    // percent-encoded URI — a space in the file name must still delete
    val table = tmp()
    val f0 = dataFile(table, "p 0.parquet", Seq(1L, 2L, 3L))
    val dl = posDeleteFile(table, "del0.parquet", Seq((f0, 0L)))
    val m0 = manifest(table, "m0.avro", Seq((1, 0, f0)))
    val md = manifest(table, "md.avro", Seq((1, 1, dl)))
    val ml = manifestList(table, "snap-1.avro", Seq((m0, 0), (md, 1)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "delete"}, "manifest-list": "$ml"}]}""")
    assert(IcebergTable.read(spark, table).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 3L))
  }

  /** Manifest schema carrying sequence_number + equality_ids (the v2
    * shape); null sequence inherits the manifest's own. */
  private val seqManifestSchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
      |  {"name": "status", "type": "int"},
      |  {"name": "sequence_number", "type": ["null", "long"], "default": null},
      |  {"name": "data_file", "type": {"type": "record", "name": "r2",
      |    "fields": [
      |      {"name": "content", "type": "int"},
      |      {"name": "file_path", "type": "string"},
      |      {"name": "file_format", "type": "string"},
      |      {"name": "record_count", "type": "long"},
      |      {"name": "equality_ids", "type": ["null",
      |        {"type": "array", "items": "int"}], "default": null}
      |    ]}}
      |]}""".stripMargin

  private val seqListSchema =
    """{"type": "record", "name": "manifest_file", "fields": [
      |  {"name": "manifest_path", "type": "string"},
      |  {"name": "manifest_length", "type": "long"},
      |  {"name": "content", "type": "int"},
      |  {"name": "sequence_number", "type": "long"}
      |]}""".stripMargin

  test("equality deletes: sequence-scoped, null-safe, per-id-set joins") {
    val table = tmp()
    // f0 at sequence 1 (ids 1..3), f1 at sequence 3 (ids 2 and 4 RE-added)
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L))
    val f1 = dataFile(table, "p1.parquet", Seq(2L, 4L))
    new java.io.File(s"$table/metadata").mkdirs()
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, seqManifestSchema, Seq(
      Seq(1, null, Seq(0, f0, "PARQUET", 3L, null))))
    val m1 = s"$table/metadata/m1.avro"
    AvroOcf.write(m1, seqManifestSchema, Seq(
      Seq(1, null, Seq(0, f1, "PARQUET", 2L, null))))
    // the equality delete at sequence 2 on field id 1 ("id"): values 2, 4
    val dl = {
      val df = Seq(2L, 4L).toDF("id")
      df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-eq")
      val part = new java.io.File(s"$table/tmp-eq").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = s"$table/data/eq0.parquet"
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target))
      target
    }
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, seqManifestSchema, Seq(
      Seq(1, null, Seq(2, dl, "PARQUET", 2L, Seq(1)))))
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L), Seq(m1, 100L, 0, 3L)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$ml"}]}""")
    // id=2 dies in f0 (seq 1 < 2) but SURVIVES in f1 (seq 3 >= 2 — the
    // re-insert); id=4 only ever existed at seq 3 and survives
    val got = IcebergTable.read(spark, table).orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      got.map(_.getLong(0)).toSeq.toString)
    // a non-top-level equality id is a directed error
    val mdBad = s"$table/metadata/mdbad.avro"
    AvroOcf.write(mdBad, seqManifestSchema, Seq(
      Seq(1, null, Seq(2, dl, "PARQUET", 2L, Seq(99)))))
    val mlBad = s"$table/metadata/snap-2.avro"
    AvroOcf.write(mlBad, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(mdBad, 100L, 1, 2L)))
    writeMetadata(table, 2, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 2,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 2, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$mlBad"}]}""")
    val e = intercept[Exception] { IcebergTable.read(spark, table) }
    assert(e.getMessage.contains("not a top-level column"), e.getMessage)
  }

  test("equality deletes honor the delete file's PARTITION scope") {
    // spec rule: a partition-scoped equality delete applies only to data
    // files in the SAME partition; ids here deliberately collide across
    // partitions so a scope slip silently kills the wrong row
    val table = tmp()
    val fEn = dataFile(table, "pen.parquet", Seq(1L, 2L))
    val fDe = dataFile(table, "pde.parquet", Seq(1L, 3L))
    val partSchema =
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "sequence_number", "type": ["null", "long"], "default": null},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "content", "type": "int"},
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"},
        |      {"name": "equality_ids", "type": ["null",
        |        {"type": "array", "items": "int"}], "default": null},
        |      {"name": "partition", "type": {"type": "record",
        |        "name": "p", "fields": [
        |          {"name": "lang", "type": ["null", "string"]}]}}
        |    ]}}
        |]}""".stripMargin
    new java.io.File(s"$table/metadata").mkdirs()
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, partSchema, Seq(
      Seq(1, null, Seq(0, fEn, "PARQUET", 2L, null, Seq("en"))),
      Seq(1, null, Seq(0, fDe, "PARQUET", 2L, null, Seq("de")))))
    // the delete: id=1, SCOPED to lang=en, at sequence 2
    val dl = {
      val df = Seq(1L).toDF("id")
      df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-eq")
      val part = new java.io.File(s"$table/tmp-eq").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = s"$table/data/eq0.parquet"
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target))
      target
    }
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, partSchema, Seq(
      Seq(1, null, Seq(2, dl, "PARQUET", 1L, Seq(1), Seq("en")))))
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$ml"}]}""")
    // en loses id=1; de keeps BOTH its rows (incl. its own id=1)
    val got = IcebergTable.read(spark, table).collect().map(_.getLong(0))
      .sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), got.toString)
  }

  test("equality and positional deletes compose in one snapshot") {
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L, 4L))
    new java.io.File(s"$table/metadata").mkdirs()
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, seqManifestSchema, Seq(
      Seq(1, null, Seq(0, f0, "PARQUET", 4L, null))))
    // positional delete kills row 0 (id 1); equality delete kills id 3
    val pd = posDeleteFile(table, "pd.parquet", Seq((f0, 0L)))
    val eq = {
      val df = Seq(3L).toDF("id")
      df.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-eq")
      val part = new java.io.File(s"$table/tmp-eq").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = s"$table/data/eq0.parquet"
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target))
      target
    }
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, seqManifestSchema, Seq(
      Seq(1, null, Seq(1, pd, "PARQUET", 1L, null)),
      Seq(1, null, Seq(2, eq, "PARQUET", 1L, Seq(1)))))
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$ml"}]}""")
    assert(IcebergTable.read(spark, table).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 4L))
  }

  test("v2 EXISTING entries must carry explicit sequence numbers") {
    // inheriting the newer manifest's sequence for an EXISTING entry
    // would inflate the data sequence and silently suppress equality
    // deletes — the spec requires explicit sequences there
    val table = tmp()
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L))
    new java.io.File(s"$table/metadata").mkdirs()
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, seqManifestSchema, Seq(
      Seq(0, null, Seq(0, f0, "PARQUET", 2L, null)))) // EXISTING, null seq
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(Seq(m0, 100L, 0, 5L)))
    writeMetadata(table, 1, s"""{
      "format-version": 2, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "append"}, "manifest-list": "$ml"}]}""")
    val e = intercept[Exception] { IcebergTable.read(spark, table) }
    assert(e.getMessage.contains("EXISTING"), e.getMessage)
    // the same entry marked ADDED inherits and reads fine
    AvroOcf.write(m0, seqManifestSchema, Seq(
      Seq(1, null, Seq(0, f0, "PARQUET", 2L, null))))
    assert(IcebergTable.read(spark, table).count() == 2)
  }

  test("guards are directed: version 4, not-a-table") {
    // v3 is implemented — an empty v3 table reads as empty, typed
    val t3 = tmp()
    writeMetadata(t3, 1, s"""{"format-version": 3, "location": "$t3",
      "schemas": [$schemaJson], "current-schema-id": 0, "snapshots": []}""")
    assert(IcebergTable.read(spark, t3).count() == 0)

    val t4 = tmp()
    writeMetadata(t4, 1, s"""{"format-version": 4, "location": "$t4",
      "schemas": [$schemaJson], "current-schema-id": 0, "snapshots": []}""")
    val e3 = intercept[Exception] { IcebergTable.read(spark, t4) }
    assert(e3.getMessage.contains("format-version 4"), e3.getMessage)

    val e4 = intercept[Exception] { IcebergTable.read(spark, tmp()) }
    assert(e4.getMessage.contains("metadata"), e4.getMessage)
  }

  // --------------------------------------------------- v3: Puffin + DVs

  private val v3ManifestSchema =
    """{"type": "record", "name": "manifest_entry", "fields": [
      |  {"name": "status", "type": "int"},
      |  {"name": "sequence_number", "type": ["null", "long"], "default": null},
      |  {"name": "data_file", "type": {"type": "record", "name": "r2",
      |    "fields": [
      |      {"name": "content", "type": "int"},
      |      {"name": "file_path", "type": "string"},
      |      {"name": "file_format", "type": "string"},
      |      {"name": "record_count", "type": "long"},
      |      {"name": "referenced_data_file", "type": ["null", "string"],
      |       "default": null},
      |      {"name": "content_offset", "type": ["null", "long"],
      |       "default": null},
      |      {"name": "content_size_in_bytes", "type": ["null", "long"],
      |       "default": null}
      |    ]}}
      |]}""".stripMargin

  test("puffin container: footer index and blob bytes round trip") {
    import graft.sources.{DeletionVector, Puffin}
    val dir = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    val b0 = Puffin.dvBlob(Array(1L, 3L))
    val b1 = Puffin.dvBlob(Array(0L, 70000L))
    val placed = Puffin.writeFile(s"$dir/dv.puffin", Seq(
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 10L, 1L,
        Map("referenced-data-file" -> "/data/p0.parquet",
          "cardinality" -> "2"), b0),
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 10L, 1L,
        Map("referenced-data-file" -> "/data/p1.parquet",
          "cardinality" -> "2"), b1)),
      Map("created-by" -> "graft-test"), conf)
    assert(placed.size == 2 && placed.head._1 == 4L)
    val (blobs, props) = Puffin.footer(s"$dir/dv.puffin", conf)
    assert(props("created-by") == "graft-test")
    assert(blobs.map(_.tpe).distinct == Seq("deletion-vector-v1"))
    assert(blobs.map(b => (b.offset, b.length)) == placed.map(p => (p._1, p._2)))
    assert(blobs(1).properties("referenced-data-file") == "/data/p1.parquet")
    // blob bytes survive; the framed layout decodes through the shared
    // DeletionVector reader used by the v3 read path
    val raw = Puffin.readBlob(s"$dir/dv.puffin", blobs(1), conf)
    assert(raw.toSeq == b1.toSeq)
    assert(DeletionVector.puffinDvPositions(s"$dir/dv.puffin",
      blobs(1).offset, blobs(1).length, conf).toSeq == Seq(0L, 70000L))
    // not-a-puffin guard
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/junk.puffin"),
      Array.fill(64)(0x41.toByte))
    val e = intercept[Exception] { Puffin.footer(s"$dir/junk.puffin", conf) }
    assert(e.getMessage.contains("magic"), e.getMessage)
    // a zstd-compressed blob (the stats-sketch default) decodes through
    // the in-repo zstd; an unknown codec is directed
    val payload = (0 until 500).map(i => (i % 251).toByte).toArray
    Puffin.writeFile(s"$dir/z.puffin", Seq(
      Puffin.Blob("apache-datasketches-theta-v1", Seq(1), 1L, 1L,
        Map.empty, graft.sources.zarr.Zstd.compressStore(payload),
        compression = Some("zstd")),
      Puffin.Blob("some-blob", Seq(1), 1L, 1L, Map.empty,
        Array[Byte](1, 2, 3), compression = Some("lz4"))),
      Map.empty, conf)
    val (zblobs, _) = Puffin.footer(s"$dir/z.puffin", conf)
    assert(zblobs.head.compression.contains("zstd"))
    assert(Puffin.readBlob(s"$dir/z.puffin", zblobs.head, conf).toSeq ==
      payload.toSeq)
    val e2 = intercept[Exception] {
      Puffin.readBlob(s"$dir/z.puffin", zblobs(1), conf)
    }
    assert(e2.getMessage.contains("lz4"), e2.getMessage)
  }

  test("v3: deletion vectors and equality deletes compose in one snapshot") {
    import graft.sources.Puffin
    val table = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L, 4L, 5L, 6L))
    new java.io.File(s"$table/metadata").mkdirs()
    val mixedSchema =
      """{"type": "record", "name": "manifest_entry", "fields": [
        |  {"name": "status", "type": "int"},
        |  {"name": "sequence_number", "type": ["null", "long"],
        |   "default": null},
        |  {"name": "data_file", "type": {"type": "record", "name": "r2",
        |    "fields": [
        |      {"name": "content", "type": "int"},
        |      {"name": "file_path", "type": "string"},
        |      {"name": "file_format", "type": "string"},
        |      {"name": "record_count", "type": "long"},
        |      {"name": "equality_ids", "type": ["null",
        |        {"type": "array", "items": "int"}], "default": null},
        |      {"name": "referenced_data_file", "type": ["null", "string"],
        |       "default": null},
        |      {"name": "content_offset", "type": ["null", "long"],
        |       "default": null},
        |      {"name": "content_size_in_bytes", "type": ["null", "long"],
        |       "default": null}
        |    ]}}
        |]}""".stripMargin
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, mixedSchema, Seq(
      Seq(1, 1L, Seq(0, f0, "PARQUET", 6L, null, null, null, null))))
    // the DV kills positions 0 and 1 (ids 1, 2)
    val puffin = s"$table/metadata/dv.puffin"
    val placed = Puffin.writeFile(puffin, Seq(
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 1L, 2L,
        Map("referenced-data-file" -> f0, "cardinality" -> "2"),
        Puffin.dvBlob(Array(0L, 1L)))), Map.empty, conf)
    // the equality delete (field id 1 = "id") kills id 5 at sequence 2
    val eqDf = Seq(5L).toDF("id")
    eqDf.coalesce(1).write.mode("overwrite").parquet(s"$table/tmp-eq")
    val eqPart = new java.io.File(s"$table/tmp-eq").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val eqPath = s"$table/data/eq0.parquet"
    java.nio.file.Files.move(eqPart.toPath,
      java.nio.file.Paths.get(eqPath))
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, mixedSchema, Seq(
      Seq(1, 2L, Seq(1, puffin, "PUFFIN", 2L, null, f0,
        placed(0)._1, placed(0)._2)),
      Seq(1, 2L, Seq(2, eqPath, "PARQUET", 1L, Seq(1), null, null, null))))
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L)))
    writeMetadata(table, 1, s"""{
      "format-version": 3, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "delete"}, "manifest-list": "$ml"}]}""")
    // DV kills 1,2; equality delete kills 5 (data seq 1 < delete seq 2)
    val got = IcebergTable.read(spark, table).orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 4L, 6L),
      got.map(_.getLong(0)).toSeq.toString)
  }

  test("changelog: v3 DV churn serves the newly-dead rows, not the file") {
    import graft.sources.Puffin
    // snapshot 1: f0 live, no deletes; snapshot 2: a Puffin DV kills two
    // of f0's rows. The file-granular diff sees NO new files — the
    // changelog must produce exactly the two delete rows.
    val table = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L, 4L))
    new java.io.File(s"$table/metadata").mkdirs()
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, v3ManifestSchema, Seq(
      Seq(1, null, Seq(0, f0, "PARQUET", 4L, null, null, null))))
    val ml0 = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml0, seqListSchema, Seq(Seq(m0, 100L, 0, 1L)))
    val puffin = s"$table/metadata/dv-2.puffin"
    val placed = Puffin.writeFile(puffin, Seq(
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 2L, 2L,
        Map("referenced-data-file" -> f0, "cardinality" -> "2"),
        Puffin.dvBlob(Array(1L, 3L)))), Map.empty, conf)
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, v3ManifestSchema, Seq(
      Seq(1, null, Seq(1, puffin, "PUFFIN", 2L, f0,
        placed(0)._1, placed(0)._2))))
    val ml1 = s"$table/metadata/snap-2.avro"
    AvroOcf.write(ml1, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L)))
    writeMetadata(table, 2, s"""{
      "format-version": 3, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 2,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [
        {"snapshot-id": 1, "timestamp-ms": 1000,
         "summary": {"operation": "append"}, "manifest-list": "$ml0"},
        {"snapshot-id": 2, "timestamp-ms": 2000,
         "summary": {"operation": "delete"}, "manifest-list": "$ml1"}]}""")
    val got = IcebergTable.readChangelog(spark, table, 1L, Some(2L))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, "delete", 2L), (4L, "delete", 2L)),
      got.toSeq.toString)
    // and the end-state snapshot serves the survivors
    assert(IcebergTable.read(spark, table).orderBy($"id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("v3 deletion vectors: Puffin blobs anti-join their referenced files") {
    import graft.sources.Puffin
    val table = tmp()
    val conf = spark.sparkContext.hadoopConfiguration
    val f0 = dataFile(table, "p0.parquet", Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val f1 = dataFile(table, "p1.parquet", Seq(10L, 11L, 12L))
    val f2 = dataFile(table, "p2.parquet", Seq(20L, 21L)) // no DV
    // one puffin file, two DV blobs: f0 loses positions 1,3 (ids 2,4);
    // f1 loses position 0 (id 10)
    new java.io.File(s"$table/metadata").mkdirs()
    val puffin = s"$table/metadata/dv-1.puffin"
    val placed = Puffin.writeFile(puffin, Seq(
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 1L, 1L,
        Map("referenced-data-file" -> f0, "cardinality" -> "2"),
        Puffin.dvBlob(Array(1L, 3L))),
      Puffin.Blob("deletion-vector-v1", Seq(2147483546), 1L, 1L,
        Map("referenced-data-file" -> f1, "cardinality" -> "1"),
        Puffin.dvBlob(Array(0L)))),
      Map.empty, conf)
    val m0 = s"$table/metadata/m0.avro"
    AvroOcf.write(m0, v3ManifestSchema, Seq(
      Seq(1, null, Seq(0, f0, "PARQUET", 6L, null, null, null)),
      Seq(1, null, Seq(0, f1, "PARQUET", 3L, null, null, null)),
      Seq(1, null, Seq(0, f2, "PARQUET", 2L, null, null, null))))
    val md = s"$table/metadata/md.avro"
    AvroOcf.write(md, v3ManifestSchema, Seq(
      Seq(1, null, Seq(1, puffin, "PUFFIN", 2L, f0,
        placed(0)._1, placed(0)._2)),
      Seq(1, null, Seq(1, puffin, "PUFFIN", 1L, f1,
        placed(1)._1, placed(1)._2))))
    val ml = s"$table/metadata/snap-1.avro"
    AvroOcf.write(ml, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(md, 100L, 1, 2L)))
    writeMetadata(table, 1, s"""{
      "format-version": 3, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 1, "next-row-id": 11,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 1, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$ml"}]}""")
    val got = IcebergTable.read(spark, table).orderBy($"id").collect()
    assert(got.map(_.getLong(0)).toSeq ==
      Seq(1L, 3L, 5L, 6L, 11L, 12L, 20L, 21L),
      got.map(_.getLong(0)).toSeq.toString)
    // a DV entry with no locator fields is a directed error
    val mdBad = s"$table/metadata/mdbad.avro"
    AvroOcf.write(mdBad, v3ManifestSchema, Seq(
      Seq(1, null, Seq(1, puffin, "PUFFIN", 2L, null, null, null))))
    val mlBad = s"$table/metadata/snap-2.avro"
    AvroOcf.write(mlBad, seqListSchema, Seq(
      Seq(m0, 100L, 0, 1L), Seq(mdBad, 100L, 1, 2L)))
    writeMetadata(table, 2, s"""{
      "format-version": 3, "table-uuid": "u", "location": "$table",
      "current-snapshot-id": 2,
      "schemas": [$schemaJson], "current-schema-id": 0,
      "snapshots": [{"snapshot-id": 2, "timestamp-ms": 0,
        "summary": {"operation": "overwrite"}, "manifest-list": "$mlBad"}]}""")
    val e = intercept[Exception] { IcebergTable.read(spark, table) }
    assert(e.getMessage.contains("referenced_data_file"), e.getMessage)
  }
}
