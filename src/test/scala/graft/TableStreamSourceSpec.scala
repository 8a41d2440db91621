package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{AvroOcf, DeltaWriter, IcebergWriter}

/** Delta/Iceberg tables as native Structured Streaming sources: offsets
  * are table cursors checkpointed by Spark itself — initial snapshot,
  * per-commit micro-batches, restart continuity through the engine's own
  * offset log (the SerializedOffset recovery path), and the row-level
  * cdf/changelog modes. Tables are written by the engine's own writers. */
class TableStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tstream").toString

  /** Collected (sorted id, tag) batches, synchronized — foreachBatch runs
    * on the stream thread. */
  private final class Batches[T] {
    private var v = Vector.empty[Seq[T]]
    def add(b: Seq[T]): Unit = synchronized { if (b.nonEmpty) v :+= b }
    def all: Vector[Seq[T]] = synchronized(v)
  }

  test("delta stream: snapshot, per-commit batches, checkpoint restart") {
    val table = tmp() + "/t"
    val ckpt = tmp() + "/ckpt"
    DeltaWriter.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"), table)

    val got = new Batches[Long]
    def start() = spark.readStream
      .format("graft.streaming.DeltaStreamSource")
      .option("path", table).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((df: DataFrame, _: Long) =>
        got.add(df.select($"id").as[Long].collect().sorted.toSeq))
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(got.all == Vector(Seq(1L, 2L)), got.all.toString)
      // a new commit arrives while the query runs: one batch, new rows only
      DeltaWriter.writeAppend(spark, Seq((3L, "c")).toDF("id", "text"), table)
      q.processAllAvailable()
      assert(got.all == Vector(Seq(1L, 2L), Seq(3L)), got.all.toString)
    } finally q.stop()

    // RESTART from the engine's checkpoint: a commit written while the
    // query was DOWN arrives as exactly one batch — nothing replays
    // (this exercises SerializedOffset recovery in getBatch)
    DeltaWriter.writeAppend(spark,
      Seq((4L, "d"), (5L, "e")).toDF("id", "text"), table)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.all == Vector(Seq(1L, 2L), Seq(3L), Seq(4L, 5L)),
        got.all.toString)
    } finally q2.stop()
    // continuity: accumulated stream == the table
    assert(got.all.flatten.sorted == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("delta stream cdf mode: empty baseline, then row-level changes") {
    val table = tmp() + "/t"
    val schemaStr = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
      .json.replace("\"", "\\\"")
    def commit(v: Long, lines: Seq[String]): Unit = {
      new java.io.File(s"$table/_delta_log").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$table/_delta_log/$v%020d.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def dataFile(rel: String, ids: Seq[Long]): String = {
      val df = ids.toDF("id")
        .select($"id", concat(lit("t"), $"id").as("text"))
      val target = s"$table/$rel"
      df.coalesce(1).write.mode("overwrite").parquet(s"$target.dir")
      val part = new java.io.File(s"$target.dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(target))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$target.dir"))
      rel
    }
    val f0 = dataFile("part-000.parquet", Seq(1L, 2L))
    commit(0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      s"""{"metaData":{"id":"t","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}""",
      s"""{"add":{"path":"$f0","partitionValues":{},"size":10,"modificationTime":0,"dataChange":true}}"""))

    val got = new Batches[(Long, String)]
    val q = spark.readStream
      .format("graft.streaming.DeltaStreamSource")
      .option("path", table).option("mode", "cdf").load()
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        got.add(df.select($"id", $"_change_type")
          .as[(Long, String)].collect().sorted.toSeq))
      .start()
    try {
      // baseline: history before the subscription never serves
      q.processAllAvailable()
      assert(got.all.isEmpty, got.all.toString)
      // one commit removing f0 and adding f1 → row-level batch
      val f1 = dataFile("part-001.parquet", Seq(3L))
      commit(1, Seq(
        s"""{"add":{"path":"$f1","partitionValues":{},"size":10,"modificationTime":0,"dataChange":true}}""",
        s"""{"remove":{"path":"$f0","deletionTimestamp":1,"dataChange":true,"partitionValues":{}}}"""))
      q.processAllAvailable()
      assert(got.all == Vector(Seq((1L, "delete"), (2L, "delete"),
        (3L, "insert"))), got.all.toString)
    } finally q.stop()
  }

  test("files-mode streams fail directed on rewrites unless opted in") {
    // a commit that removes data files would make files-mode streaming
    // re-serve rewritten rows and drop deletes — directed, matching
    // delta-spark's own contract; ignoreChanges is the explicit opt-in
    val table = tmp() + "/t"
    val ckpt = tmp() + "/ckpt"
    DeltaWriter.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"), table)
    val got = new Batches[Long]
    def run(ignore: Boolean)(
        during: org.apache.spark.sql.streaming.StreamingQuery => Unit)
        : Either[Throwable, Vector[Seq[Long]]] = {
      val reader = spark.readStream
        .format("graft.streaming.DeltaStreamSource").option("path", table)
      val q = (if (ignore) reader.option("ignoreChanges", "true") else reader)
        .load().writeStream.option("checkpointLocation", ckpt)
        .foreachBatch((df: DataFrame, _: Long) =>
          got.add(df.select($"id").as[Long].collect().sorted.toSeq))
        .start()
      try { during(q); Right(got.all) }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(e) }
      finally q.stop()
    }
    // consume the initial snapshot, then land a REWRITE commit mid-stream:
    // remove every v0 file, re-add the same rows in one new file
    val denied = run(ignore = false) { q =>
      q.processAllAvailable()
      assert(got.all == Vector(Seq(1L, 2L)), got.all.toString)
      val fs = new Path(table).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val v0 = graft.sources.FsText.read(fs,
        new Path(s"$table/_delta_log/00000000000000000000.json"))
      val oldPaths = v0.split('\n').filter(_.contains("\"add\""))
        .map(_.split("\"path\":\"")(1).split("\"")(0)).toSeq
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
      df.coalesce(1).write.mode("overwrite").parquet(s"$table/rw.dir")
      val part = new java.io.File(s"$table/rw.dir").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$table/rewrite-000.parquet"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(
          s"$table/_delta_log/00000000000000000001.json"),
        (Seq(s"""{"add":{"path":"rewrite-000.parquet","partitionValues":{},"size":1,"modificationTime":0,"dataChange":true}}""") ++
          oldPaths.map(p =>
            s"""{"remove":{"path":"$p","deletionTimestamp":1,"dataChange":true}}"""))
          .mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
    }
    assert(denied.isLeft &&
      denied.left.exists(_.getMessage.contains("ignoreChanges")),
      denied.toString)
    // the opt-in resumes from the same checkpoint and accepts the
    // re-served rewritten rows
    val allowed = run(ignore = true)(_.processAllAvailable())
    assert(allowed.isRight, allowed.toString)
    assert(got.all.last.sorted == Seq(1L, 2L), got.all.toString)
  }

  test("iceberg stream: snapshot then appended files; changelog mode") {
    val table = tmp() + "/t"
    IcebergWriter.writeAppend(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"), table)

    val got = new Batches[Long]
    val q = spark.readStream
      .format("graft.streaming.IcebergStreamSource")
      .option("path", table).load()
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        got.add(df.select($"id").as[Long].collect().sorted.toSeq))
      .start()
    try {
      q.processAllAvailable()
      IcebergWriter.writeAppend(spark,
        Seq((3L, "c")).toDF("id", "text"), table)
      q.processAllAvailable()
      assert(got.all == Vector(Seq(1L, 2L), Seq(3L)), got.all.toString)
    } finally q.stop()

    // changelog mode over the same table: empty baseline, then net
    // insert rows for the next append
    val got2 = new Batches[(Long, String)]
    val q2 = spark.readStream
      .format("graft.streaming.IcebergStreamSource")
      .option("path", table).option("mode", "changelog").load()
      .writeStream
      .foreachBatch((df: DataFrame, _: Long) =>
        got2.add(df.select($"id", $"_change_type")
          .as[(Long, String)].collect().sorted.toSeq))
      .start()
    try {
      q2.processAllAvailable()
      assert(got2.all.isEmpty, got2.all.toString)
      IcebergWriter.writeAppend(spark,
        Seq((9L, "z")).toDF("id", "text"), table)
      q2.processAllAvailable()
      assert(got2.all == Vector(Seq((9L, "insert"))), got2.all.toString)
    } finally q2.stop()
  }
}
