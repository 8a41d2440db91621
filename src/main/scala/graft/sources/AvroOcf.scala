package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container files (OCF) — the row container data lakes and
  * event-log archives ship (Kafka dumps, Sqoop/Hive exports, HF dataset
  * mirrors). Spark bundles the Avro LIBRARY (avro + avro-mapred jars) but
  * not the spark-avro DataSource, so this reader builds the missing
  * surface on the bundled library — no new dependency.
  *
  * Scale model: OCF is SPLITTABLE — every block ends with the file's
  * 16-byte sync marker, so a byte range maps to whole blocks
  * (`DataFileReader.sync(start)` + `pastSync(end)`, the same contract the
  * Hadoop AvroInputFormat uses). Large files fan out one task per ~range;
  * schema resolution runs per task against the driver's schema, so a
  * directory written over time with COMPATIBLE schema evolution (added
  * fields with defaults, reordered fields) reads as one table — exactly
  * Avro's published resolution rules. Codecs: null, deflate, snappy,
  * zstandard, bzip2, xz — whatever the bundled CodecFactory resolves;
  * an unresolvable codec is the library's own directed error. */
object AvroOcf {
  final case class UnsupportedAvro(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------- schema mapping

  /** Avro schema → Spark type. Nullability is carried by [null, T] unions
    * (the Avro idiom); any other union is a directed error. */
  private def sparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
      (if (lt == "date") DateType else IntegerType, false)
    case Schema.Type.LONG =>
      val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
      (if (lt == "timestamp-millis" || lt == "timestamp-micros" ||
        lt == "local-timestamp-millis" || lt == "local-timestamp-micros")
        TimestampNTZType
      else LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      Option(s.getLogicalType) match {
        case Some(d: org.apache.avro.LogicalTypes.Decimal) =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = sparkType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = sparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (t, n) = sparkType(f.schema())
        StructField(f.name(), t, nullable = n)
      }), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size != 1) throw UnsupportedAvro(
        s"union of ${branches.map(_.getType).mkString("/")} — only " +
          "[null, T] nullable unions map to a column type")
      val (t, _) = sparkType(nonNull.head)
      (t, true)
    case Schema.Type.NULL => (NullType, true)
  }

  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"top-level Avro type ${avro.getType} (record required)")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (t, n) = sparkType(f.schema())
      StructField(f.name(), t, nullable = n)
    })
  }

  /** Avro runtime value → Spark external row value, by the FIELD schema
    * (logical types decode here: date/timestamp/decimal). */
  private def convert(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        convert(v, nonNull)
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = v match {
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case f: org.apache.avro.generic.GenericFixed => f.bytes()
          case other => throw UnsupportedAvro(
            s"bytes value of class ${other.getClass.getName}")
        }
        Option(s.getLogicalType) match {
          case Some(d: org.apache.avro.LogicalTypes.Decimal) =>
            BigDecimal(new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case Schema.Type.INT =>
        val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
        if (lt == "date")
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        else v
      case Schema.Type.LONG =>
        val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
        val x = v.asInstanceOf[Long]
        lt match {
          case "timestamp-millis" | "local-timestamp-millis" =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(x, 1000L), Math.floorMod(x, 1000L).toInt * 1000000,
              java.time.ZoneOffset.UTC)
          case "timestamp-micros" | "local-timestamp-micros" =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(x, 1000000L),
              Math.floorMod(x, 1000000L).toInt * 1000,
              java.time.ZoneOffset.UTC)
          case _ => x
        }
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(convert(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, x) => k.toString -> convert(x, s.getValueType)
        }.toMap
      case Schema.Type.RECORD =>
        val r = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          convert(r.get(f.pos()), f.schema())))
      case _ => v
    }
  }

  private def toRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
      convert(rec.get(f.pos()), f.schema())))

  // --------------------------------------------------------------- reads

  /** Read every OCF matching `pattern` (glob) as one DataFrame. Files
    * larger than `maxSplitBytes` fan out several BLOCK-ALIGNED range tasks
    * (sync-marker scan, the format's split contract); every file's records
    * resolve against the FIRST file's schema, so compatible schema
    * evolution across a directory reads as one table. */
  def read(spark: SparkSession, pattern: String,
      maxSplitBytes: Long = 32L << 20): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(_.getPath.toString)
    require(files.nonEmpty, s"no avro files match $pattern")
    readResolved(spark, files, maxSplitBytes)
  }

  private def readResolved(spark: SparkSession, files: Seq[String],
      maxSplitBytes: Long,
      sourceFileCol: Option[String] = None): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // driver: one header read gives the table schema
    val schemaJson = {
      val in = new FsInput(new Path(files.head), conf)
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema.toString finally r.close()
    }
    val schema = new Schema.Parser().parse(schemaJson)
    val sSchema0 = sparkSchema(schema)
    val sSchema = sourceFileCol match {
      case Some(n) => org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType, nullable = false) +:
          sSchema0.fields.toSeq)
      case None => sSchema0
    }
    val withSource = sourceFileCol.isDefined
    val splits: Seq[(String, Long, Long)] = files.flatMap { uri =>
      val fp = new Path(uri)
      val len = fp.getFileSystem(conf).getFileStatus(fp).getLen
      if (len <= maxSplitBytes) Seq((uri, 0L, len))
      else {
        val n = ((len + maxSplitBytes - 1) / maxSplitBytes).toInt
        val step = len / n
        (0 until n).map(i =>
          (uri, i * step, if (i == n - 1) len else (i + 1) * step))
      }
    }
    val tconf = TaskConf(conf)
    val nPart = math.max(1, math.min(splits.size,
      spark.sparkContext.defaultParallelism * 2))
    val rdd = spark.sparkContext.parallelize(splits, nPart).flatMap {
      case (uri, start, end) =>
        val c = tconf.value
        val in = new FsInput(new Path(uri), c)
        // expected schema = the driver's: avro's resolution rules handle
        // added-with-default / reordered fields per file
        val reader = DataFileReader.openReader(in,
          new GenericDatumReader[GenericRecord](
            null, new Schema.Parser().parse(schemaJson)))
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: java.io.IOException => }))
        reader.sync(start) // first block AFTER start (0 -> first block)
        val local = new Schema.Parser().parse(schemaJson)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) try reader.close() catch { case _: java.io.IOException => }
            h
          }
          override def next(): Row = {
            val r = toRow(reader.next(), local)
            if (withSource) Row.fromSeq(uri +: r.toSeq) else r
          }
        }
    }
    spark.createDataFrame(rdd, sSchema)
  }

  /** Read an explicit file list as ONE job per distinct writer schema:
    * files group by their header schema (one small ranged read each,
    * driver-side) and each group plans a single split-fanned read, so N
    * files never cost N Spark jobs; groups union by name. The Iceberg
    * manifest path — hundreds of small same-schema Avro files — reads in
    * O(1) jobs this way. */
  def readFiles(spark: SparkSession, files: Seq[String],
      maxSplitBytes: Long = 32L << 20,
      sourceFileCol: Option[String] = None): DataFrame = {
    require(files.nonEmpty, "readFiles: empty file list")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    def headerSchema(uri: String): String = {
      val in = new FsInput(new Path(uri), conf)
      val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      try r.getSchema.toString finally r.close()
    }
    val bySchema = files.map(f => (headerSchema(f), f))
      .groupBy(_._1).values.toSeq.map(_.map(_._2))
    bySchema.map(group =>
        readResolved(spark, group, maxSplitBytes, sourceFileCol))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** [[readFiles]] evaluated wholly on the DRIVER into a LOCAL DataFrame
    * (a LocalRelation) — the metadata-read fast path. Iceberg manifest
    * lists and manifests are KB-sized and their rows are collected back
    * to the driver anyway, so the parallelize→tasks→collect round-trip
    * of the distributed read is pure Spark-job overhead (one job per
    * writer schema ≈ 2 jobs per snapshot replay). Over a LocalRelation
    * the optimizer folds Projects/Filters eagerly
    * (ConvertToLocalRelation), so the caller's select+collect launches
    * NO job while evaluating the exact same Catalyst expressions
    * (to_json partition tuples, casts) as before. Semantics match
    * [[readFiles]]: records decode against their own writer schema,
    * schema groups merge union-by-name with null padding for absent
    * columns; a same-named column with CONFLICTING types across writer
    * schemas is directed (unionByName would throw there too). Above
    * `maxLocalBytes` total — or when any file cannot be stat-ed — this
    * falls back to the distributed [[readFiles]]: at that size the
    * decode work is worth distributing even though the collect cost
    * stays. */
  def readFilesLocal(spark: SparkSession, files: Seq[String],
      sourceFileCol: Option[String] = None,
      maxLocalBytes: Long = 64L << 20): DataFrame = {
    require(files.nonEmpty, "readFilesLocal: empty file list")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val total = try files.map { f =>
      val p = new Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum catch { case _: java.io.IOException => Long.MaxValue }
    if (total > maxLocalBytes)
      return readFiles(spark, files, sourceFileCol = sourceFileCol)
    // decode: groups keyed by the EXACT writer-schema json, insertion
    // order kept so the merged column order matches readFiles' unions
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[String, (StructType, scala.collection.mutable.ArrayBuffer[Row])]
    files.foreach { uri =>
      val in = new FsInput(new Path(uri), conf)
      val reader = DataFileReader.openReader(in,
        new GenericDatumReader[GenericRecord]())
      try {
        val schema = reader.getSchema
        val (_, buf) = groups.getOrElseUpdate(schema.toString, {
          val base = sparkSchema(schema)
          val ss = sourceFileCol match {
            case Some(n) => StructType(
              StructField(n, StringType, nullable = false) +:
                base.fields.toSeq)
            case None => base
          }
          (ss, scala.collection.mutable.ArrayBuffer.empty[Row])
        })
        while (reader.hasNext) {
          val r = toRow(reader.next(), schema)
          buf += (if (sourceFileCol.isDefined) Row.fromSeq(uri +: r.toSeq)
            else r)
        }
      } finally reader.close()
    }
    val gs = groups.values.toSeq
    // merged schema: first group's columns, then unseen names appended,
    // STRUCTS MERGED RECURSIVELY — unionByName(allowMissingColumns =
    // true) semantics, which the distributed readFiles relies on for
    // mixed-version manifest sets (a v3 manifest's data_file struct
    // carries fields a v2 one lacks)
    def mergeType(a: DataType, b: DataType, at: String): DataType =
      (a, b) match {
        case (x, y) if x == y => x
        case (sa: StructType, sb: StructType) =>
          val fs = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
          sa.fields.foreach(f => fs += f.name -> f)
          sb.fields.foreach { f =>
            fs.get(f.name) match {
              case None => fs += f.name -> f.copy(nullable = true)
              case Some(p) => fs += f.name -> StructField(f.name,
                mergeType(p.dataType, f.dataType, s"$at.${f.name}"),
                nullable = p.nullable || f.nullable)
            }
          }
          // a field of sa absent from sb reads null in sb's rows
          StructType(fs.values.toSeq.map(f =>
            if (sa.fieldNames.contains(f.name) &&
              sb.fieldNames.contains(f.name)) f
            else f.copy(nullable = true)))
        case (ArrayType(ea, na), ArrayType(eb, nb)) =>
          ArrayType(mergeType(ea, eb, s"$at[]"), na || nb)
        case (MapType(ka, va, na), MapType(kb, vb, nb)) if ka == kb =>
          MapType(ka, mergeType(va, vb, s"$at{}"), na || nb)
        case _ => throw UnsupportedAvro(
          s"readFilesLocal: column '$at' has conflicting types " +
            s"${a.simpleString} vs ${b.simpleString} across writer schemas")
      }
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    gs.foreach { case (ss, _) =>
      ss.fields.foreach { f =>
        fields.get(f.name) match {
          case None => fields += f.name -> f
          case Some(prev) => fields += f.name -> StructField(f.name,
            mergeType(prev.dataType, f.dataType, f.name),
            nullable = prev.nullable || f.nullable)
        }
      }
    }
    val merged = StructType(fields.values.toSeq.map(f =>
      if (gs.forall(_._1.fieldNames.contains(f.name))) f
      else f.copy(nullable = true)))
    // value coercion group-type → merged-type: identity when equal;
    // structs re-shape by name with null padding, containers map through
    def pad(v: Any, from: DataType, to: DataType): Any =
      if (v == null || from == to) v
      else (from, to) match {
        case (sf: StructType, st: StructType) =>
          val r = v.asInstanceOf[Row]
          val idx = sf.fieldNames.zipWithIndex.toMap
          Row.fromSeq(st.fields.toSeq.map { tf =>
            idx.get(tf.name) match {
              case Some(i) => pad(r.get(i),
                sf.fields(i).dataType, tf.dataType)
              case None => null
            }
          })
        case (ArrayType(ef, _), ArrayType(et, _)) =>
          v.asInstanceOf[Seq[Any]].map(pad(_, ef, et))
        case (MapType(_, vf, _), MapType(_, vt, _)) =>
          v.asInstanceOf[Map[Any, Any]].map { case (k, mv) =>
            k -> pad(mv, vf, vt)
          }
        case _ => v
      }
    val rows = new java.util.ArrayList[Row](gs.iterator.map(_._2.size).sum)
    gs.foreach { case (ss, buf) =>
      if (ss == merged) buf.foreach(rows.add)
      else {
        val idx = ss.fieldNames.zipWithIndex.toMap
        buf.foreach { r =>
          rows.add(Row.fromSeq(merged.fields.toSeq.map { mf =>
            idx.get(mf.name) match {
              case Some(i) => pad(r.get(i),
                ss.fields(i).dataType, mf.dataType)
              case None => null
            }
          }))
        }
      }
    }
    spark.createDataFrame(rows, merged)
  }

  /** One row per record from whole-file BYTES columns — the streaming
    * surface: `readStream.format("binaryFile")` delivers newly-landed
    * OCFs as (path, content) rows and this stateless flatMap decodes
    * them in memory (SeekableByteArrayInput), so avro deliveries stream
    * through unchanged pipelines. All files must carry ONE schema — the
    * caller passes it (stream schemas must be known up front). */
  def recordsFrom(df: DataFrame, schemaJson: String, uriCol: String = "path",
      bytesCol: String = "content"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val expected = new Schema.Parser().parse(schemaJson)
    val sSchema = sparkSchema(expected)
    val out = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("file",
        org.apache.spark.sql.types.StringType, nullable = false) +:
        sSchema.fields.toSeq)
    df.select(col(uriCol).cast("string"), col(bytesCol).cast("binary"))
      .flatMap { r =>
        val uri = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (uri == null) throw UnsupportedAvro(
          s"recordsFrom: null $uriCol value (content ${
            if (bytes == null) "null" else s"${bytes.length} B"}) — every " +
            "row needs a non-null path to stamp its records")
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val local = new Schema.Parser().parse(schemaJson)
          val reader = new DataFileReader[GenericRecord](
            new org.apache.avro.file.SeekableByteArrayInput(bytes),
            new GenericDatumReader[GenericRecord](null, local))
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = reader.hasNext
              if (!h) reader.close()
              h
            }
            override def next(): Row =
              Row.fromSeq(uri +: toRow(reader.next(), local).toSeq)
          }
        }
      }(org.apache.spark.sql.Encoders.row(out))
  }

  /** Schema (as Avro JSON) + per-file block/record stats at header cost —
    * the "what is in this directory" probe. */
  def readMeta(spark: SparkSession, pattern: String): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(f => (f.getPath.toString, f.getLen))
    require(files.nonEmpty, s"no avro files match $pattern")
    val tconf = TaskConf(conf)
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism))).map { case (uri, len) =>
        val c = tconf.value
        val in = new FsInput(new Path(uri), c)
        val r = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        val row: Row =
          try Row(uri, len, r.getSchema.toString,
            Option(r.getMetaString("avro.codec")).getOrElse("null"))
          finally r.close()
        row
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("length", LongType, nullable = false),
      StructField("schema_json", StringType, nullable = false),
      StructField("codec", StringType, nullable = false))))
  }

  // -------------------------------------------------------------- writes

  /** Fixture/export writer: one OCF from (schema JSON, row values aligned
    * with the schema's fields). `codec`: null, deflate, snappy, zstandard,
    * bzip2, xz. `syncInterval` shrinks block size so small fixtures still
    * exercise multi-block splits. `meta`: file-level key-value metadata
    * (Iceberg manifests carry their table schema/spec there). */
  def write(path: String, schemaJson: String, rows: Seq[Seq[Any]],
      codec: String = "null", syncInterval: Int = 0,
      conf: Configuration = new Configuration(),
      meta: Map[String, String] = Map.empty): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    if (codec != "null") w.setCodec(CodecFactory.fromString(codec))
    if (syncInterval > 0) w.setSyncInterval(syncInterval)
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    w.create(schema, out)
    try rows.foreach { vals =>
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.pos(), toAvro(vals(i), f.schema()))
      }
      w.append(rec)
    } finally w.close()
  }

  /** Distributed OCF export: one file per partition (repartition upstream
    * to size shards), rows taken from the DataFrame columns matching the
    * schema's field names, task-attempt temp + rename commit. Column
    * types must already match the schema's Spark mapping (cast upstream).
    * Returns the shard count. */
  def writeShards(df: DataFrame, dir: String, schemaJson: String,
      codec: String = "deflate", syncInterval: Int = 0): Int = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val schema = new Schema.Parser().parse(schemaJson)
    val names = schema.getFields.asScala.toSeq.map(_.name())
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(conf)
    // clear stale shards: a re-run with fewer partitions must not leave
    // higher-numbered shards behind for the read glob
    Option(dfs.globStatus(new Path(s"$dir/shard-*.avro")))
      .foreach(_.foreach(st => dfs.delete(st.getPath, false)))
    val tconf = TaskConf(conf)
    val rows = df.select(names.map(col): _*)
    val rdd = rows.rdd // bind ONCE: AQE must not re-plan between count and run
    val n = rdd.getNumPartitions
    rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val c = tconf.value
      val local = new Schema.Parser().parse(schemaJson)
      val finalPath = new Path(f"$dir/shard-$pid%05d.avro")
      val tmp = new Path(f"$dir/.shard-$pid%05d.${tc.taskAttemptId()}%d.tmp")
      val fs = finalPath.getFileSystem(c)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](local))
      if (codec != "null") w.setCodec(CodecFactory.fromString(codec))
      if (syncInterval > 0) w.setSyncInterval(syncInterval)
      w.create(local, fs.create(tmp, true))
      try {
        val fields = local.getFields.asScala.toSeq
        it.foreach { r =>
          val rec = new GenericData.Record(local)
          fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.pos(), toAvro(sparkToPlain(r.get(i)), f.schema()))
          }
          w.append(rec)
        }
      } finally w.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        fs.delete(tmp, false)
        throw UnsupportedAvro(s"could not commit shard $pid to $finalPath")
      }
    }
    n
  }

  /** Spark external row values → the plain shapes [[toAvro]] expects.
    * Temporals pass THROUGH unconverted: only [[toAvro]] sees the field
    * schema, and a timestamp's long encoding depends on its logical type
    * (millis vs micros) — converting here once stored micros into
    * timestamp-millis fields, values 1000x wrong on read-back. */
  private def sparkToPlain(v: Any): Any = v match {
    case null => null
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case dec: java.math.BigDecimal => dec.unscaledValue().toByteArray
    case s: scala.collection.Seq[_] => s.toSeq.map(sparkToPlain)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k.toString -> sparkToPlain(x) }.toMap
    case r: Row => r.toSeq.map(sparkToPlain)
    case other => other
  }

  private def toAvro(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION =>
        toAvro(v, s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
      case Schema.Type.LONG =>
        // temporal encoding follows the FIELD's logical type: millis
        // fields get epoch millis, everything else micros (the Avro spec
        // defaults). Plain longs pass through — the caller owns their
        // semantics ("cast upstream").
        val millis = Option(s.getLogicalType).map(_.getName).exists(n =>
          n == "timestamp-millis" || n == "local-timestamp-millis")
        def fromMicros(us: Long): Long =
          if (millis) Math.floorDiv(us, 1000L) else us
        v match {
          case t: java.time.LocalDateTime => fromMicros(
            t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              t.getNano / 1000L)
          case t: java.time.Instant => fromMicros(
            t.getEpochSecond * 1000000L + t.getNano / 1000L)
          case t: java.sql.Timestamp =>
            val i = t.toInstant
            fromMicros(i.getEpochSecond * 1000000L + i.getNano / 1000L)
          case other => other
        }
      case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY =>
        v.asInstanceOf[Seq[Any]].map(toAvro(_, s.getElementType)).asJava
      case Schema.Type.MAP =>
        v.asInstanceOf[Map[String, Any]]
          .map { case (k, x) => k -> toAvro(x, s.getValueType) }.asJava
      case Schema.Type.ENUM =>
        new GenericData.EnumSymbol(s, v.toString)
      case Schema.Type.RECORD =>
        val rec = new GenericData.Record(s)
        val vals = v.asInstanceOf[Seq[Any]]
        s.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.pos(), toAvro(vals(i), f.schema()))
        }
        rec
      case _ => v
    }
  }
}
