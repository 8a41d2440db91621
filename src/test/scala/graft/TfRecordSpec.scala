package graft

import org.apache.spark.sql.functions._

import graft.sources.TfRecord
import graft.sources.TfRecord.FeatureSpec

/** TFRecord container: framing (length/data masked CRC-32C), the
  * tf.train.Example proto walk (packed AND expanded repeated scalars),
  * GZIP shard sniffing, typed feature extraction, and the distributed
  * shard export. */
class TfRecordSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tfrec").toString

  private def sampleRecords(n: Int, seed: Int = 0): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val k = seed * 1000 + i
      TfRecord.encodeExample(Seq(
        "id" -> Seq(k.toLong),
        "score" -> Seq(k * 0.25f),
        "tags" -> Seq(k.toLong, k * 2L, k * 3L),
        "name" -> Seq(s"doc-$k"),
        "blob" -> Seq(Array[Byte](1, 2, (k % 127).toByte))))
    }

  private val spec = Seq(
    FeatureSpec("id", "int64"),
    FeatureSpec("score", "float"),
    FeatureSpec("tags", "int64", scalar = false),
    FeatureSpec("name", "string"),
    FeatureSpec("blob", "bytes"),
    FeatureSpec("absent", "float")) // never written: must read null

  test("round-trip: records + typed examples, plain/gzip/zlib in one glob") {
    val dir = tmp()
    TfRecord.write(s"$dir/a.tfrecord", sampleRecords(5, seed = 1))
    TfRecord.write(s"$dir/b.tfrecord.gz", sampleRecords(3, seed = 2), gzip = true)
    // ZLIB option, deliberately MIS-NAMED .gz: sniffing must go by content
    TfRecord.write(s"$dir/c.tfrecord.gz", sampleRecords(2, seed = 3),
      zlib = true)
    val recs = TfRecord.records(spark, s"$dir/*.tfrecord*")
    assert(recs.count() == 10)
    assert(recs.rdd.getNumPartitions == 3) // one task per shard
    val df = TfRecord.examples(spark, s"$dir/*.tfrecord*", spec)
      .orderBy($"id")
    val rows = df.collect()
    assert(rows.length == 10)
    val ks = Seq(1000, 1001, 1002, 1003, 1004, 2000, 2001, 2002, 3000, 3001)
    rows.zip(ks).foreach { case (r, k) =>
      assert(r.getAs[Long]("id") == k)
      assert(r.getAs[Float]("score") == k * 0.25f)
      assert(r.getSeq[Long](r.fieldIndex("tags")) == Seq(k.toLong, k * 2L, k * 3L))
      assert(r.getAs[String]("name") == s"doc-$k")
      assert(r.getAs[Array[Byte]]("blob").toSeq ==
        Seq[Byte](1, 2, (k % 127).toByte))
      assert(r.isNullAt(r.fieldIndex("absent")))
    }
  }

  test("expanded (non-packed) repeated scalars decode like packed ones") {
    // hand-assemble a tf.Example whose Int64List uses wire-type-0 repeats
    // and whose FloatList uses wire-type-5 repeats — the proto2-era
    // encoding some writers still emit
    def varint(v: Long): Seq[Byte] = {
      var x = v; val out = Seq.newBuilder[Byte]; var more = true
      while (more) {
        val b = (x & 0x7f).toInt; x = x >>> 7; more = x != 0
        out += (if (more) b | 0x80 else b).toByte
      }
      out.result()
    }
    def ld(field: Int, body: Seq[Byte]): Seq[Byte] =
      varint((field << 3) | 2) ++ varint(body.length.toLong) ++ body
    def fl32(field: Int, f: Float): Seq[Byte] = {
      val bits = java.lang.Float.floatToIntBits(f)
      varint((field << 3) | 5) ++
        Seq(bits.toByte, (bits >>> 8).toByte, (bits >>> 16).toByte,
          (bits >>> 24).toByte)
    }
    def entry(name: String, featureBody: Seq[Byte]): Seq[Byte] =
      ld(1, ld(1, name.getBytes("UTF-8").toSeq) ++ ld(2, featureBody))
    // Feature { int64_list { value: 7  value: 9 } } — each value its own
    // tag(1, varint) pair, no packed blob
    val int64Feature = ld(3,
      (varint((1 << 3) | 0) ++ varint(7L)) ++
        (varint((1 << 3) | 0) ++ varint(9L)))
    // Feature { float_list { value: 1.5  value: -2.25 } } — tag(1, fixed32)
    val floatFeature = ld(2, fl32(1, 1.5f) ++ fl32(1, -2.25f))
    val ex = ld(1, entry("xs", int64Feature) ++ entry("ys", floatFeature))
    val parsed = TfRecord.parseExample(ex.toArray)
    assert(parsed("xs").longs.toSeq == Seq(7L, 9L))
    assert(parsed("ys").floats.toSeq == Seq(1.5f, -2.25f))
  }

  test("SequenceExample: context columns + per-step feature lists") {
    val dir = tmp()
    val recs = (0 until 6).map { i =>
      TfRecord.encodeSequenceExample(
        context = Seq("id" -> Seq(i.toLong), "lang" -> Seq(s"l$i")),
        lists = Seq(
          // one value per step — the common token-sequence layout
          "tokens" -> (0 until 3).map(t => Seq((i * 10 + t).toLong)),
          // multi-value steps keep their per-step lists
          "pairs" -> (0 until 2).map(t => Seq(t.toLong, (t + i).toLong))))
    }
    TfRecord.write(s"$dir/seq.tfrecord", recs)
    val df = TfRecord.sequenceExamples(spark, s"$dir/seq.tfrecord",
      contextSpec = Seq(FeatureSpec("id", "int64"), FeatureSpec("lang", "string")),
      listSpec = Seq(FeatureSpec("tokens", "int64"),
        FeatureSpec("pairs", "int64", scalar = false)))
    val rows = df.orderBy($"id").collect()
    assert(rows.length == 6)
    (0 until 6).foreach { i =>
      val r = rows(i)
      assert(r.getAs[Long]("id") == i)
      assert(r.getAs[String]("lang") == s"l$i")
      assert(r.getSeq[Long](r.fieldIndex("tokens")) ==
        Seq(i * 10L, i * 10L + 1, i * 10L + 2))
      assert(r.getSeq[scala.collection.Seq[Long]](r.fieldIndex("pairs"))
        .map(_.toSeq).toSeq == Seq(Seq(0L, i.toLong), Seq(1L, i + 1L)))
    }
    // round-trip through the raw parser too
    val (ctx, lists) = TfRecord.parseSequenceExample(recs(2))
    assert(ctx("id").longs.toSeq == Seq(2L))
    assert(lists("tokens").map(_.longs.toSeq) == Seq(Seq(20L), Seq(21L), Seq(22L)))
  }

  test("corrupt shards fail directed: CRC mismatch and truncation") {
    val dir = tmp()
    val path = s"$dir/c.tfrecord"
    TfRecord.write(path, sampleRecords(3))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(20) = (bytes(20) ^ 0x40).toByte // inside record 0's payload
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.tfrecord"), bytes)
    val e = intercept[org.apache.spark.SparkException] {
      TfRecord.records(spark, s"$dir/bad.tfrecord").count()
    }
    assert(e.getMessage.contains("CRC mismatch"), e.getMessage)
    // truncation mid-record (from the CLEAN bytes, so the cut tail — not
    // the flipped bit — is what trips)
    val clean = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/trunc.tfrecord"),
      java.util.Arrays.copyOf(clean, clean.length - 5))
    val e2 = intercept[org.apache.spark.SparkException] {
      TfRecord.records(spark, s"$dir/trunc.tfrecord").count()
    }
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
  }

  test(".idx sidecars make large plain shards range-splittable") {
    val dir = tmp()
    // ~200 records x ~1 KB: big enough to split at a 32 KiB budget
    val recs = (0 until 200).map { i =>
      TfRecord.encodeExample(Seq(
        "id" -> Seq(i.toLong), "pad" -> Seq("x" * 1000)))
    }
    TfRecord.write(s"$dir/big.tfrecord", recs)
    TfRecord.write(s"$dir/small.tfrecord.gz", sampleRecords(3), gzip = true)
    assert(TfRecord.writeIndex(spark, s"$dir/*.tfrecord*") == 1) // gz skipped
    assert(new java.io.File(s"$dir/big.tfrecord.idx").exists())
    // the DALI line shape: "offset size", sizes include the 16 frame bytes
    val first = scala.io.Source.fromFile(s"$dir/big.tfrecord.idx")
      .getLines().next().split(' ')
    assert(first(0) == "0" && first(1).toLong == recs.head.length + 16)
    val spec2 = Seq(FeatureSpec("id", "int64"))
    val unsplit = TfRecord.examples(spark, s"$dir/big.tfrecord", spec2,
      maxSplitBytes = Long.MaxValue)
    val split = TfRecord.examples(spark, s"$dir/big.tfrecord", spec2,
      maxSplitBytes = 32 * 1024)
    assert(unsplit.rdd.getNumPartitions == 1)
    assert(split.rdd.getNumPartitions > 3,
      s"expected several range tasks, got ${split.rdd.getNumPartitions}")
    // identical rows, identical FILE-level ordinals
    val a = unsplit.orderBy($"record_index")
      .select($"record_index", $"id").collect().toSeq
    val b = split.orderBy($"record_index")
      .select($"record_index", $"id").collect().toSeq
    assert(a == b && a.size == 200)
    // the glob read still serves the gz shard as one task beside the splits
    assert(TfRecord.records(spark, s"$dir/*.tfrecord*",
      maxSplitBytes = 32 * 1024).count() == 203)
    // a STALE sidecar (shard rewritten underneath it) is a directed error
    // at PLAN time, before any task launches
    TfRecord.write(s"$dir/big.tfrecord", recs.take(50))
    val e = intercept[TfRecord.UnsupportedTfRecord] {
      TfRecord.examples(spark, s"$dir/big.tfrecord", spec2,
        maxSplitBytes = 32 * 1024).count()
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // writeShards clears sidecars along with the shards they described
    val df40 = spark.range(40).selectExpr("id", "'x' AS text",
      "cast(id as float) AS score", "array(id) AS tags", "'n' AS name")
    TfRecord.writeShards(df40.repartition(2), dir2(dir), tfShardSpec)
    TfRecord.writeIndex(spark, s"${dir2(dir)}/shard-*.tfrecord")
    TfRecord.writeShards(df40.repartition(2), dir2(dir), tfShardSpec)
    assert(!new java.io.File(dir2(dir)).listFiles()
      .exists(_.getName.endsWith(".idx")), "stale sidecars must be cleared")
  }

  private def dir2(dir: String): String = s"$dir/re"
  private val tfShardSpec = Seq(
    FeatureSpec("id", "int64"), FeatureSpec("text", "string"),
    FeatureSpec("score", "float"), FeatureSpec("tags", "int64", scalar = false),
    FeatureSpec("name", "string"))

  test("recordsFrom streams arriving shards: stream == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    val dir = tmp()
    TfRecord.write(s"$dir/s.tfrecord.gz", sampleRecords(4, seed = 3), gzip = true)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/s.tfrecord.gz"))
    val batch = TfRecord.recordsFrom(Seq(("f:s", bytes)).toDF("path", "content"))
      .orderBy($"record_index").select(md5($"content")).as[String].collect().toSeq
    assert(batch.size == 4)
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Array[Byte])]
    val q = TfRecord.recordsFrom(in.toDF().toDF("path", "content"))
      .writeStream.format("memory").queryName("tfrec_stream")
      .outputMode("append").start()
    try {
      in.addData(("f:s", bytes))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("tfrec_stream").orderBy($"record_index")
      .select(md5($"content")).as[String].collect().toSeq
    assert(streamed == batch)
  }

  test("distributed shard export round-trips; re-runs clear stale shards") {
    val dir = tmp()
    val df = spark.range(40).select(
      $"id",
      ($"id" * 0.5).cast("float").as("score"),
      array($"id", $"id" * 2).as("tags"),
      concat(lit("n"), $"id").as("name"))
    val wspec = Seq(
      FeatureSpec("id", "int64"),
      FeatureSpec("score", "float"),
      FeatureSpec("tags", "int64", scalar = false),
      FeatureSpec("name", "string"))
    val n1 = TfRecord.writeShards(df.repartition(4), s"$dir/out", wspec)
    assert(n1 == 4)
    val back = TfRecord.examples(spark, s"$dir/out/shard-*.tfrecord", wspec)
    assert(back.count() == 40)
    val r = back.orderBy($"id").collect()
    (0 until 40).foreach { i =>
      assert(r(i).getAs[Long]("id") == i)
      assert(r(i).getAs[Float]("score") == i * 0.5f)
      assert(r(i).getSeq[Long](r(i).fieldIndex("tags")) == Seq(i.toLong, i * 2L))
      assert(r(i).getAs[String]("name") == s"n$i")
    }
    // fewer partitions on re-run: stale higher-numbered shards must vanish
    val n2 = TfRecord.writeShards(df.repartition(2), s"$dir/out", wspec,
      gzip = true)
    assert(n2 == 2)
    val again = TfRecord.examples(spark, s"$dir/out/shard-*.tfrecord*", wspec)
    assert(again.count() == 40)
  }
}
