package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Mover, Multimodal, Similarity, Splitter, Wav}
import graft.sources.Tables

/** Training-data-pipeline operator queries (dedup / similarity / text /
  * multimodal / splitter), each with a DuckDB oracle. Where the operator's
  * hash function matters, the md5-based variants are used (md5 is
  * bit-identical in Spark and DuckDB; xxhash64 remains the library's scale
  * path). Several oracles are generated programmatically so both dialects
  * come from the same formula.
  */
object QueriesML {

  private val MinhashSlots = 8
  private val Bands = 4
  private val RowsPerBand = MinhashSlots / Bands

  // planted near/exact duplicates shared by the dedup queries:
  // every 25th doc gets a near-copy (one appended token), every 50th an
  // exact copy. Same derivation in both engines.
  private val corpusSql = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text || ' graftdup' AS text
    FROM documents WHERE doc_id % 25 = 0
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0"""

  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    docs
      .union(docs.filter($"doc_id" % 25 === 0)
        .select(($"doc_id" + 100000).as("doc_id"), concat($"text", lit(" graftdup")).as("text")))
      .union(docs.filter($"doc_id" % 50 === 0)
        .select(($"doc_id" + 200000).as("doc_id"), $"text"))
  }

  // DuckDB fragments for tokens/shingles (3-word), mirroring Dedup.tokens /
  // Dedup.shingles exactly.
  private val toksSql = "string_split_regex(trim(lower(text)), '\\s+')"
  private def shingleCte(src: String): String = s"""
    toks AS (SELECT doc_id, $toksSql AS t FROM $src),
    sh AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
           FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                 FROM toks WHERE len(t) >= 3))"""

  private def sigSelect: String =
    (0 until MinhashSlots).map(k => s"min(md5('$k:' || s)) AS sig_$k").mkString(",\n             ")

  lazy val all: Seq[Q] = Seq(

    // ------------------------------------------------------- dedup: fuzzy (edit-distance) key join
    // Entity-resolution primitive: every pair of derived 12-char document
    // keys within Levenshtein distance 2, via complete q-gram count-filter
    // candidates + codegen'd levenshtein verify (FuzzyJoin). The oracle
    // cross-joins in DuckDB with its own levenshtein — an independent
    // implementation of both the candidate completeness claim and the
    // distance metric.
    Q("q110_fuzzy_join", Some("""
      WITH d AS (SELECT doc_id,
                        lower(substr(regexp_replace(text, '[^a-zA-Z ]', '', 'g'),
                                     1, 12)) AS s
                 FROM documents ORDER BY doc_id LIMIT 300)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(levenshtein(a.s, b.s) AS INT) AS dist
      FROM d a JOIN d b ON a.doc_id < b.doc_id
      WHERE abs(length(a.s) - length(b.s)) <= 2
        AND levenshtein(a.s, b.s) <= 2
      ORDER BY id_a, id_b"""))(
      (s, d) => {
        val keys = Tables.documents(s, d).orderBy($"doc_id").limit(300)
          .select($"doc_id",
            lower(substring(regexp_replace($"text", "[^a-zA-Z ]", ""), 1, 12))
              .as("s"))
        graft.operators.FuzzyJoin.editSelfJoin(keys, "doc_id", "s", maxDist = 2)
          .select($"id_a", $"id_b", $"dist")
          .orderBy($"id_a", $"id_b")
      }),

    // ------------------------------------------------------- dedup: fuzzy join, full corpus
    // The same operator over EVERY distinct document key (no LIMIT): the
    // scale shape the stress harness replicates at 16x. Keys act as their
    // own ids, so the pair order matches DuckDB's string comparison.
    Q("q112_fuzzy_join_corpus", Some("""
      WITH d AS (SELECT DISTINCT
                   lower(substr(regexp_replace(text, '[^a-zA-Z ]', '', 'g'),
                                1, 12)) AS s
                 FROM documents)
      SELECT a.s AS id_a, b.s AS id_b,
             CAST(levenshtein(a.s, b.s) AS INT) AS dist
      FROM d a JOIN d b ON a.s < b.s
      WHERE abs(length(a.s) - length(b.s)) <= 1
        AND levenshtein(a.s, b.s) <= 1
      ORDER BY id_a, id_b"""))(
      (s, d) => {
        val keys = Tables.documents(s, d)
          .select(lower(substring(
            regexp_replace($"text", "[^a-zA-Z ]", ""), 1, 12)).as("s"))
          .distinct()
        // q = 3 (r20): with 2-grams over the ~27-char key alphabet every
        // gram is corpus-frequent, so the rarest-prefix posting lists are
        // large and the candidate self-join explodes quadratically in them;
        // 3-grams (~20k distinct) are selective and cut the operator's task
        // time ~30% at sf0.1. Result-identical for ANY q: candidates stay a
        // complete superset (prefix-filter lemma) and the levenshtein
        // verify keeps exactly the true pairs.
        graft.operators.FuzzyJoin.editSelfJoin(
          keys.select($"s".as("id"), $"s"), "id", "s", maxDist = 1, q = 3)
          .select($"id_a", $"id_b", $"dist")
          .orderBy($"id_a", $"id_b")
      }),

    // ------------------------------------------------------- multimodal: MP4 container probe
    // Video blobs yield duration/dims/frame-count from the ISO BMFF box
    // walk alone (no codec decode) — the metadata that drives filtering
    // and frame-sampling budgets. The oracle recomputes the planted
    // parameters arithmetically.
    Q("q113_mp4_meta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 100)
      SELECT rn0 AS id,
             'isom' AS brand,
             CAST((o_orderkey % 997 + 1) * 250 AS DOUBLE) / 1000 AS duration_sec,
             CAST(320 + (rn0 % 8) * 160 AS INT) AS width,
             CAST((320 + (rn0 % 8) * 160) * 9 // 16 AS INT) AS height,
             rn0 + 10 AS video_frames,
             CASE WHEN rn0 % 2 = 0 THEN (rn0 + 1) * 441 ELSE 0 END
               AS audio_samples,
             CASE WHEN rn0 % 2 = 0 THEN 2 ELSE 1 END AS track_count
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.operators.Mp4
        val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(100)
          .select(($"o_orderkey" % 997 + 1).cast("long"))
          .collect().map(_.getLong(0))
        val rows = params.zipWithIndex.map { case (k, i) =>
          val w = 320 + (i % 8) * 160
          (i.toLong, Mp4.writeStub("isom", timescale = 1000,
            duration = k * 250, width = w, height = w * 9 / 16,
            videoFrames = i + 10L,
            audioSamples = if (i % 2 == 0) (i + 1) * 441L else 0L))
        }.toSeq
        Mp4.mp4Meta(s.createDataFrame(rows).toDF("doc_id", "payload"),
          "doc_id", "payload")
          .select($"id", $"brand", $"duration_sec", $"width", $"height",
            $"video_frames", $"audio_samples", $"track_count")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- dedup: CCNet line-level boilerplate
    // Lines duplicated across >= 3 documents (planted banner + per-bucket
    // footers) are cut; blank and rare lines keep their order. The oracle
    // rebuilds the same multi-line docs and reassembles with string_agg.
    Q("q114_line_dedup", Some("""
      WITH d AS (SELECT doc_id,
                        'NOTICE: shared banner' || chr(10) || text || chr(10)
                          || chr(10) || 'footer ' || CAST(doc_id % 5 AS VARCHAR)
                          AS t
                 FROM documents),
      l AS (SELECT doc_id, i - 1 AS ord, ls[i] AS line
            FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
                 UNNEST(range(1, len(ls) + 1)) AS r(i)),
      b AS (SELECT trim(line) AS key FROM l WHERE trim(line) <> ''
            GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
      k AS (SELECT l.doc_id, l.ord, l.line FROM l
            LEFT JOIN b ON trim(l.line) = b.key WHERE b.key IS NULL),
      agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS tc
              FROM k GROUP BY doc_id)
      SELECT d.doc_id AS id, COALESCE(agg.tc, '') AS text_clean
      FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
      ORDER BY id"""))(
      (s, d) => {
        val derived = Tables.documents(s, d).select($"doc_id",
          concat(lit("NOTICE: shared banner\n"), $"text",
            lit("\n\nfooter "), ($"doc_id" % 5).cast("string")).as("t"))
        Dedup.dedupLines(derived, "doc_id", "t", minDf = 3)
          .select($"id", $"text_clean")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- multimodal: WebDataset tar shards
    // Tar-shard ingestion (the WebDataset layout: members share a basename
    // per sample). Two shards of derived img/txt members read back as one
    // member table; the oracle recomputes keys, sizes, and md5 digests
    // from the same derivation.
    Q("q115_webdataset", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 100),
      m AS (SELECT lpad(CAST(rn0 AS VARCHAR), 6, '0') AS key,
                   'img' AS ext,
                   'payload-' || CAST(rn0 AS VARCHAR) || '-'
                     || repeat('x', CAST(o_orderkey % 50 AS INT)) AS body
            FROM o
            UNION ALL
            SELECT lpad(CAST(rn0 AS VARCHAR), 6, '0'),
                   'txt',
                   'caption ' || CAST(o_orderkey % 997 AS VARCHAR)
            FROM o)
      SELECT key, ext, CAST(length(body) AS BIGINT) AS size,
             md5(body) AS digest
      FROM m ORDER BY key, ext"""))(
      (s, d) => {
        import graft.sources.TarShards
        val dir = Fixtures.dir("q115", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(100)
            .select(($"o_orderkey" % 50).cast("int"),
              ($"o_orderkey" % 997).cast("long"))
            .collect().map(r => (r.getInt(0), r.getLong(1)))
          val entries = params.zipWithIndex.flatMap { case ((pad, cap), i) =>
            val key = f"$i%06d"
            Seq(s"$key.img" -> s"payload-$i-${"x" * pad}".getBytes("UTF-8"),
              s"$key.txt" -> s"caption $cap".getBytes("UTF-8"))
          }.toSeq
          TarShards.write(s"$dir/shard-000.tar", entries.take(100))
          TarShards.write(s"$dir/shard-001.tar", entries.drop(100))
        }
        TarShards.read(s, s"$dir/shard-*.tar")
          .select($"key", $"ext", $"size", md5($"content").as("digest"))
          .orderBy($"key", $"ext")
      }),

    // ------------------------------------------------------- TFRecord / tf.Example corpora
    // The TensorFlow training-data container (TFDS exports): two shards —
    // one plain, one GZIP (sniffed by magic) — of tf.Examples with int64 /
    // float / int64-list / string features read back as typed columns; the
    // oracle recomputes every planted feature. A float32 slip, a varint
    // slip, or a CRC framing slip breaks the hash.
    Q("q162_tfrecord", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CAST(o_orderkey % 997 AS DOUBLE) * 0.25 AS score,
             o_orderkey * 6 AS tag_sum,
             'doc-' || CAST(rn0 AS VARCHAR) AS name
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.TfRecord
        import graft.sources.TfRecord.FeatureSpec
        val dir = Fixtures.dir("q162", d) { dir =>
          val ks = Tables.orders(s, d).orderBy($"o_orderkey").limit(120)
            .select($"o_orderkey".cast("long"))
            .collect().map(_.getLong(0))
          val recs = ks.zipWithIndex.map { case (k, i) =>
            TfRecord.encodeExample(Seq(
              "id" -> Seq(k),
              "score" -> Seq((k % 997) * 0.25f),
              "tags" -> Seq(k, k * 2, k * 3),
              "name" -> Seq(s"doc-$i")))
          }
          TfRecord.write(s"$dir/a.tfrecord", recs.take(80).toSeq)
          TfRecord.write(s"$dir/b.tfrecord.gz", recs.drop(80).toSeq, gzip = true)
        }
        TfRecord.examples(s, s"$dir/*.tfrecord*", Seq(
            FeatureSpec("id", "int64"),
            FeatureSpec("score", "float"),
            FeatureSpec("tags", "int64", scalar = false),
            FeatureSpec("name", "string")))
          .select($"id", $"score".cast("double").as("score"),
            ($"tags"(0) + $"tags"(1) + $"tags"(2)).as("tag_sum"), $"name")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- Avro object-container files
    // The data-lake row container, read on the avro library Spark bundles
    // (no spark-avro DataSource needed): a deflate-coded file written with
    // a tiny sync interval reads through BLOCK-ALIGNED range splits (sync
    // markers are the split contract), so a records slip, a split-overlap
    // slip, or a codec slip breaks count and hash alike.
    Q("q163_avro", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 300)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS name,
             CAST(o_orderkey % 997 AS DOUBLE) * 0.5 AS score,
             o_orderkey * 3 AS tag_sum
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.AvroOcf
        val dir = Fixtures.dir("q163", d) { dir =>
          val ks = Tables.orders(s, d).orderBy($"o_orderkey").limit(300)
            .select($"o_orderkey".cast("long"))
            .collect().map(_.getLong(0))
          val schema =
            """{"type": "record", "name": "Doc", "fields": [
                 {"name": "id", "type": "long"},
                 {"name": "name", "type": "string"},
                 {"name": "score", "type": "double"},
                 {"name": "tags", "type": {"type": "array", "items": "long"}}
               ]}"""
          val rows = ks.zipWithIndex.map { case (k, i) =>
            Seq(k, s"doc-$i", (k % 997) * 0.5, Seq(k, k * 2))
          }
          AvroOcf.write(s"$dir/q163.avro", schema, rows.toSeq,
            codec = "deflate", syncInterval = 512)
        }
        AvroOcf.read(s, s"$dir/q163.avro", maxSplitBytes = 4096)
          .select($"id", $"name", $"score",
            ($"tags"(0) + $"tags"(1)).as("tag_sum"))
          .orderBy($"id")
      }),

    // ------------------------------------------------------- Delta Lake snapshot
    // A hand-authored Delta table (the public PROTOCOL.md shapes): v0 adds
    // three partitioned files, v1 REMOVES one — the snapshot must serve
    // exactly the surviving add-set with partition columns rebuilt from
    // partitionValues. The oracle recomputes the surviving rows; a replay
    // slip (ghost file, lost remove, wrong partition value) breaks rows
    // and hash alike.
    Q("q164_delta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS text,
             CAST(o_orderkey % 3 AS VARCHAR) AS bucket
      FROM o WHERE o_orderkey % 3 <> 2 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.DeltaTable
        val table = Fixtures.dir("q164", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.StringType)))
          def part(b: Int): String = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i")
              }.toSeq, 1),
              org.apache.spark.sql.types.StructType(schema.take(2)))
            val rel = s"bucket=$b/part-00$b.parquet"
            df.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp$b")
            val f = new java.io.File(s"$dir/tmp$b").listFiles()
              .find(_.getName.endsWith(".parquet")).get
            new java.io.File(s"$dir/bucket=$b").mkdirs()
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(s"$dir/$rel"))
            rel
          }
          val rels = (0 to 2).map(part)
          val schemaStr = schema.json.replace("\"", "\\\"")
          def add(rel: String, b: Int): String =
            s"""{"add":{"path":"$rel","partitionValues":{"bucket":"$b"},""" +
              s""""size":1000,"modificationTime":0,"dataChange":true}}"""
          new java.io.File(s"$dir/_delta_log").mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_delta_log/" + "0" * 20 + ".json"),
            (Seq(
              """{"commitInfo":{"timestamp":1750000000000,"operation":"WRITE"}}""",
              """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
              s"""{"metaData":{"id":"q164","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":["bucket"],"configuration":{},"createdTime":0}}""") ++
              rels.zipWithIndex.map { case (r, b) => add(r, b) })
              .mkString("\n").getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_delta_log/" + "0" * 19 + "1.json"),
            Seq(
              """{"commitInfo":{"timestamp":1750000060000,"operation":"DELETE"}}""",
              s"""{"remove":{"path":"${rels(2)}","deletionTimestamp":1750000060000,"dataChange":true}}""")
              .mkString("\n").getBytes("UTF-8"))
        }
        DeltaTable.read(s, table).select($"id", $"text", $"bucket")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- Iceberg snapshot
    // A hand-authored Iceberg v2 table (the public table-spec shapes):
    // Avro manifest list -> Avro manifest -> parquet data files, where the
    // current snapshot marks one file DELETED (status 2). The snapshot
    // must serve exactly the surviving files; the manifests themselves go
    // through the in-repo AvroOcf reader, so this oracle also covers that
    // chain end-to-end.
    Q("q165_iceberg", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 3 <> 1 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable}
        val table = Fixtures.dir("q165", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def part(b: Int): String = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i")
              }.toSeq, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("text",
                  org.apache.spark.sql.types.StringType))))
            df.coalesce(1).write.mode("overwrite").parquet(s"$dir/tmp$b")
            val f = new java.io.File(s"$dir/tmp$b").listFiles()
              .find(_.getName.endsWith(".parquet")).get
            new java.io.File(s"$dir/data").mkdirs()
            val target = s"$dir/data/p$b.parquet"
            java.nio.file.Files.move(f.toPath,
              java.nio.file.Paths.get(target))
            target
          }
          val files = (0 to 2).map(part)
          new java.io.File(s"$dir/metadata").mkdirs()
          val mSchema =
            """{"type": "record", "name": "manifest_entry", "fields": [
                 {"name": "status", "type": "int"},
                 {"name": "data_file", "type": {"type": "record",
                   "name": "r2", "fields": [
                     {"name": "content", "type": "int"},
                     {"name": "file_path", "type": "string"},
                     {"name": "file_format", "type": "string"},
                     {"name": "record_count", "type": "long"}]}}]}"""
          // files 0 and 2 live; file 1 (id % 3 == 1) is deleted
          AvroOcf.write(s"$dir/metadata/m0.avro", mSchema, Seq(
            Seq(0, Seq(0, files(0), "PARQUET", 1L)),
            Seq(2, Seq(0, files(1), "PARQUET", 1L)),
            Seq(1, Seq(0, files(2), "PARQUET", 1L))))
          AvroOcf.write(s"$dir/metadata/snap-200.avro",
            """{"type": "record", "name": "manifest_file", "fields": [
                 {"name": "manifest_path", "type": "string"},
                 {"name": "manifest_length", "type": "long"},
                 {"name": "content", "type": "int"}]}""",
            Seq(Seq(s"$dir/metadata/m0.avro", 100L, 0)))
          val schemaJson =
            """{"type": "struct", "schema-id": 0, "fields": [
                 {"id": 1, "name": "id", "required": true, "type": "long"},
                 {"id": 2, "name": "text", "required": false, "type": "string"}]}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
            s"""{"format-version": 2, "table-uuid": "q165", "location": "$dir",
                 "current-snapshot-id": 200,
                 "schemas": [$schemaJson], "current-schema-id": 0,
                 "snapshots": [{"snapshot-id": 200, "timestamp-ms": 0,
                   "summary": {"operation": "overwrite"},
                   "manifest-list": "$dir/metadata/snap-200.avro"}]}"""
              .getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
            "1".getBytes("UTF-8"))
        }
        IcebergTable.read(s, table).select($"id", $"text").orderBy($"id")
      }),

    // --------------------------------------------- Delta deletion vectors
    // Merge-on-read the Databricks-default way: adds carry DV descriptors
    // (one uuid-pathed .bin sidecar, one inline z85 payload) whose
    // RoaringBitmapArray bitmaps name deleted row positions. Files are
    // written in id order, so the oracle recomputes survivors from the
    // per-bucket rank: bucket 0 loses every 4th row, bucket 1 its first
    // two, bucket 2 is untouched (mixed clean/DV'd table).
    Q("q172_delta_dv", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150),
           b AS (SELECT o_orderkey AS id,
                        'doc-' || CAST(rn0 AS VARCHAR) AS text,
                        o_orderkey % 3 AS bucket,
                        row_number() OVER (PARTITION BY o_orderkey % 3
                                           ORDER BY o_orderkey) - 1 AS pos
                 FROM o)
      SELECT id, text, CAST(bucket AS VARCHAR) AS bucket FROM b
      WHERE NOT (bucket = 0 AND pos % 4 = 0)
        AND NOT (bucket = 1 AND pos <= 1)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeletionVector, DeltaTable}
        val table = Fixtures.dir("q172", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.StringType)))
          def part(b: Int): (String, Int) = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i")
              }.toSeq, 1),
              org.apache.spark.sql.types.StructType(schema.take(2)))
            val rel = s"bucket=$b/part-00$b.parquet"
            singleParquet(df, s"$dir/$rel")
            (rel, ids.length)
          }
          val parts = (0 to 2).map(part)
          // bucket 0: uuid-pathed sidecar DV killing positions 0,4,8,…
          val uuid = new java.util.UUID(0x7121000071210000L, 42L)
          val uuidBytes = java.nio.ByteBuffer.allocate(16)
            .putLong(uuid.getMostSignificantBits)
            .putLong(uuid.getLeastSignificantBits).array()
          val del0 = (0 until parts(0)._2 by 4).map(_.toLong).toArray
          val (off0, size0) = DeletionVector.writeFile(
            s"$dir/deletion_vector_$uuid.bin",
            DeletionVector.serialize(del0),
            s.sparkContext.hadoopConfiguration)
          val pod0 = DeletionVector.z85Encode(uuidBytes)
          // bucket 1: inline DV killing positions 0 and 1
          val data1 = DeletionVector.serialize(Array(0L, 1L))
          val pod1 = DeletionVector.z85Encode(
            data1 ++ Array.fill((4 - data1.length % 4) % 4)(0.toByte))
          val schemaStr = schema.json.replace("\"", "\\\"")
          def add(rel: String, b: Int, dv: String): String =
            s"""{"add":{"path":"$rel","partitionValues":{"bucket":"$b"},""" +
              s""""size":1000,"modificationTime":0,"dataChange":true$dv}}"""
          new java.io.File(s"$dir/_delta_log").mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_delta_log/" + "0" * 20 + ".json"),
            (Seq(
              """{"commitInfo":{"timestamp":1750000000000,"operation":"WRITE"}}""",
              """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
                """"readerFeatures":["deletionVectors"],""" +
                """"writerFeatures":["deletionVectors"]}}""",
              s"""{"metaData":{"id":"q172","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":["bucket"],"configuration":{},"createdTime":0}}""") ++
              Seq(
                add(parts(0)._1, 0,
                  s""","deletionVector":{"storageType":"u","pathOrInlineDv":"$pod0","offset":$off0,"sizeInBytes":$size0,"cardinality":${del0.length}}"""),
                add(parts(1)._1, 1,
                  s""","deletionVector":{"storageType":"i","pathOrInlineDv":"$pod1","sizeInBytes":${data1.length},"cardinality":2}"""),
                add(parts(2)._1, 2, "")))
              .mkString("\n").getBytes("UTF-8"))
        }
        DeltaTable.read(s, table).select($"id", $"text", $"bucket")
          .orderBy($"id")
      }),

    // ---------------------------------------------- Delta change data feed
    // table_changes semantics: version 0 inserts come from the add;
    // version 1 is an UPDATE whose cdc file is authoritative (pre/post
    // images — the accompanying add must NOT synthesize inserts); version
    // 2 has no cdc, so its dataChange remove re-reads the removed file as
    // deletes and its add becomes inserts. The oracle rebuilds the feed.
    Q("q176_delta_cdf", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 100),
           feed AS (
             SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
                    'insert' AS ct, 0 AS v FROM o
             UNION ALL
             SELECT o_orderkey, 'doc-' || CAST(rn0 AS VARCHAR),
                    'update_preimage', 1 FROM o WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey, 'new-' || CAST(rn0 AS VARCHAR),
                    'update_postimage', 1 FROM o WHERE o_orderkey % 10 = 0
             UNION ALL
             SELECT o_orderkey, 'doc-' || CAST(rn0 AS VARCHAR),
                    'delete', 2 FROM o
             UNION ALL
             SELECT o_orderkey, 'v2-' || CAST(rn0 AS VARCHAR),
                    'insert', 2 FROM o WHERE o_orderkey % 2 = 0)
      SELECT id, text, ct AS _change_type,
             CAST(v AS BIGINT) AS _commit_version
      FROM feed ORDER BY _commit_version, _change_type, id"""))(
      (s, d) => {
        import graft.sources.DeltaTable
        val table = Fixtures.dir("q176", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(100)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))
          def rowsDf(data: Seq[(Long, String)]) = s.createDataFrame(
            s.sparkContext.parallelize(data.map { case (k, t) =>
              org.apache.spark.sql.Row(k, t)
            }, 1), schema)
          val f0 = "part-000.parquet"
          singleParquet(rowsDf(rows.map { case (k, i) => (k, s"doc-$i") }
            .toSeq), s"$dir/$f0")
          val f1 = "part-001.parquet"
          singleParquet(rowsDf(rows.filter(_._1 % 2 == 0)
            .map { case (k, i) => (k, s"v2-$i") }.toSeq), s"$dir/$f1")
          // the v1 cdc file: pre/post images for ids % 10 == 0
          val cdcDf = s.createDataFrame(
            s.sparkContext.parallelize(rows.filter(_._1 % 10 == 0).flatMap {
              case (k, i) => Seq(
                org.apache.spark.sql.Row(k, s"doc-$i", "update_preimage"),
                org.apache.spark.sql.Row(k, s"new-$i", "update_postimage"))
            }.toSeq, 1),
            org.apache.spark.sql.types.StructType(schema.fields :+
              org.apache.spark.sql.types.StructField("_change_type",
                org.apache.spark.sql.types.StringType)))
          singleParquet(cdcDf, s"$dir/_change_data/cdc-000.parquet")
          val schemaStr = schema.json.replace("\"", "\\\"")
          def commit(v: Int, lines: Seq[String]): Unit =
            java.nio.file.Files.write(
              java.nio.file.Paths.get(
                f"$dir/_delta_log/$v%020d.json"),
              lines.mkString("\n").getBytes("UTF-8"))
          new java.io.File(s"$dir/_delta_log").mkdirs()
          def add(rel: String): String =
            s"""{"add":{"path":"$rel","partitionValues":{},"size":1,""" +
              s""""modificationTime":0,"dataChange":true}}"""
          commit(0, Seq(
            """{"commitInfo":{"timestamp":1000,"operation":"WRITE"}}""",
            """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
            s"""{"metaData":{"id":"q176","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":[],"configuration":{"delta.enableChangeDataFeed":"true"},"createdTime":0}}""",
            add(f0)))
          commit(1, Seq(
            """{"commitInfo":{"timestamp":2000,"operation":"UPDATE"}}""",
            s"""{"cdc":{"path":"_change_data/cdc-000.parquet","partitionValues":{},"size":1,"dataChange":false}}"""))
          commit(2, Seq(
            """{"commitInfo":{"timestamp":3000,"operation":"MERGE"}}""",
            add(f1),
            s"""{"remove":{"path":"$f0","deletionTimestamp":3000,"dataChange":true,"partitionValues":{}}}"""))
        }
        DeltaTable.readCdf(s, table, 0L)
          .select($"id", $"text", $"_change_type", $"_commit_version")
          .orderBy($"_commit_version", $"_change_type", $"id")
      }),

    // ------------------------------------------- Iceberg v2 equality deletes
    // Merge-on-read the Flink-CDC/upsert way: an equality delete file at
    // sequence 2 names id values; it removes matching rows ONLY from the
    // sequence-1 data file — the sequence-3 file RE-ADDS some of the same
    // ids and those survive (the table-spec scoping rule). The oracle
    // recomputes both sides: f0 minus the deleted id set, plus all of f1.
    Q("q175_iceberg_eq_deletes", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150),
           f0 AS (SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
                  FROM o WHERE o_orderkey % 3 <> 0),
           f1 AS (SELECT o_orderkey AS id, 're-' || CAST(rn0 AS VARCHAR) AS text
                  FROM o WHERE o_orderkey % 5 = 0)
      SELECT id, text FROM (SELECT * FROM f0 UNION ALL SELECT * FROM f1) u
      ORDER BY id, text"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable}
        val table = Fixtures.dir("q175", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def file(name: String, data: Seq[(Long, String)]): String = {
            val df = s.createDataFrame(
              s.sparkContext.parallelize(data.map { case (k, t) =>
                org.apache.spark.sql.Row(k, t)
              }, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("text",
                  org.apache.spark.sql.types.StringType))))
            singleParquet(df, s"$dir/data/$name")
          }
          val f0 = file("p0.parquet",
            rows.map { case (k, i) => (k, s"doc-$i") }.toSeq)
          val f1 = file("p1.parquet",
            rows.filter(_._1 % 5 == 0)
              .map { case (k, i) => (k, s"re-$i") }.toSeq)
          // the equality delete: all ids divisible by 3 (only the id col)
          val eqDf = s.createDataFrame(
            s.sparkContext.parallelize(rows.filter(_._1 % 3 == 0)
              .map(r => org.apache.spark.sql.Row(r._1)).toSeq, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id",
                org.apache.spark.sql.types.LongType))))
          val eqPath = singleParquet(eqDf, s"$dir/data/eq0.parquet")
          new java.io.File(s"$dir/metadata").mkdirs()
          val mSchema =
            """{"type": "record", "name": "manifest_entry", "fields": [
                 {"name": "status", "type": "int"},
                 {"name": "sequence_number",
                  "type": ["null", "long"], "default": null},
                 {"name": "data_file", "type": {"type": "record",
                   "name": "r2", "fields": [
                     {"name": "content", "type": "int"},
                     {"name": "file_path", "type": "string"},
                     {"name": "file_format", "type": "string"},
                     {"name": "record_count", "type": "long"},
                     {"name": "equality_ids", "type": ["null",
                       {"type": "array", "items": "int"}],
                      "default": null}]}}]}"""
          AvroOcf.write(s"$dir/metadata/m0.avro", mSchema, Seq(
            Seq(1, null, Seq(0, f0, "PARQUET", 150L, null))))
          AvroOcf.write(s"$dir/metadata/m1.avro", mSchema, Seq(
            Seq(1, null, Seq(0, f1, "PARQUET", 30L, null))))
          AvroOcf.write(s"$dir/metadata/md.avro", mSchema, Seq(
            Seq(1, null, Seq(2, eqPath, "PARQUET", 50L, Seq(1)))))
          AvroOcf.write(s"$dir/metadata/snap-400.avro",
            """{"type": "record", "name": "manifest_file", "fields": [
                 {"name": "manifest_path", "type": "string"},
                 {"name": "manifest_length", "type": "long"},
                 {"name": "content", "type": "int"},
                 {"name": "sequence_number", "type": "long"}]}""",
            Seq(Seq(s"$dir/metadata/m0.avro", 100L, 0, 1L),
              Seq(s"$dir/metadata/md.avro", 100L, 1, 2L),
              Seq(s"$dir/metadata/m1.avro", 100L, 0, 3L)))
          val schemaJson =
            """{"type": "struct", "schema-id": 0, "fields": [
                 {"id": 1, "name": "id", "required": true, "type": "long"},
                 {"id": 2, "name": "text", "required": false, "type": "string"}]}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
            s"""{"format-version": 2, "table-uuid": "q175", "location": "$dir",
                 "current-snapshot-id": 400,
                 "schemas": [$schemaJson], "current-schema-id": 0,
                 "snapshots": [{"snapshot-id": 400, "timestamp-ms": 0,
                   "summary": {"operation": "overwrite"},
                   "manifest-list": "$dir/metadata/snap-400.avro"}]}"""
              .getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
            "1".getBytes("UTF-8"))
        }
        IcebergTable.read(s, table).select($"id", $"text")
          .orderBy($"id", $"text")
      }),

    // ---------------------------------------- Delta column mapping (name mode)
    // The Databricks-default physical-name indirection: the log's schema
    // carries delta.columnMapping.physicalName metadata at every nesting
    // level, the parquet files store ONLY physical names (here c1/c2/c3/c4
    // and partition key c5), and partitionValues are keyed physically. The
    // read must rebuild logical names — including through the struct — or
    // columns come back null/misnamed; the oracle recomputes every value.
    Q("q174_delta_column_mapping", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS text,
             round(o_orderkey * 0.5, 6) AS score,
             CAST(o_orderkey % 3 AS VARCHAR) AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.types._
        import graft.sources.DeltaTable
        val table = Fixtures.dir("q174", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id.toLong).build()
          val logical = StructType(Seq(
            StructField("id", LongType, nullable = true, meta("c1", 1)),
            StructField("text", StringType, nullable = true, meta("c2", 2)),
            StructField("info", StructType(Seq(
              StructField("score", DoubleType, nullable = true,
                meta("c4", 4)))), nullable = true, meta("c3", 3)),
            StructField("bucket", StringType, nullable = true, meta("c5", 5))))
          val physSchema = StructType(Seq(
            StructField("c1", LongType),
            StructField("c2", StringType),
            StructField("c3", StructType(Seq(
              StructField("c4", DoubleType))))))
          def part(b: Int): String = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i",
                  org.apache.spark.sql.Row(k * 0.5))
              }.toSeq, 1), physSchema)
            val rel = s"b$b/part-00$b.parquet"
            singleParquet(df, s"$dir/$rel")
            rel
          }
          val rels = (0 to 2).map(part)
          val schemaStr = logical.json.replace("\\", "\\\\")
            .replace("\"", "\\\"")
          new java.io.File(s"$dir/_delta_log").mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_delta_log/" + "0" * 20 + ".json"),
            (Seq(
              """{"commitInfo":{"timestamp":0,"operation":"WRITE"}}""",
              """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
                """"readerFeatures":["columnMapping"],""" +
                """"writerFeatures":["columnMapping"]}}""",
              s"""{"metaData":{"id":"q174","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":["bucket"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"5"},"createdTime":0}}""") ++
              rels.zipWithIndex.map { case (r, b) =>
                s"""{"add":{"path":"$r","partitionValues":{"c5":"$b"},"size":10,"modificationTime":0,"dataChange":true}}"""
              }).mkString("\n").getBytes("UTF-8"))
        }
        DeltaTable.read(s, table)
          .select($"id", $"text", round($"info.score", 6).as("score"),
            $"bucket")
          .orderBy($"id")
      }),

    // ------------------------------------- Delta column mapping (id mode)
    // The upgraded-table shape: resolution is by parquet FIELD ID — the
    // files' column names here (pq1/pq2/pq3/pq4) match neither the
    // logical nor the physical names, so any name-based read would come
    // back empty; only the field ids (written into the parquet schema,
    // matched by Spark's field-id reader path) connect log to data. Same
    // value oracle as q174.
    Q("q178_delta_cm_id", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS text,
             round(o_orderkey * 0.5, 6) AS score,
             CAST(o_orderkey % 3 AS VARCHAR) AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.types._
        import graft.sources.DeltaTable
        val table = Fixtures.dir("q178", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def meta(phys: String, id: Int): Metadata = new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id.toLong).build()
          val logical = StructType(Seq(
            StructField("id", LongType, nullable = true, meta("c1", 1)),
            StructField("text", StringType, nullable = true, meta("c2", 2)),
            StructField("info", StructType(Seq(
              StructField("score", DoubleType, nullable = true,
                meta("c4", 4)))), nullable = true, meta("c3", 3)),
            StructField("bucket", StringType, nullable = true, meta("c5", 5))))
          def fid(id: Int): Metadata = new MetadataBuilder()
            .putLong("parquet.field.id", id.toLong).build()
          val fileSchema = StructType(Seq(
            StructField("pq1", LongType, nullable = true, fid(1)),
            StructField("pq2", StringType, nullable = true, fid(2)),
            StructField("pq3", StructType(Seq(
              StructField("pq4", DoubleType, nullable = true, fid(4)))),
              nullable = true, fid(3))))
          def part(b: Int): String = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i",
                  org.apache.spark.sql.Row(k * 0.5))
              }.toSeq, 1), fileSchema)
            val rel = s"b$b/part-00$b.parquet"
            singleParquet(df, s"$dir/$rel")
            rel
          }
          val rels = (0 to 2).map(part)
          val schemaStr = logical.json.replace("\\", "\\\\")
            .replace("\"", "\\\"")
          new java.io.File(s"$dir/_delta_log").mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/_delta_log/" + "0" * 20 + ".json"),
            (Seq(
              """{"commitInfo":{"timestamp":0,"operation":"WRITE"}}""",
              """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
                """"readerFeatures":["columnMapping"],""" +
                """"writerFeatures":["columnMapping"]}}""",
              s"""{"metaData":{"id":"q178","format":{"provider":"parquet","options":{}},"schemaString":"$schemaStr","partitionColumns":["bucket"],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"5"},"createdTime":0}}""") ++
              rels.zipWithIndex.map { case (r, b) =>
                s"""{"add":{"path":"$r","partitionValues":{"c5":"$b"},"size":10,"modificationTime":0,"dataChange":true}}"""
              }).mkString("\n").getBytes("UTF-8"))
        }
        DeltaTable.read(s, table)
          .select($"id", $"text", round($"info.score", 6).as("score"),
            $"bucket")
          .orderBy($"id")
      }),

    // ---------------------------------------------- fastText .bin inference
    // A planted-weight supervised model written in the PUBLIC .bin layout,
    // loaded back through the parser, and run distributed: identity word
    // vectors make the hidden state an exact token average, so the oracle
    // recomputes each doc's softmax from the planted output rows (maxn=0:
    // OOV tokens contribute nothing). A parse slip, an averaging slip, or
    // a label-order slip breaks label and probability alike.
    Q("q173_fasttext", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 200),
           c AS (SELECT o_orderkey AS id, rn0 % 3 AS v FROM o),
           s AS (SELECT id,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (1.0 + 0.5) / 2
                     WHEN 1 THEN (1.0 + 2.0 + 0.5) / 3
                     ELSE (2.0 - 1.0 + 0.5) / 3 END AS sg,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (0.25 - 0.125) / 2
                     WHEN 1 THEN (0.25 - 0.25 - 0.125) / 3
                     ELSE (-0.25 + 2.5 - 0.125) / 3 END AS sb
                 FROM c)
      SELECT id,
             CASE WHEN sg >= sb THEN 'good' ELSE 'bad' END AS label,
             round(CASE WHEN sg >= sb THEN exp(sg) / (exp(sg) + exp(sb))
                        ELSE exp(sb) / (exp(sg) + exp(sb)) END, 6) AS prob
      FROM s ORDER BY id"""))(
      (s, d) => {
        import graft.functions.FastText
        val binPath = Fixtures.path("q173", d, "m.bin") { p =>
          def e(i: Int): Array[Float] = {
            val a = new Array[Float](4); a(i) = 1.0f; a
          }
          val m = FastText.Model(dim = 4, minn = 0, maxn = 0, bucket = 0,
            wordNgrams = 1, loss = "softmax",
            words = Map("alpha" -> 0, "beta" -> 1, "gamma" -> 2, "</s>" -> 3),
            labels = Array("good", "bad"),
            input = Array.tabulate(4)(e),
            output = Array(
              Array(1.0f, 2.0f, -1.0f, 0.5f),
              Array(0.25f, -0.25f, 2.5f, -0.125f)))
          FastText.write(p, m, s.sparkContext.hadoopConfiguration)
        }
        val model = FastText.load(binPath, s.sparkContext.hadoopConfiguration)
        val in = orderedKeys(s, d, 200)
          .select($"doc_id",
            when($"rn0" % 3 === 0, lit("alpha"))
              .when($"rn0" % 3 === 1, lit("alpha beta"))
              .otherwise(concat(lit("beta gamma zz"), $"rn0")).as("text"))
        FastText.predictTop(in, "doc_id", "text", model)
          .select($"id", $"label", round($"prob", 6).as("prob"))
          .orderBy($"id")
      }),

    // ------------------------------------ fastText negative-sampling loss
    // The last loss mode: an ns-trained classifier predicts through the
    // SAME per-row sigmoid as ova (loss.cc's NegativeSamplingLoss
    // inherits BinaryLogisticLoss::predict). Same planted scores as
    // q173, independent sigmoid probabilities instead of the softmax.
    Q("q195_fasttext_ns", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 200),
           c AS (SELECT o_orderkey AS id, rn0 % 3 AS v FROM o),
           s AS (SELECT id,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (1.0 + 0.5) / 2
                     WHEN 1 THEN (1.0 + 2.0 + 0.5) / 3
                     ELSE (2.0 - 1.0 + 0.5) / 3 END AS sg,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (0.25 - 0.125) / 2
                     WHEN 1 THEN (0.25 - 0.25 - 0.125) / 3
                     ELSE (-0.25 + 2.5 - 0.125) / 3 END AS sb
                 FROM c)
      SELECT id,
             CASE WHEN sg >= sb THEN 'good' ELSE 'bad' END AS label,
             round(CASE WHEN sg >= sb THEN 1 / (1 + exp(-sg))
                        ELSE 1 / (1 + exp(-sb)) END, 6) AS prob
      FROM s ORDER BY id"""))(
      (s, d) => {
        import graft.functions.FastText
        val binPath = Fixtures.path("q195", d, "ns.bin") { p =>
          def e(i: Int): Array[Float] = {
            val a = new Array[Float](4); a(i) = 1.0f; a
          }
          val m = FastText.Model(dim = 4, minn = 0, maxn = 0, bucket = 0,
            wordNgrams = 1, loss = "ns",
            words = Map("alpha" -> 0, "beta" -> 1, "gamma" -> 2, "</s>" -> 3),
            labels = Array("good", "bad"),
            input = Array.tabulate(4)(e),
            output = Array(
              Array(1.0f, 2.0f, -1.0f, 0.5f),
              Array(0.25f, -0.25f, 2.5f, -0.125f)))
          FastText.write(p, m, s.sparkContext.hadoopConfiguration)
        }
        val model = FastText.load(binPath, s.sparkContext.hadoopConfiguration)
        val in = orderedKeys(s, d, 200)
          .select($"doc_id",
            when($"rn0" % 3 === 0, lit("alpha"))
              .when($"rn0" % 3 === 1, lit("alpha beta"))
              .otherwise(concat(lit("beta gamma zz"), $"rn0")).as("text"))
        FastText.predictTop(in, "doc_id", "text", model)
          .select($"id", $"label", round($"prob", 6).as("prob"))
          .orderBy($"id")
      }),

    // ------------------------------------ fastText hierarchical softmax
    // The hs loss: a Huffman tree built from the planted label counts
    // (5,3,2 → internal node 0 splits c|b, root splits (that)|a), leaf
    // probability = the root-to-leaf sigmoid product. Identity word
    // vectors make every internal-node score a closed form the oracle
    // recomputes — a tree-shape slip, a left/right slip, or a sigmoid
    // slip breaks label and probability alike.
    Q("q182_fasttext_hs", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 200),
           c AS (SELECT o_orderkey AS id, rn0 % 3 AS v FROM o),
           s AS (SELECT id,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (1.0 + 0.5) / 2
                     WHEN 1 THEN (1.0 + 2.0 + 0.5) / 3
                     ELSE (2.0 - 1.0 + 0.5) / 3 END AS r0,
                   CASE CAST(v AS INTEGER)
                     WHEN 0 THEN (-2.0 + 0.5) / 2
                     WHEN 1 THEN (-2.0 + 1.0 + 0.5) / 3
                     ELSE (1.0 - 1.5 + 0.5) / 3 END AS r1
                 FROM c),
           p AS (SELECT id,
                   1 / (1 + exp(-r1)) AS pa,
                   (1 - 1 / (1 + exp(-r1))) * (1 / (1 + exp(-r0))) AS pb,
                   (1 - 1 / (1 + exp(-r1))) * (1 - 1 / (1 + exp(-r0))) AS pc
                 FROM s)
      SELECT id,
             CASE WHEN pa >= pb AND pa >= pc THEN 'a'
                  WHEN pb >= pc THEN 'b' ELSE 'c' END AS label,
             round(CASE WHEN pa >= pb AND pa >= pc THEN pa
                        WHEN pb >= pc THEN pb ELSE pc END, 6) AS prob
      FROM p ORDER BY id"""))(
      (s, d) => {
        import graft.functions.FastText
        val binPath = Fixtures.path("q182", d, "hs.bin") { p =>
          def e(i: Int): Array[Float] = {
            val a = new Array[Float](4); a(i) = 1.0f; a
          }
          val m = FastText.Model(dim = 4, minn = 0, maxn = 0, bucket = 0,
            wordNgrams = 1, loss = "hs",
            words = Map("alpha" -> 0, "beta" -> 1, "gamma" -> 2, "</s>" -> 3),
            labels = Array("a", "b", "c"),
            input = Array.tabulate(4)(e),
            output = Array(
              Array(1.0f, 2.0f, -1.0f, 0.5f),     // internal node 0 (c|b)
              Array(-2.0f, 1.0f, -1.5f, 0.5f),    // root (node0|a)
              new Array[Float](4)),               // unused leaf row
            labelCounts = Array(5L, 3L, 2L))
          FastText.write(p, m, s.sparkContext.hadoopConfiguration)
        }
        val model = FastText.load(binPath, s.sparkContext.hadoopConfiguration)
        val in = orderedKeys(s, d, 200)
          .select($"doc_id",
            when($"rn0" % 3 === 0, lit("alpha"))
              .when($"rn0" % 3 === 1, lit("alpha beta"))
              .otherwise(concat(lit("beta gamma zz"), $"rn0")).as("text"))
        FastText.predictTop(in, "doc_id", "text", model)
          .select($"id", $"label", round($"prob", 6).as("prob"))
          .orderBy($"id")
      }),

    // ----------------------------------------- Iceberg v2 positional deletes
    // Merge-on-read: a DELETE manifest names a parquet delete file of
    // (file_path, pos) rows — positions WITHIN each data file. Files are
    // written in id order, so the oracle recomputes every surviving row
    // from the per-bucket rank: bucket 0 loses every 5th row, bucket 1
    // loses its first. A row-position slip, a path-normalization slip, or
    // a dropped delete file breaks rows and hash alike.
    Q("q171_iceberg_pos_deletes", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150),
           b AS (SELECT o_orderkey AS id,
                        'doc-' || CAST(rn0 AS VARCHAR) AS text,
                        o_orderkey % 3 AS bucket,
                        row_number() OVER (PARTITION BY o_orderkey % 3
                                           ORDER BY o_orderkey) - 1 AS pos
                 FROM o)
      SELECT id, text FROM b
      WHERE NOT (bucket = 0 AND pos % 5 = 0)
        AND NOT (bucket = 1 AND pos = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable}
        val table = Fixtures.dir("q171", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def part(b: Int): (String, Int) = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i")
              }.toSeq, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("text",
                  org.apache.spark.sql.types.StringType))))
            (singleParquet(df, s"$dir/data/p$b.parquet"), ids.length)
          }
          val files = (0 to 2).map(part)
          // the delete file: bucket 0 positions 0,5,10,…; bucket 1 pos 0
          val delRows =
            (0 until files(0)._2 by 5).map(p => (files(0)._1, p.toLong)) :+
              ((files(1)._1, 0L))
          val delDf = s.createDataFrame(
            s.sparkContext.parallelize(delRows.map { case (p, i) =>
              org.apache.spark.sql.Row(p, i)
            }.toSeq, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("file_path",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("pos",
                org.apache.spark.sql.types.LongType))))
          val delPath = singleParquet(delDf, s"$dir/data/del0.parquet")
          new java.io.File(s"$dir/metadata").mkdirs()
          val mSchema =
            """{"type": "record", "name": "manifest_entry", "fields": [
                 {"name": "status", "type": "int"},
                 {"name": "data_file", "type": {"type": "record",
                   "name": "r2", "fields": [
                     {"name": "content", "type": "int"},
                     {"name": "file_path", "type": "string"},
                     {"name": "file_format", "type": "string"},
                     {"name": "record_count", "type": "long"}]}}]}"""
          AvroOcf.write(s"$dir/metadata/m0.avro", mSchema,
            files.map(f => Seq(1, Seq(0, f._1, "PARQUET", f._2.toLong))))
          AvroOcf.write(s"$dir/metadata/md.avro", mSchema, Seq(
            Seq(1, Seq(1, delPath, "PARQUET", delRows.length.toLong))))
          AvroOcf.write(s"$dir/metadata/snap-300.avro",
            """{"type": "record", "name": "manifest_file", "fields": [
                 {"name": "manifest_path", "type": "string"},
                 {"name": "manifest_length", "type": "long"},
                 {"name": "content", "type": "int"}]}""",
            Seq(Seq(s"$dir/metadata/m0.avro", 100L, 0),
              Seq(s"$dir/metadata/md.avro", 100L, 1)))
          val schemaJson =
            """{"type": "struct", "schema-id": 0, "fields": [
                 {"id": 1, "name": "id", "required": true, "type": "long"},
                 {"id": 2, "name": "text", "required": false, "type": "string"}]}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
            s"""{"format-version": 2, "table-uuid": "q171", "location": "$dir",
                 "current-snapshot-id": 300,
                 "schemas": [$schemaJson], "current-schema-id": 0,
                 "snapshots": [{"snapshot-id": 300, "timestamp-ms": 0,
                   "summary": {"operation": "delete"},
                   "manifest-list": "$dir/metadata/snap-300.avro"}]}"""
              .getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
            "1".getBytes("UTF-8"))
        }
        IcebergTable.read(s, table).select($"id", $"text").orderBy($"id")
      }),

    // ---------------------------------------- Iceberg v3: Puffin deletion vectors
    // The 2025-adopted format: positional-delete parquet is replaced by
    // deletion-vector blobs inside a Puffin container, located by the
    // manifest's (referenced_data_file, content_offset,
    // content_size_in_bytes) fields. Same planted deletes as q171 —
    // bucket 0 loses every 5th row, bucket 1 its first — but served
    // through the Puffin framing + roaring decode + row_index anti-join.
    Q("q177_iceberg_v3_dv", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150),
           b AS (SELECT o_orderkey AS id,
                        'doc-' || CAST(rn0 AS VARCHAR) AS text,
                        o_orderkey % 3 AS bucket,
                        row_number() OVER (PARTITION BY o_orderkey % 3
                                           ORDER BY o_orderkey) - 1 AS pos
                 FROM o)
      SELECT id, text FROM b
      WHERE NOT (bucket = 0 AND pos % 5 = 0)
        AND NOT (bucket = 1 AND pos = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable, Puffin}
        val table = Fixtures.dir("q177", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          def part(b: Int): (String, Int) = {
            val ids = rows.filter(_._1 % 3 == b)
            val df = s.createDataFrame(
              s.sparkContext.parallelize(ids.map { case (k, i) =>
                org.apache.spark.sql.Row(k, s"doc-$i")
              }.toSeq, 1),
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("text",
                  org.apache.spark.sql.types.StringType))))
            (singleParquet(df, s"$dir/data/p$b.parquet"), ids.length)
          }
          val files = (0 to 2).map(part)
          new java.io.File(s"$dir/metadata").mkdirs()
          // one puffin file, two DV blobs (bucket 0: 0,5,10,…; bucket 1: 0)
          val dv0 = (0 until files(0)._2 by 5).map(_.toLong).toArray
          val puffin = s"$dir/metadata/dv-1.puffin"
          val conf = s.sparkContext.hadoopConfiguration
          val placed = Puffin.writeFile(puffin, Seq(
            Puffin.Blob("deletion-vector-v1", Seq(2147483546), 1L, 1L,
              Map("referenced-data-file" -> files(0)._1,
                "cardinality" -> dv0.length.toString), Puffin.dvBlob(dv0)),
            Puffin.Blob("deletion-vector-v1", Seq(2147483546), 1L, 1L,
              Map("referenced-data-file" -> files(1)._1,
                "cardinality" -> "1"), Puffin.dvBlob(Array(0L)))),
            Map.empty, conf)
          val mSchema =
            """{"type": "record", "name": "manifest_entry", "fields": [
                 {"name": "status", "type": "int"},
                 {"name": "sequence_number",
                  "type": ["null", "long"], "default": null},
                 {"name": "data_file", "type": {"type": "record",
                   "name": "r2", "fields": [
                     {"name": "content", "type": "int"},
                     {"name": "file_path", "type": "string"},
                     {"name": "file_format", "type": "string"},
                     {"name": "record_count", "type": "long"},
                     {"name": "referenced_data_file",
                      "type": ["null", "string"], "default": null},
                     {"name": "content_offset",
                      "type": ["null", "long"], "default": null},
                     {"name": "content_size_in_bytes",
                      "type": ["null", "long"], "default": null}]}}]}"""
          AvroOcf.write(s"$dir/metadata/m0.avro", mSchema,
            files.map(f => Seq(1, null,
              Seq(0, f._1, "PARQUET", f._2.toLong, null, null, null))))
          AvroOcf.write(s"$dir/metadata/md.avro", mSchema, Seq(
            Seq(1, null, Seq(1, puffin, "PUFFIN", dv0.length.toLong,
              files(0)._1, placed(0)._1, placed(0)._2)),
            Seq(1, null, Seq(1, puffin, "PUFFIN", 1L,
              files(1)._1, placed(1)._1, placed(1)._2))))
          AvroOcf.write(s"$dir/metadata/snap-500.avro",
            """{"type": "record", "name": "manifest_file", "fields": [
                 {"name": "manifest_path", "type": "string"},
                 {"name": "manifest_length", "type": "long"},
                 {"name": "content", "type": "int"},
                 {"name": "sequence_number", "type": "long"}]}""",
            Seq(Seq(s"$dir/metadata/m0.avro", 100L, 0, 1L),
              Seq(s"$dir/metadata/md.avro", 100L, 1, 1L)))
          val schemaJson =
            """{"type": "struct", "schema-id": 0, "fields": [
                 {"id": 1, "name": "id", "required": true, "type": "long"},
                 {"id": 2, "name": "text", "required": false, "type": "string"}]}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/v1.metadata.json"),
            s"""{"format-version": 3, "table-uuid": "q177", "location": "$dir",
                 "current-snapshot-id": 500, "next-row-id": 150,
                 "schemas": [$schemaJson], "current-schema-id": 0,
                 "snapshots": [{"snapshot-id": 500, "timestamp-ms": 0,
                   "summary": {"operation": "delete"},
                   "manifest-list": "$dir/metadata/snap-500.avro"}]}"""
              .getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
            "1".getBytes("UTF-8"))
        }
        IcebergTable.read(s, table).select($"id", $"text").orderBy($"id")
      }),

    // ------------------------------------------ Iceberg row-level changelog
    // readChangelog between two snapshots: snapshot 2 appends a re-insert
    // file (ids % 5 = 0, new text) AND a positional delete killing every
    // 3rd position of the original file. The feed must serve exactly the
    // net inserts + newly-dead rows; the oracle rebuilds it from the
    // planted patterns. A diff slip (re-served file, missed delete,
    // resurrected row) breaks rows and hash alike.
    Q("q179_iceberg_changelog", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 150),
           feed AS (
             SELECT o_orderkey AS id, 're-' || CAST(rn0 AS VARCHAR) AS text,
                    'insert' AS ct FROM o WHERE o_orderkey % 5 = 0
             UNION ALL
             SELECT o_orderkey, 'doc-' || CAST(rn0 AS VARCHAR), 'delete'
             FROM o WHERE rn0 % 3 = 0)
      SELECT id, text, ct AS _change_type, CAST(200 AS BIGINT) AS _snapshot_id
      FROM feed ORDER BY _change_type, id, text"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable}
        val table = Fixtures.dir("q179", d) { dir =>
          val rows = Tables.orders(s, d).orderBy($"o_orderkey").limit(150)
            .select($"o_orderkey".cast("long")).collect().map(_.getLong(0))
            .zipWithIndex
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))
          def file(name: String, data: Seq[(Long, String)]): String = {
            val df = s.createDataFrame(
              s.sparkContext.parallelize(data.map { case (k, t) =>
                org.apache.spark.sql.Row(k, t)
              }, 1), schema)
            singleParquet(df, s"$dir/data/$name")
          }
          val f0 = file("p0.parquet",
            rows.map { case (k, i) => (k, s"doc-$i") }.toSeq)
          val f1 = file("p1.parquet",
            rows.filter(_._1 % 5 == 0)
              .map { case (k, i) => (k, s"re-$i") }.toSeq)
          // positional delete: every 3rd position of f0
          val delRows = rows.indices.filter(_ % 3 == 0)
            .map(p => (f0, p.toLong))
          val delDf = s.createDataFrame(
            s.sparkContext.parallelize(delRows.map { case (p, i) =>
              org.apache.spark.sql.Row(p, i)
            }, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("file_path",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("pos",
                org.apache.spark.sql.types.LongType))))
          val delPath = singleParquet(delDf, s"$dir/data/del0.parquet")
          new java.io.File(s"$dir/metadata").mkdirs()
          val mSchema =
            """{"type": "record", "name": "manifest_entry", "fields": [
                 {"name": "status", "type": "int"},
                 {"name": "data_file", "type": {"type": "record",
                   "name": "r2", "fields": [
                     {"name": "content", "type": "int"},
                     {"name": "file_path", "type": "string"},
                     {"name": "file_format", "type": "string"},
                     {"name": "record_count", "type": "long"}]}}]}"""
          val mlSchema =
            """{"type": "record", "name": "manifest_file", "fields": [
                 {"name": "manifest_path", "type": "string"},
                 {"name": "manifest_length", "type": "long"},
                 {"name": "content", "type": "int"}]}"""
          AvroOcf.write(s"$dir/metadata/m0.avro", mSchema, Seq(
            Seq(1, Seq(0, f0, "PARQUET", 150L))))
          AvroOcf.write(s"$dir/metadata/m1.avro", mSchema, Seq(
            Seq(0, Seq(0, f0, "PARQUET", 150L)),
            Seq(1, Seq(0, f1, "PARQUET", 30L))))
          AvroOcf.write(s"$dir/metadata/md.avro", mSchema, Seq(
            Seq(1, Seq(1, delPath, "PARQUET", delRows.length.toLong))))
          AvroOcf.write(s"$dir/metadata/snap-100.avro", mlSchema,
            Seq(Seq(s"$dir/metadata/m0.avro", 100L, 0)))
          AvroOcf.write(s"$dir/metadata/snap-200.avro", mlSchema,
            Seq(Seq(s"$dir/metadata/m1.avro", 100L, 0),
              Seq(s"$dir/metadata/md.avro", 100L, 1)))
          val schemaJson =
            """{"type": "struct", "schema-id": 0, "fields": [
                 {"id": 1, "name": "id", "required": true, "type": "long"},
                 {"id": 2, "name": "text", "required": false, "type": "string"}]}"""
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/v2.metadata.json"),
            s"""{"format-version": 2, "table-uuid": "q179", "location": "$dir",
                 "current-snapshot-id": 200,
                 "schemas": [$schemaJson], "current-schema-id": 0,
                 "snapshots": [
                   {"snapshot-id": 100, "timestamp-ms": 1000,
                    "summary": {"operation": "append"},
                    "manifest-list": "$dir/metadata/snap-100.avro"},
                   {"snapshot-id": 200, "timestamp-ms": 2000,
                    "summary": {"operation": "overwrite"},
                    "manifest-list": "$dir/metadata/snap-200.avro"}]}"""
              .getBytes("UTF-8"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/metadata/version-hint.text"),
            "2".getBytes("UTF-8"))
        }
        IcebergTable.readChangelog(s, table, 100L, Some(200L))
          .select($"id", $"text", $"_change_type", $"_snapshot_id")
          .orderBy($"_change_type", $"id", $"text")
      }),

    // ----------------------------------------- Delta writer: publish half
    // The table is WRITTEN by this engine's own transactional writer
    // (create partitioned by bucket, then a second append commit) and
    // read back through the reader — log layout, partition dirs, add
    // actions, and version numbering all round-trip. The oracle
    // recomputes both batches from the planted patterns.
    Q("q180_delta_write", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q180", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t, partitionBy = Seq("bucket"))
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // -------------------------------- Delta checkpoint writer + vacuumed log
    // The log-compaction cycle end-to-end: two writer commits, a classic
    // checkpoint written by the engine, BOTH commit jsons vacuumed (the
    // checkpoint alone must reconstruct the snapshot), then a third
    // commit past the checkpoint. The oracle recomputes all three
    // batches; a checkpoint-content slip, a vacuumed-log replay slip, or
    // a version-numbering slip loses a batch.
    Q("q183_delta_checkpoint", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  WHEN o_orderkey % 4 = 1 THEN 'v3-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q183", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 >= 2)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t, partitionBy = Seq("bucket"))
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")), t)
          DeltaWriter.writeCheckpoint(s, t)
          // vacuum: every commit json below-or-at the checkpoint goes
          val fs = new org.apache.hadoop.fs.Path(t)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          Seq(0L, 1L).foreach { v =>
            fs.delete(new org.apache.hadoop.fs.Path(
              f"$t/_delta_log/$v%020d.json"), false)
          }
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 === 1)
              .select($"id", concat(lit("v3-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")), t)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // --------------------------------------- Iceberg writer: publish half
    // Two append snapshots written by the engine's own writer (manifest,
    // manifest list carrying the prior snapshot's manifests, metadata
    // json + version-hint swap), read back through the reader.
    Q("q181_iceberg_write", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q181", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text")), t)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ------------------------------- Delta writer: DV-based row deletes
    // The modern DELETE end-to-end: the gate writes the table, then two
    // writeDelete commits kill rows by DELETION VECTOR (no data file
    // rewritten — the second delete unions into the first's bitmaps),
    // and the reader serves the survivors. The oracle recomputes both
    // delete predicates.
    Q("q185_delta_dv_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 7 <> 0 AND rn0 % 11 <> 3
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q185", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          DeltaWriter.writeDelete(s, t, $"id" % 7 === 0)
          DeltaWriter.writeDelete(s, t, $"rn0" % 11 === 3)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ---------------------------- Iceberg writer: positional row deletes
    // The merge-on-read DELETE lifecycle through the gate: the writer
    // appends, two writeDelete snapshots emit positional-delete files
    // (rows located distributed, no data file rewritten), the reader
    // serves the survivors. Same planted predicates as the Delta DV
    // twin q185 — the two formats' delete paths cross-validate through
    // one oracle shape.
    Q("q186_iceberg_pos_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 7 <> 0 AND rn0 % 11 <> 3
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q186", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          IcebergWriter.writeDelete(s, t, $"id" % 7 === 0)
          IcebergWriter.writeDelete(s, t, $"rn0" % 11 === 3)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------------- Iceberg writer: identity-partitioned table
    // Partitioned publish + manifest-level pruning end-to-end: two append
    // commits partitioned by bucket (the spec INHERITED on the second),
    // then readPartitions serves exactly one bucket — files of the other
    // buckets are never touched (file-level pruning before any footer).
    // The oracle recomputes the bucket's rows from both batches.
    Q("q184_iceberg_part_write", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS bucket
      FROM o WHERE o_orderkey % 3 = 1 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q184", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t, partitionBy = Seq("bucket"))
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")), t)
        }
        IcebergTable.readPartitions(s, s"$table/table", Map("bucket" -> "1"))
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // --------------------------------- Delta writer: row-level UPDATE
    // The upsert half of the lifecycle: matched rows are DV-killed and
    // their updated images appended in ONE commit. Two stacked updates —
    // the second touches rows the first already rewrote (files the first
    // update created get DVs of their own). The oracle recomputes the
    // final state; update order matters (upd2 overrides upd).
    Q("q187_delta_update", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 % 7 = 2 THEN 'upd2-' || CAST(rn0 AS VARCHAR)
                  WHEN o_orderkey % 5 = 0 THEN 'upd-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q187", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          DeltaWriter.writeUpdate(s, t, $"id" % 5 === 0,
            Map("text" -> concat(lit("upd-"), $"rn0")))
          DeltaWriter.writeUpdate(s, t, $"rn0" % 7 === 2,
            Map("text" -> concat(lit("upd2-"), $"rn0")))
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ------------------------------- Iceberg writer: row-level UPDATE
    // The merge-on-read UPDATE twin: positional-delete kill + rewritten
    // images in ONE overwrite snapshot. Same planted derivation as q187 —
    // the two formats' update paths cross-validate through one oracle.
    Q("q188_iceberg_update", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 % 7 = 2 THEN 'upd2-' || CAST(rn0 AS VARCHAR)
                  WHEN o_orderkey % 5 = 0 THEN 'upd-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q188", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          IcebergWriter.writeUpdate(s, t, $"id" % 5 === 0,
            Map("text" -> concat(lit("upd-"), $"rn0")))
          IcebergWriter.writeUpdate(s, t, $"rn0" % 7 === 2,
            Map("text" -> concat(lit("upd2-"), $"rn0")))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ------------------------ Delta UPDATE through the change data feed
    // The row-level CDC contract end-to-end: a table CREATED with
    // delta.enableChangeDataFeed, one update commit, and readCdf serves
    // the update as update_preimage/update_postimage pairs (never the
    // delete+insert double-report a two-commit delete+append would
    // produce). The oracle recomputes both images.
    Q("q189_delta_update_cdf", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           m AS (SELECT * FROM o WHERE o_orderkey % 5 = 0)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             'update_preimage' AS change_type,
             CAST(1 AS BIGINT) AS version
      FROM m
      UNION ALL
      SELECT o_orderkey AS id, 'upd-' || CAST(rn0 AS VARCHAR) AS text,
             'update_postimage' AS change_type,
             CAST(1 AS BIGINT) AS version
      FROM m
      ORDER BY id, change_type"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q189", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t,
            properties = Map("delta.enableChangeDataFeed" -> "true"))
          DeltaWriter.writeUpdate(s, t, $"id" % 5 === 0,
            Map("text" -> concat(lit("upd-"), $"rn0")))
        }
        DeltaTable.readCdf(s, s"$table/table", 1L)
          .select($"id", $"text", $"_change_type".as("change_type"),
            $"_commit_version".as("version"))
          .orderBy($"id", $"change_type")
      }),

    // ---------------- Iceberg: row-level DELETE on a PARTITIONED table
    // The q184×q186 composition: the gate writes an identity-partitioned
    // table (two appends, spec inherited), then writeDelete kills rows of
    // ONE bucket — delete files are partition-scoped (one per touched
    // tuple, manifest partition structs), no data file rewritten, and the
    // other buckets' files stay byte-identical (spec-asserted). The
    // oracle recomputes the survivors across the whole table.
    Q("q190_iceberg_part_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS bucket
      FROM o WHERE NOT (o_orderkey % 3 = 1 AND o_orderkey % 7 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q190", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t, partitionBy = Seq("bucket"))
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")), t)
          IcebergWriter.writeDelete(s, t,
            $"bucket" === 1 && $"id" % 7 === 0)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // ------------------- Delta: copy-on-write DELETE above the DV cap
    // The data-scale delete shape: auto mode crosses a lowered
    // maxDeletedRows and switches to the distributed rewrite — touched
    // files' survivors rewritten, remove+add in one commit, no deletion
    // vector and no driver-side positions. A trailing DV delete stacks on
    // the rewritten files (the two shapes compose). The oracle recomputes
    // the survivors of both predicates.
    Q("q191_delta_rewrite_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 2 <> 0 AND rn0 % 11 <> 3
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q191", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          // ~60 matches > the lowered cap: auto takes the rewrite shape
          DeltaWriter.writeDelete(s, t, $"id" % 2 === 0,
            maxDeletedRows = 5L)
          // a small DV delete stacks on the rewritten files
          DeltaWriter.writeDelete(s, t, $"rn0" % 11 === 3)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------------- Delta: additive schema evolution on append
    // The most common real-world append variant: a second batch carries a
    // new nullable trailing column, mergeSchema=true updates the metaData
    // in the same commit, and the pre-evolution files read the column as
    // NULL. The oracle recomputes both batches with the null fill.
    Q("q192_delta_schema_evolution", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             CASE WHEN o_orderkey % 4 = 0 THEN round(rn0 * 0.5, 6)
                  ELSE NULL END AS score
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q192", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          DeltaWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                round($"rn0" * 0.5, 6).as("score")),
            t, mergeSchema = true)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text", round($"score", 6).as("score"))
          .orderBy($"id")
      }),

    // ------------------------- Iceberg: additive schema evolution on append
    // The Iceberg twin of q192: the evolving append APPENDS a schema to
    // the schemas list (new field ids continue from last-column-id,
    // schema-id bumped), older files read the new column as null. Same
    // planted derivation — the two formats cross-validate.
    Q("q193_iceberg_schema_evolution", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             CASE WHEN o_orderkey % 4 = 0 THEN round(rn0 * 0.5, 6)
                  ELSE NULL END AS score
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q193", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                round($"rn0" * 0.5, 6).as("score")),
            t, mergeSchema = true)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", round($"score", 6).as("score"))
          .orderBy($"id")
      }),

    // ------------------------------------- Delta MERGE (upsert) in one commit
    // The bread-and-butter "merge this batch into the table": source rows
    // with matching keys REPLACE the target rows (DV kill + new images),
    // the rest insert — one commit, never a delete+append pair. The
    // oracle recomputes the post-merge state from both planted batches.
    Q("q196_delta_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q196", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"), $"rn0")
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"), $"rn0")
          DeltaWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------------------- Iceberg MERGE: one overwrite snapshot
    // The merge-on-read twin of q196: positional-delete kill of matched
    // keys + all source rows appended, in one overwrite snapshot.
    Q("q197_iceberg_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q197", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"), $"rn0")
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"), $"rn0")
          IcebergWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ---------------------- Delta MERGE through the change data feed
    // The MERGE cdc contract: matched keys serve update_preimage/
    // update_postimage pairs, new keys serve insert rows — all from ONE
    // commit's cdc files, never a double-reported delete+insert.
    Q("q198_delta_merge_cdf", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           m AS (SELECT * FROM o WHERE o_orderkey % 6 = 0)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
               'update_preimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey AS id, 'm-' || CAST(rn0 AS VARCHAR) AS text,
               'update_postimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text,
               'insert' AS change_type
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id, change_type"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q198", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t,
            properties = Map("delta.enableChangeDataFeed" -> "true"))
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"), $"rn0")
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"), $"rn0")
          DeltaWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        DeltaTable.readCdf(s, s"$table/table", 1L)
          .select($"id", $"text", $"_change_type".as("change_type"))
          .orderBy($"id", $"change_type")
      }),

    // ----------------------- Iceberg v3: self-written table, Puffin DVs
    // The q177 twin over a table the gate itself wrote: create at
    // format-version 3 (next-row-id/first-row-id lineage bookkeeping),
    // two append snapshots, then two DV deletes (disjoint file sets) —
    // each emits deletion-vector-v1 blobs in a Puffin container that the
    // reader decodes through the same framing as Delta's. The oracle
    // recomputes the survivors of both predicates.
    Q("q194_iceberg_v3_write", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
      FROM o
      WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 4 <> 0)
        AND NOT (o_orderkey % 4 = 0 AND rn0 % 11 = 3)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q194", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                $"rn0"),
            t, formatVersion = 3)
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                $"rn0"), t)
          IcebergWriter.writeDelete(s, t,
            $"id" % 7 === 0 && $"id" % 4 =!= 0)
          IcebergWriter.writeDelete(s, t,
            $"id" % 4 === 0 && $"rn0" % 11 === 3)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------- Delta OPTIMIZE: compaction repays the DV debt
    // The maintenance half of the lifecycle: a DV delete leaves bitmap
    // debt on every touched file; compact() rewrites the survivors into
    // fewer files in one dataChange=false commit — the row set is
    // unchanged (the oracle recomputes it), change consumers skip the
    // commit, and the vectors disappear (spec-asserted).
    Q("q199_delta_optimize", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 7 <> 0 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q199", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          DeltaWriter.writeDelete(s, t, $"id" % 7 === 0)
          DeltaWriter.compact(s, t)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------------- Delta VACUUM after a rewrite delete
    // The physical-cleanup half: a copy-on-write delete retires every
    // touched file by tombstone; vacuum(retention 0) deletes them from
    // disk, and the snapshot still serves exactly the survivors (the
    // oracle recomputes them) — state and storage decouple correctly.
    Q("q200_delta_vacuum", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE o_orderkey % 2 <> 0 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q200", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0"), t)
          DeltaWriter.writeDelete(s, t, $"id" % 2 === 0, mode = "rewrite")
          DeltaWriter.vacuum(s, t, retentionMs = 0L)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ------------- Iceberg rewriteDataFiles + expireSnapshots composition
    // The full maintenance cycle over a PARTITIONED table the gate wrote:
    // two appends, a partition-scoped delete, a full compaction (ONE
    // replace snapshot baking the delete into the data — the
    // merge-on-read tax disappears), then snapshot expiration down to
    // the compacted state. The oracle recomputes the survivors.
    Q("q201_iceberg_rewrite", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 4 = 0 THEN 'v2-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS bucket
      FROM o WHERE NOT (o_orderkey % 3 = 1 AND o_orderkey % 7 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q201", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 =!= 0)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")),
            t, partitionBy = Seq("bucket"))
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 4 === 0)
              .select($"id", concat(lit("v2-"), $"rn0").as("text"),
                ($"id" % 3).as("bucket")), t)
          IcebergWriter.writeDelete(s, t,
            $"bucket" === 1 && $"id" % 7 === 0)
          IcebergWriter.rewriteDataFiles(s, t)
          IcebergWriter.expireSnapshots(s, t, keepLast = 1)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // ------------------------------- Delta data skipping (stats pruning)
    // The scan-planning half of the format: four range-disjoint appends
    // (one file each), then a readWhere whose add.stats bounds prove two
    // of the four files empty — `n_files` carries the PHYSICALLY SCANNED
    // file count into the oracle, so a pruning regression (4 files) or
    // an over-prune (wrong rows) both break the hash. The oracle
    // recomputes the surviving rows and pins n_files = 2.
    Q("q202_delta_skipping", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 160)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             2 AS n_files
      FROM o WHERE rn0 >= 40 AND rn0 < 120 ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q202", d) { dir =>
          val base = orderedKeys(s, d, 160)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          for (k <- 0 until 4)
            DeltaWriter.writeAppend(s,
              base.filter($"rn0" >= k * 40 && $"rn0" < (k + 1) * 40)
                .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                  $"rn0")
                .coalesce(1), t)
        }
        val pruned = DeltaTable.readWhere(s, s"$table/table",
          Seq(GreaterThanOrEqual("rn0", 40L), LessThan("rn0", 120L)))
        pruned.select($"id", $"text",
            lit(pruned.inputFiles.length).as("n_files"))
          .orderBy($"id")
      }),

    // ----------------------------- Iceberg data skipping (manifest bounds)
    // The twin through Iceberg scan planning: manifest entries carry
    // lower/upper bounds (Appendix D), readWhere prunes by them. Same
    // planted ranges and the same n_files = 2 pin as q202 — the two
    // formats' skipping paths cross-validate through one oracle shape.
    Q("q203_iceberg_skipping", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 160)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             2 AS n_files
      FROM o WHERE rn0 >= 40 AND rn0 < 120 ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q203", d) { dir =>
          val base = orderedKeys(s, d, 160)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          for (k <- 0 until 4)
            IcebergWriter.writeAppend(s,
              base.filter($"rn0" >= k * 40 && $"rn0" < (k + 1) * 40)
                .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                  $"rn0")
                .coalesce(1), t)
        }
        val pruned = IcebergTable.readWhere(s, s"$table/table",
          Seq(GreaterThanOrEqual("rn0", 40L), LessThan("rn0", 120L)))
        pruned.select($"id", $"text",
            lit(pruned.inputFiles.length).as("n_files"))
          .orderBy($"id")
      }),

    // --------------------------------------- Delta OPTIMIZE ZORDER BY
    // Multi-dimensional clustering: four appends sliced by `a` leave
    // every file spanning all of `b` (nothing prunes on b); the ZORDER
    // rewrite interleaves the two ranks, after which a b-predicate
    // readWhere scans a strict subset. `pruned` carries that
    // file-subset fact into the oracle (pinned true), and the rows pin
    // that the clustering rewrite changed LAYOUT only.
    Q("q204_delta_zorder", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 640)
      SELECT o_orderkey AS id, rn0 % 16 AS a, rn0 // 16 AS b,
             'doc-' || CAST(rn0 AS VARCHAR) AS text, TRUE AS pruned
      FROM o WHERE rn0 // 16 >= 20 ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.sources.GreaterThanOrEqual
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q204", d) { dir =>
          val base = orderedKeys(s, d, 640)
            .select($"doc_id".as("id"), ($"rn0" % 16).as("a"),
              ($"rn0" / 16).cast("long").as("b"),
              concat(lit("doc-"), $"rn0").as("text"))
          val t = s"$dir/table"
          for (k <- 0 until 4)
            DeltaWriter.writeAppend(s,
              base.filter($"a" >= k * 4 && $"a" < (k + 1) * 4)
                .coalesce(1), t)
          DeltaWriter.compact(s, t, targetFileBytes = 2L << 10,
            zorderBy = Seq("a", "b"))
        }
        val full = DeltaTable.read(s, s"$table/table")
        val pruned = DeltaTable.readWhere(s, s"$table/table",
          Seq(GreaterThanOrEqual("b", 20L)))
        pruned.select($"id", $"a", $"b", $"text",
            lit(pruned.inputFiles.length < full.inputFiles.length)
              .as("pruned"))
          .orderBy($"id")
      }),

    // ------------------------------- Iceberg rewriteDataFiles ZORDER
    // The twin through Iceberg's maintenance action: same grid, same
    // b-predicate, manifest bounds instead of add.stats — the two
    // formats' clustering paths cross-validate through one oracle shape.
    Q("q205_iceberg_zorder", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 640)
      SELECT o_orderkey AS id, rn0 % 16 AS a, rn0 // 16 AS b,
             'doc-' || CAST(rn0 AS VARCHAR) AS text, TRUE AS pruned
      FROM o WHERE rn0 // 16 >= 20 ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.sources.GreaterThanOrEqual
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q205", d) { dir =>
          val base = orderedKeys(s, d, 640)
            .select($"doc_id".as("id"), ($"rn0" % 16).as("a"),
              ($"rn0" / 16).cast("long").as("b"),
              concat(lit("doc-"), $"rn0").as("text"))
          val t = s"$dir/table"
          for (k <- 0 until 4)
            IcebergWriter.writeAppend(s,
              base.filter($"a" >= k * 4 && $"a" < (k + 1) * 4)
                .coalesce(1), t)
          IcebergWriter.rewriteDataFiles(s, t,
            targetFileBytes = 2L << 10, zorderBy = Seq("a", "b"))
        }
        val full = IcebergTable.read(s, s"$table/table")
        val pruned = IcebergTable.readWhere(s, s"$table/table",
          Seq(GreaterThanOrEqual("b", 20L)))
        pruned.select($"id", $"a", $"b", $"text",
            lit(pruned.inputFiles.length < full.inputFiles.length)
              .as("pruned"))
          .orderBy($"id")
      }),

    // ------------------------------- time travel by TIMESTAMP, Delta
    // Two commits with a wall-clock point captured between them (stored
    // in the fixture); readAsOf resolves the timestamp to version 0 and
    // must serve ONLY the first batch — the oracle recomputes it.
    Q("q206_delta_time_travel", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE rn0 < 60 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q206", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"),
              concat(lit("doc-"), $"rn0").as("text"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s, base.filter($"rn0" < 60), t)
          Thread.sleep(20)
          val between = System.currentTimeMillis()
          Thread.sleep(20)
          DeltaWriter.writeAppend(s, base.filter($"rn0" >= 60), t)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/ts.txt"),
            between.toString.getBytes)
        }
        val ts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/ts.txt"))).trim.toLong
        DeltaTable.readAsOf(s, s"$table/table", ts)
          .select($"id", $"text").orderBy($"id")
      }),

    // ------------------------------- time travel by TIMESTAMP, Iceberg
    // The twin through the snapshots' spec-required timestamp-ms.
    Q("q207_iceberg_time_travel", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o WHERE rn0 < 60 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q207", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"),
              concat(lit("doc-"), $"rn0").as("text"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s, base.filter($"rn0" < 60), t)
          Thread.sleep(20)
          val between = System.currentTimeMillis()
          Thread.sleep(20)
          IcebergWriter.writeAppend(s, base.filter($"rn0" >= 60), t)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/ts.txt"),
            between.toString.getBytes)
        }
        val ts = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/ts.txt"))).trim.toLong
        IcebergTable.readAsOf(s, s"$table/table", ts)
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------------------- Iceberg bucket[N] partition transform
    // Hidden partitioning through the spec's murmur3 bucket transform:
    // CREATE with bucket(4, id), a second append INHERITS the spec, and
    // the table reads back as the UNION of the four per-bucket
    // partition-pruned reads — every row must land in exactly one
    // readable bucket, or the union loses/duplicates it against the
    // oracle. (The hash itself is pinned to the spec's Appendix B test
    // vectors in TableWritersSpec.)
    Q("q208_iceberg_bucket", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q208", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"),
              concat(lit("doc-"), $"rn0").as("text"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s, base.filter($"rn0" < 60), t,
            partitionBy = Seq("bucket(4, id)"))
          IcebergWriter.writeAppend(s, base.filter($"rn0" >= 60), t)
        }
        (0 until 4).map(b =>
          IcebergTable.readPartitions(s, s"$table/table",
            Map("id_bucket" -> b.toString)))
          .reduce(_ unionByName _)
          .select($"id", $"text").orderBy($"id")
      }),

    // -------------------------- Iceberg temporal partition transforms
    // month(d) hidden partitioning: the partition value is whole months
    // since the unix epoch — SQL-recomputable, so the oracle pins BOTH
    // the transform arithmetic and the partition-scoped read (the
    // earliest month's rows, and only them, come back).
    Q("q209_iceberg_month", Some("""
      WITH o AS (SELECT o_orderkey, o_orderdate
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           m AS (SELECT MIN((year(o_orderdate) - 1970) * 12 +
                            month(o_orderdate) - 1) AS mm FROM o)
      SELECT o_orderkey AS id, o_orderdate AS d
      FROM o WHERE (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1
        = (SELECT mm FROM m)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q209", d) { dir =>
          val base = Tables.orders(s, d).orderBy($"o_orderkey").limit(120)
            .select($"o_orderkey".cast("long").as("id"),
              $"o_orderdate".as("d"))
          IcebergWriter.writeAppend(s, base, s"$dir/table",
            partitionBy = Seq("month(d)"))
        }
        val target = IcebergTable.read(s, s"$table/table")
          .select((((year($"d") - 1970) * 12) + month($"d") - 1).as("m"))
          .agg(org.apache.spark.sql.functions.min($"m")).head().getInt(0)
        IcebergTable.readPartitions(s, s"$table/table",
          Map("d_month" -> target.toString))
          .select($"id", $"d").orderBy($"id")
      }),

    // -------------------- Iceberg MERGE on an identity-PARTITIONED table
    // The production upsert: merge a batch into a partitioned table —
    // partition-scoped kill files + partition-grouped source appends in
    // ONE overwrite snapshot. `untouched` pins that the untouched
    // partition's data-file set is BYTE-IDENTICAL after the merge (its
    // file list is recorded before the merge and compared after), so a
    // rewrite-where-none-was-needed breaks the hash, not just perf.
    Q("q210_iceberg_part_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
               o_orderkey % 3 AS b, TRUE AS untouched
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text,
               CAST(1 AS BIGINT) AS b, TRUE AS untouched
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q210", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          val untouched = IcebergTable.readPartitions(s, t, Map("b" -> "2"))
            .inputFiles.filter(_.contains("p__b=")).sorted
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/untouched.txt"),
            untouched.mkString("\n").getBytes("UTF-8"))
          // upd keys are all in partition 0 (id%6=0 => id%3=0); inserts
          // land in partition 1 — partition 2 must stay byte-identical
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"),
              ($"id" % 3).as("b"))
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"), lit(1L).as("b"))
          IcebergWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        val before = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/untouched.txt")), "UTF-8")
          .split("\n").toSeq.filter(_.nonEmpty)
        val now = IcebergTable.readPartitions(s, s"$table/table",
          Map("b" -> "2")).inputFiles.filter(_.contains("p__b="))
          .sorted.toSeq
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b",
            lit(before == now).as("untouched"))
          .orderBy($"id")
      }),

    // -------------------- Iceberg UPDATE on an identity-PARTITIONED table
    // Partition-scoped row-level update, including a PARTITION-COLUMN
    // update that moves rows across partitions (kill in the old
    // partition, image in the new). Same byte-identical pin on the
    // partition neither update touches.
    Q("q211_iceberg_part_update", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 3 = 1 THEN 'u-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             CASE WHEN o_orderkey % 12 = 4 THEN CAST(0 AS BIGINT)
                  ELSE o_orderkey % 3 END AS b,
             TRUE AS untouched
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q211", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0", ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          val untouched = IcebergTable.readPartitions(s, t, Map("b" -> "2"))
            .inputFiles.filter(_.contains("p__b=")).sorted
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/untouched.txt"),
            untouched.mkString("\n").getBytes("UTF-8"))
          // text update inside partition 1, then a partition MOVE of the
          // id%12=4 subset (still b=1 at that point) into partition 0 —
          // partition 2 untouched by both
          IcebergWriter.writeUpdate(s, t, $"b" === 1L,
            Map("text" -> concat(lit("u-"), $"rn0")))
          IcebergWriter.writeUpdate(s, t, $"b" === 1L && $"id" % 12 === 4,
            Map("b" -> lit(0L)))
        }
        val before = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/untouched.txt")), "UTF-8")
          .split("\n").toSeq.filter(_.nonEmpty)
        val now = IcebergTable.readPartitions(s, s"$table/table",
          Map("b" -> "2")).inputFiles.filter(_.contains("p__b="))
          .sorted.toSeq
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b",
            lit(before == now).as("untouched"))
          .orderBy($"id")
      }),

    // ---------------------- Delta MERGE on a PARTITIONED table
    // The Delta twin of q210: DV kill of matched rows + partition-
    // grouped source appends in one commit; the untouched partition's
    // data-file set stays byte-identical (kills are DV sidecars, never
    // rewrites).
    Q("q212_delta_part_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
               o_orderkey % 3 AS b, TRUE AS untouched
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text,
               CAST(1 AS BIGINT) AS b, TRUE AS untouched
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.DeltaTable
        val table = q212Fixture(s, d)
        val before = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/untouched.txt")), "UTF-8")
          .split("\n").toSeq.filter(_.nonEmpty)
        val now = DeltaTable.readWhere(s, s"$table/table",
          Seq(org.apache.spark.sql.sources.EqualTo("b", 2L)))
          .inputFiles.sorted.toSeq
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text", $"b",
            lit(before == now).as("untouched"))
          .orderBy($"id")
      }),

    // ------------- Delta partitioned MERGE through the change data feed
    // The same commit's cdc files serve the row-level truth with their
    // partition columns rebuilt from partitionValues: preimage/postimage
    // pairs for matched keys, inserts for new ones.
    Q("q213_delta_part_merge_cdf", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           m AS (SELECT * FROM o WHERE o_orderkey % 6 = 0)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
               o_orderkey % 3 AS b, 'update_preimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey AS id, 'm-' || CAST(rn0 AS VARCHAR) AS text,
               o_orderkey % 3 AS b, 'update_postimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text,
               CAST(1 AS BIGINT) AS b, 'insert' AS change_type
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id, change_type"""))(
      (s, d) => {
        import graft.sources.DeltaTable
        val table = q212Fixture(s, d)
        DeltaTable.readCdf(s, s"$table/table", 1L)
          .select($"id", $"text", $"b",
            $"_change_type".as("change_type"))
          .orderBy($"id", $"change_type")
      }),

    // ----------------- Delta UPDATE on a COLUMN-MAPPED (name-mode) table
    // The delta-spark default for newer tables: the log's schema maps
    // logical (id, text, bucket) to physical (c1, c2, c3); the UPDATE's
    // rewritten images (and partition dirs, add.partitionValues, stats)
    // must all be keyed PHYSICAL or they read back null. The oracle
    // recomputes every post-update value through the mapped read.
    Q("q214_delta_cm_update", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 5 = 0 THEN 'u-doc-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             CAST(o_orderkey % 3 AS VARCHAR) AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q214", d) { dir =>
          val t = s"$dir/table"
          cmLogV0(t)
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).cast("string").as("bucket")), t)
          DeltaWriter.writeUpdate(s, t, $"id" % 5 === 0,
            Map("text" -> concat(lit("u-"), $"text")))
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"text", $"bucket").orderBy($"id")
      }),

    // --- Delta MERGE on a column-mapped table, through the change feed
    // The mapped twin of q198: the merge's appended files AND its cdc
    // files store physical names (partition dirs keyed c3), and readCdf
    // rebuilds the logical view — pre/post images for matched keys,
    // inserts for new ones, from the merge commit only.
    Q("q215_delta_cm_merge_cdf", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           m AS (SELECT * FROM o WHERE o_orderkey % 6 = 0)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
               CAST(o_orderkey % 3 AS VARCHAR) AS bucket,
               'update_preimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey AS id, 'm-' || CAST(rn0 AS VARCHAR) AS text,
               CAST(o_orderkey % 3 AS VARCHAR) AS bucket,
               'update_postimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text,
               '1' AS bucket, 'insert' AS change_type
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id, change_type"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q215", d) { dir =>
          val t = s"$dir/table"
          cmLogV0(t)
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).cast("string").as("bucket")), t)
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"),
              ($"id" % 3).cast("string").as("bucket"))
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"),
              lit("1").as("bucket"))
          DeltaWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        DeltaTable.readCdf(s, s"$table/table", 2L)
          .select($"id", $"text", $"bucket",
            $"_change_type".as("change_type"))
          .orderBy($"id", $"change_type")
      }),

    // ----------------- Delta RENAME COLUMN under column mapping
    // The metaData-only migration: rows appended BEFORE the rename
    // (files physically keyed c2) and rows appended AFTER it (same
    // physical column, new logical name) serve one renamed column — a
    // reader that resolved by logical name would lose the old half.
    Q("q216_delta_cm_rename", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 < 60 THEN 'doc-' || CAST(rn0 AS VARCHAR)
                  ELSE 'new-' || CAST(rn0 AS VARCHAR) END AS body,
             CAST(o_orderkey % 3 AS VARCHAR) AS bucket
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q216", d) { dir =>
          val t = s"$dir/table"
          cmLogV0(t)
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" < 60)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).cast("string").as("bucket")), t)
          DeltaWriter.renameColumn(s, t, "text", "body")
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" >= 60)
              .select($"id", concat(lit("new-"), $"rn0").as("body"),
                ($"id" % 3).cast("string").as("bucket")), t)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"body", $"bucket").orderBy($"id")
      }),

    // ----------------- Iceberg RENAME COLUMN (metadata-only, field ids)
    // The Iceberg twin of q216: data files carry parquet FIELD IDS, the
    // rename appends a new schema (ids untouched), and the read path
    // resolves pre-rename files by id — both generations serve one
    // renamed column, partition pruning intact through the spec's
    // source-id binding.
    Q("q217_iceberg_rename", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 < 60 THEN 'doc-' || CAST(rn0 AS VARCHAR)
                  ELSE 'new-' || CAST(rn0 AS VARCHAR) END AS body,
             o_orderkey % 3 AS b
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q217", d) { dir =>
          val t = s"$dir/table"
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" < 60)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"),
                ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          IcebergWriter.renameColumn(s, t, "text", "body")
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" >= 60)
              .select($"id", concat(lit("new-"), $"rn0").as("body"),
                ($"id" % 3).as("b")), t)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"body", $"b").orderBy($"id")
      }),

    // -------------------- Delta DROP COLUMN under column mapping
    // The metaData-only drop: the stored physical column disappears
    // from the logical schema while every data file keeps it; rows
    // appended before AND after the drop read back through the narrowed
    // schema.
    Q("q218_delta_cm_drop", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id, CAST(o_orderkey % 3 AS VARCHAR) AS bucket
        FROM o
        UNION ALL
        SELECT o_orderkey + 200000 AS id, '1' AS bucket
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q218", d) { dir =>
          val t = s"$dir/table"
          cmLogV0(t)
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).cast("string").as("bucket")), t)
          DeltaWriter.dropColumn(s, t, "text")
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" % 10 === 0)
              .select(($"id" + 200000).as("id"), lit("1").as("bucket")), t)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"bucket").orderBy($"id")
      }),

    // -------------------- Iceberg DROP COLUMN (schema-only, id retired)
    Q("q219_iceberg_drop", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id, o_orderkey % 3 AS b FROM o
        UNION ALL
        SELECT o_orderkey + 200000 AS id, CAST(1 AS BIGINT) AS b
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q219", d) { dir =>
          val t = s"$dir/table"
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          IcebergWriter.dropColumn(s, t, "text")
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" % 10 === 0)
              .select(($"id" + 200000).as("id"), lit(1L).as("b")), t)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"b").orderBy($"id")
      }),

    // -------------- Iceberg type PROMOTION (int -> long, schema-only)
    // Rows written as INT and rows written as LONG (values above 2^31,
    // unrepresentable pre-widen) read back through one widened column;
    // old files' 4-byte manifest bounds promote so skipping still
    // works.
    Q("q220_iceberg_widen", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CAST(CASE WHEN rn0 < 60 THEN rn0
                  ELSE rn0 + 3000000000 END AS BIGINT) AS v
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q220", d) { dir =>
          val t = s"$dir/table"
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" < 60)
              .select($"id", $"rn0".cast("int").as("v")), t)
          IcebergWriter.widenColumn(s, t, "v", "long")
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" >= 60)
              .select($"id", ($"rn0" + 3000000000L).as("v")), t)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"v").orderBy($"id")
      }),

    // ------------------ Iceberg NESTED schemas (struct + list columns)
    // The writer assigns spec-unique field ids through nested positions
    // and the reader rebuilds the Spark types; the oracle checks
    // flattened projections (struct members, list length, first
    // element) so every nested value is pinned by scalars.
    Q("q221_iceberg_nested", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS title,
             round(o_orderkey * CAST(0.25 AS DOUBLE), 6) AS w,
             CAST(rn0 % 5 + 1 AS BIGINT) AS n_tags,
             'tag-' || CAST(rn0 % 7 AS VARCHAR) AS tag0
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q221", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val df = base.select($"id",
            struct(concat(lit("doc-"), $"rn0").as("title"),
              round($"id" * 0.25, 6).as("w")).as("info"),
            transform(sequence(lit(0L), $"rn0" % 5),
              i => concat(lit("tag-"), ($"rn0" % 7) + i)).as("tags"))
          IcebergWriter.writeAppend(s, df, s"$dir/table")
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"info.title".as("title"),
            round($"info.w", 6).as("w"),
            size($"tags").cast("long").as("n_tags"),
            element_at($"tags", 1).as("tag0"))
          .orderBy($"id")
      }),

    // ------------- Iceberg MERGE through a bucket[3] partition transform
    // Row-level writes through NON-identity transforms: kill files
    // scope by each data file's own bucket tuple, source images
    // re-derive their buckets through the same murmur3 expression
    // appends use. The oracle recomputes the upsert.
    Q("q222_iceberg_bucket_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'new-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q222", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")),
            t, partitionBy = Seq("bucket(3, id)"))
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"))
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("new-"), $"rn0").as("text"))
          IcebergWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // --------------- Iceberg EQUALITY delete: O(keys), zero table scan
    // Delete-by-key: the key frame lands as a content=2 equality-delete
    // file and the match happens at READ time against files with a
    // strictly smaller data sequence — a key re-inserted AFTER the
    // delete survives it, which the oracle pins alongside the kill.
    Q("q223_iceberg_eq_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE o_orderkey % 7 <> 3
        UNION ALL
        SELECT o_orderkey AS id, 're-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE o_orderkey % 7 = 3 AND rn0 % 2 = 0)
      ORDER BY id, text"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q223", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 7 === 3).select($"id"))
          // re-insert HALF the deleted keys after the delete — the
          // sequence rule keeps them alive
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 7 === 3 && $"rn0" % 2 === 0)
              .select($"id", concat(lit("re-"), $"rn0").as("text")), t)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id", $"text")
      }),

    // ------- ALTER TABLE: change data feed enabled MID-LIFE (Delta)
    // setProperties flips delta.enableChangeDataFeed on an EXISTING
    // table (carrying the writer-version-4 protocol obligation in the
    // same commit); an update after the flip serves row-level pre/post
    // images from the enable version onward.
    Q("q224_delta_set_properties", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
           m AS (SELECT * FROM o WHERE o_orderkey % 5 = 0)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
               'update_preimage' AS change_type
        FROM m
        UNION ALL
        SELECT o_orderkey AS id, 'u-doc-' || CAST(rn0 AS VARCHAR) AS text,
               'update_postimage' AS change_type
        FROM m)
      ORDER BY id, change_type"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q224", d) { dir =>
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          // v0: plain table, NO change data feed
          DeltaWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          // v1: the property flip (+ protocol obligation)
          DeltaWriter.setProperties(s, t,
            Map("delta.enableChangeDataFeed" -> "true"))
          // v2: an update the feed must serve row-level
          DeltaWriter.writeUpdate(s, t, $"id" % 5 === 0,
            Map("text" -> concat(lit("u-"), $"text")))
        }
        DeltaTable.readCdf(s, s"$table/table", 2L)
          .select($"id", $"text", $"_change_type".as("change_type"))
          .orderBy($"id", $"change_type")
      }),

    // -------- Iceberg EQUALITY delete on a PARTITIONED table (SCOPED)
    // The 100 TB corpus-dedup kill on the layout corpora actually use:
    // the keys carry the partition source column, so the key frame
    // writes PARTITION-SCOPED delete files — one per touched tuple,
    // prunable everywhere else. Pins: zero data files rewritten
    // (`untouched` — the complete pre-delete data-file set survives
    // byte-identical), every delete file lands in the ONE touched
    // partition (`scoped`), and a key re-inserted after the delete
    // survives it (the sequence rule).
    Q("q225_iceberg_part_eq_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
               o_orderkey % 3 AS b, TRUE AS untouched, TRUE AS scoped
        FROM o WHERE o_orderkey % 6 <> 0
        UNION ALL
        SELECT o_orderkey AS id, 're-' || CAST(rn0 AS VARCHAR) AS text,
               o_orderkey % 3 AS b, TRUE AS untouched, TRUE AS scoped
        FROM o WHERE o_orderkey % 6 = 0 AND rn0 % 2 = 0)
      ORDER BY id, text"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        def walkParquet(root: String): Seq[String] = {
          val b = Seq.newBuilder[String]
          def walk(f: java.io.File): Unit =
            if (f.isDirectory) f.listFiles.foreach(walk)
            else if (f.getName.endsWith(".parquet")) b += f.getAbsolutePath
          walk(new java.io.File(root))
          b.result()
        }
        val table = Fixtures.dir("q225", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          val preDelete = walkParquet(s"$t/data")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/dataset.txt"),
            preDelete.sorted.mkString("\n").getBytes("UTF-8"))
          // id%6=0 keys all live in partition 0 — keys carry b, so the
          // delete scopes there and partitions 1/2 can prune it
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 6 === 0)
              .select($"id", ($"id" % 3).as("b")))
          // the delete's file set = what the commit added under data/
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/delfiles.txt"),
            (walkParquet(s"$t/data").toSet -- preDelete).toSeq.sorted
              .mkString("\n").getBytes("UTF-8"))
          // re-insert HALF the killed keys after the delete
          IcebergWriter.writeAppend(s,
            base.filter($"id" % 6 === 0 && $"rn0" % 2 === 0)
              .select($"id", concat(lit("re-"), $"rn0").as("text"),
                ($"id" % 3).as("b")), t)
        }
        def slurp(f: String): Seq[String] =
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f)), "UTF-8")
            .split("\n").toSeq.filter(_.nonEmpty)
        val before = slurp(s"$table/dataset.txt")
        val delFiles = slurp(s"$table/delfiles.txt")
        val untouched = before.toSet
          .subsetOf(walkParquet(s"$table/table/data").toSet)
        val scoped = delFiles.nonEmpty &&
          delFiles.forall(_.contains("p__b=0"))
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b", lit(untouched).as("untouched"),
            lit(scoped).as("scoped"))
          .orderBy($"id", $"text")
      }),

    // -------- Iceberg EQUALITY delete on a PARTITIONED table (GLOBAL)
    // The other spec-legal route: keys that DON'T derive the partition
    // (delete by id on an identity(b) table) write one GLOBAL delete
    // file under an UNPARTITIONED spec the commit registers alongside
    // the default (default-spec-id untouched) — pinned via the
    // metadata's spec list, with the kill applying in EVERY partition.
    Q("q226_iceberg_global_eq_delete", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             o_orderkey % 3 AS b, 2 AS n_specs, 0 AS default_spec
      FROM o WHERE o_orderkey % 7 <> 2
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        import org.json4s.jackson.{JsonMethods => JM}
        val table = Fixtures.dir("q226", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).as("b")), t, partitionBy = Seq("b"))
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 7 === 2).select($"id"))
        }
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        val metaDir = new java.io.File(s"$table/table/metadata")
        val latest = metaDir.listFiles.map(_.getName)
          .filter(n => n.startsWith("v") && n.endsWith(".metadata.json"))
          .maxBy(_.stripPrefix("v").stripSuffix(".metadata.json").toLong)
        val mj = JM.parse(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/table/metadata/$latest")),
          "UTF-8"))
        val nSpecs = (mj \ "partition-specs")
          .extract[Seq[org.json4s.JValue]].size
        val defSpec = (mj \ "default-spec-id").extract[Int]
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b", lit(nSpecs).as("n_specs"),
            lit(defSpec).as("default_spec"))
          .orderBy($"id")
      }),

    // ------ Iceberg compaction THROUGH a bucket transform, eq-delete
    // debt repaid. The maintenance step a bucketed 100 TB corpus needs
    // after O(keys) kills: rewriteDataFiles re-derives every tuple
    // through the spec's transform, bakes the equality deletes into the
    // data, and drops the delete manifests from the active set. Pins:
    // survivor content, the compacted file count (one per live bucket),
    // and that every active file is a bucket-dir data file (a live
    // delete file would break `compacted`).
    Q("q227_iceberg_bucket_compact", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             3 AS n_files, TRUE AS compacted
      FROM o WHERE o_orderkey % 5 <> 0
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q227", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t,
            partitionBy = Seq("bucket(3, id)"))
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 5 === 0).select($"id"))
          IcebergWriter.rewriteDataFiles(s, t)
        }
        val files = IcebergTable.read(s, s"$table/table").inputFiles.toSeq
        val compacted = files.nonEmpty &&
          files.forall(_.contains("p__id_bucket="))
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", lit(files.length).as("n_files"),
            lit(compacted).as("compacted"))
          .orderBy($"id")
      }),

    // ------ Iceberg v3 DV delete on a PARTITIONED table
    // The v3 twin of q225's layout: matched rows die by Puffin deletion
    // vector, each DV manifest entry scoped to its referenced data
    // file's partition tuple. Pins: survivors, zero parquet churn
    // (`untouched` — a DV delete adds only the Puffin container), and
    // every DV entry scoping to the ONE touched partition (`scoped`).
    Q("q228_iceberg_v3_part_dv", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id, 'doc-' || CAST(rn0 AS VARCHAR) AS text,
             o_orderkey % 3 AS b, TRUE AS untouched, TRUE AS scoped
      FROM o WHERE o_orderkey % 6 <> 0
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable, IcebergWriter}
        def walkParquet(root: String): Set[String] = {
          val b = Set.newBuilder[String]
          def walk(f: java.io.File): Unit =
            if (f.isDirectory) f.listFiles.foreach(walk)
            else if (f.getName.endsWith(".parquet")) b += f.getAbsolutePath
          walk(new java.io.File(root))
          b.result()
        }
        val table = Fixtures.dir("q228", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              ($"id" % 3).as("b")), t, partitionBy = Seq("b"),
            formatVersion = 3)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/dataset.txt"),
            walkParquet(s"$t/data").toSeq.sorted
              .mkString("\n").getBytes("UTF-8"))
          // id%6=0 rows all live in partition 0
          IcebergWriter.writeDelete(s, t, col("id") % 6 === 0)
        }
        val before = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$table/dataset.txt")), "UTF-8")
          .split("\n").toSet.filter(_.nonEmpty)
        val untouched = walkParquet(s"$table/table/data") == before
        val delManifest = new java.io.File(s"$table/table/metadata")
          .listFiles.filter(f =>
            f.getName.startsWith("m-") && f.getName.endsWith(".avro"))
          .maxBy(_.lastModified)
        val dvEntries = AvroOcf.readFilesLocal(s, Seq(delManifest.getPath))
        val scoped = dvEntries
          .select($"data_file.file_format", $"data_file.partition.b")
          .collect().forall(r =>
            r.getString(0) == "PUFFIN" && !r.isNullAt(1) && r.getLong(1) == 0L)
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b", lit(untouched).as("untouched"),
            lit(scoped).as("scoped"))
          .orderBy($"id")
      }),

    // ------ Delta rowTracking: enablement backfill + UPDATE round trip
    // setProperties(delta.enableRowTracking) on an EXISTING two-file
    // table re-commits every file with a contiguous baseRowId range
    // (the backfill), then an UPDATE preserves the surviving file's
    // ids verbatim and hands the post-update images the fresh range
    // past the high-water mark. Pins: per-row stable ids (file
    // position == rn0 by construction), per-row commit versions
    // (backfill=2, update=3), and the fresh range's lo/hi/sum.
    Q("q229_delta_row_tracking", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
           u AS (SELECT count(*) AS k FROM o
                 WHERE o_orderkey % 5 = 0 AND rn0 >= 30)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30
                  THEN 'u-doc-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30
                  THEN NULL ELSE rn0 END AS stable_row_id,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30
                  THEN 3 ELSE 2 END AS rcv,
             60 AS fresh_lo,
             60 + (SELECT k FROM u) - 1 AS fresh_hi,
             (SELECT k FROM u) * 60 +
               ((SELECT k FROM u) * ((SELECT k FROM u) - 1)) // 2
               AS fresh_sum
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q229", d) { dir =>
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          // two sorted single-partition files: position == rn0
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" < 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t)
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" >= 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t)
          DeltaWriter.setProperties(s, t,
            Map("delta.enableRowTracking" -> "true"))
          DeltaWriter.writeUpdate(s, t,
            col("id") % 5 === 0 && col("rn0") >= 30,
            Map("text" -> concat(lit("u-"), col("text"))))
        }
        val withIds = DeltaTable.readWithRowIds(s, s"$table/table")
        val fresh = withIds.filter($"_row_commit_version" === 3L)
          .agg(org.apache.spark.sql.functions.min($"_row_id"),
            org.apache.spark.sql.functions.max($"_row_id"),
            org.apache.spark.sql.functions.sum($"_row_id")).head()
        withIds.select($"id", $"text",
          when($"_row_commit_version" === 3L, lit(null).cast("long"))
            .otherwise($"_row_id").as("stable_row_id"),
          $"_row_commit_version".as("rcv"),
          lit(fresh.getLong(0)).as("fresh_lo"),
          lit(fresh.getLong(1)).as("fresh_hi"),
          lit(fresh.getLong(2)).as("fresh_sum"))
          .orderBy($"id")
      }),

    // ------ Delta NESTED columns under column mapping, full row-level
    // lifecycle: append + UPDATE (struct rebuild) + MERGE + DELETE on a
    // nested predicate, against a table whose schema maps every
    // nesting level to physical names/ids. The physical rename is one
    // CAST per column (struct casts rename positionally) — the data
    // files store col-b{col-c,col-d} while the reader serves
    // meta{author,score}.
    Q("q230_delta_cm_nested", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
           base AS (SELECT o_orderkey AS id,
                           'a' || CAST(rn0 % 7 AS VARCHAR) AS author,
                           rn0 AS score, rn0 % 3 AS n_tags
                    FROM o),
           upd AS (SELECT id,
                          CASE WHEN id % 4 = 0 THEN 'u-' || author
                               ELSE author END AS author,
                          CASE WHEN id % 4 = 0 THEN score + 100
                               ELSE score END AS score,
                          n_tags
                   FROM base),
           merged AS (SELECT * FROM upd
                      UNION ALL
                      SELECT o_orderkey + 100000, 'm', rn0, 1
                      FROM o WHERE rn0 % 10 = 0)
      SELECT id, author, score, n_tags FROM merged
      WHERE score <= 140
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        import org.apache.spark.sql.types.{ArrayType, LongType, Metadata,
          MetadataBuilder, StringType, StructField, StructType}
        val table = Fixtures.dir("q230", d) { dir =>
          val t = s"$dir/table"
          def m(phys: String, id: Int): Metadata = new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", phys)
            .putLong("delta.columnMapping.id", id.toLong).build()
          val logical = StructType(Seq(
            StructField("id", LongType, nullable = true, m("col-a", 1)),
            StructField("meta", StructType(Seq(
              StructField("author", StringType, nullable = true,
                m("col-c", 3)),
              StructField("score", LongType, nullable = true,
                m("col-d", 4)))),
              nullable = true, m("col-b", 2)),
            StructField("tags", ArrayType(StringType), nullable = true,
              m("col-e", 5))))
          val schemaStr = logical.json
            .replace("\\", "\\\\").replace("\"", "\\\"")
          new java.io.File(s"$t/_delta_log").mkdirs()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(
              s"$t/_delta_log/00000000000000000000.json"),
            (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
              s""""readerFeatures":["columnMapping"],""" +
              s""""writerFeatures":["columnMapping"]}}""" + "\n" +
              s"""{"metaData":{"id":"m","format":{"provider":"parquet",""" +
              s""""options":{}},"schemaString":"$schemaStr",""" +
              s""""partitionColumns":[],"configuration":""" +
              s"""{"delta.columnMapping.mode":"name",""" +
              s""""delta.columnMapping.maxColumnId":"5"},""" +
              s""""createdTime":0}}""").getBytes("UTF-8"))
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          DeltaWriter.writeAppend(s, base.select($"id",
            struct(concat(lit("a"), ($"rn0" % 7).cast("string"))
              .as("author"), $"rn0".as("score")).as("meta"),
            when($"rn0" % 3 === 0, array().cast("array<string>"))
              .when($"rn0" % 3 === 1, array(lit("x")))
              .otherwise(array(lit("x"), lit("y"))).as("tags")), t)
          DeltaWriter.writeUpdate(s, t, col("id") % 4 === 0,
            Map("meta" -> struct(
              concat(lit("u-"), col("meta.author")).as("author"),
              (col("meta.score") + 100L).as("score"))))
          DeltaWriter.writeMerge(s, t,
            base.filter($"rn0" % 10 === 0).select(
              ($"id" + 100000).as("id"),
              struct(lit("m").as("author"), $"rn0".as("score")).as("meta"),
              array(lit("z")).as("tags")), Seq("id"))
          DeltaWriter.writeDelete(s, t, col("meta.score") > 140L)
        }
        DeltaTable.read(s, s"$table/table")
          .select($"id", $"meta.author".as("author"),
            $"meta.score".as("score"), size($"tags").as("n_tags"))
          .orderBy($"id")
      }),

    // ------ Iceberg MERGE BY KEY: the zero-scan upsert (v3 + bucket)
    // Two stacked writeMergeByKey commits on a bucket-partitioned v3
    // table: each commit writes ONLY the source (equality-delete kill
    // + appended images at one sequence — O(source) at any table
    // size); the spec's strictly-smaller-sequence rule makes the
    // second merge's images kill the first's while surviving their own
    // delete. The oracle recomputes the full replace-by-key cascade.
    Q("q231_iceberg_merge_by_key", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT * FROM (
        SELECT o_orderkey AS id,
               CASE WHEN o_orderkey % 12 = 0 THEN 'mm-' || CAST(rn0 AS VARCHAR)
                    WHEN o_orderkey % 6 = 0 THEN 'm-' || CAST(rn0 AS VARCHAR)
                    ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text
        FROM o
        UNION ALL
        SELECT o_orderkey + 100000 AS id,
               'n-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE rn0 % 10 = 0)
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q231", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t,
            partitionBy = Seq("bucket(3, id)"), formatVersion = 3)
          val upd = base.filter($"id" % 6 === 0)
            .select($"id", concat(lit("m-"), $"rn0").as("text"))
          val ins = base.filter($"rn0" % 10 === 0)
            .select(($"id" + 100000).as("id"),
              concat(lit("n-"), $"rn0").as("text"))
          IcebergWriter.writeMergeByKey(s, t, upd.unionByName(ins),
            Seq("id"))
          IcebergWriter.writeMergeByKey(s, t,
            base.filter($"id" % 12 === 0)
              .select($"id", concat(lit("mm-"), $"rn0").as("text")),
            Seq("id"))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text").orderBy($"id")
      }),

    // ------ Iceberg v3 UPDATE on a PARTITIONED table
    // Row-level UPDATE on format-version 3: matched rows die by Puffin
    // deletion vector (one per touched data file, scoped to its
    // partition tuple) and the rewritten images append, both manifests
    // in ONE overwrite snapshot with the lineage advanced by the
    // images. The v3 twin of q187's lifecycle on the partitioned
    // layout.
    Q("q232_iceberg_v3_update", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 5 = 0 THEN 'u-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS b
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q232", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0", ($"id" % 3).as("b")), t, partitionBy = Seq("b"),
            formatVersion = 3)
          IcebergWriter.writeUpdate(s, t, col("id") % 5 === 0,
            Map("text" -> concat(lit("u-"), col("rn0"))))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"text", $"b").orderBy($"id")
      }),

    // ------ Delta OPTIMIZE on a rowTracking table
    // Two born-tracked sorted files take DV debt from a DELETE, then
    // compact: the rewrite stores each survivor's stable id and commit
    // version PHYSICALLY in the materialized row-id columns (names
    // minted in the same commit), so identity survives the merge
    // byte-for-byte while the DVs disappear. Pins: per-row (id, rcv)
    // across the compaction (position == rn0 by construction, rcv = the
    // original append's version 0/1 — NOT the compaction's), the
    // one-file result, and the zero-DV invariant.
    Q("q233_delta_optimize_row_tracking", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS text,
             rn0 AS stable_row_id,
             CASE WHEN rn0 < 30 THEN 0 ELSE 1 END AS rcv,
             1 AS n_files, 0 AS n_dvs
      FROM o WHERE rn0 % 10 <> 3 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q233", d) { dir =>
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          // two sorted single-partition files: position == rn0
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" < 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t,
            properties = Map("delta.enableRowTracking" -> "true"))
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" >= 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t)
          DeltaWriter.writeDelete(s, t, col("rn0") % 10 === 3)
          DeltaWriter.compact(s, t)
        }
        val snap = DeltaTable.snapshotState(s, s"$table/table")
        val nFiles = snap.files.size
        val nDvs = snap.files.count(_._3.isDefined)
        DeltaTable.readWithRowIds(s, s"$table/table")
          .select($"id", $"text", $"_row_id".as("stable_row_id"),
            $"_row_commit_version".as("rcv"),
            lit(nFiles).as("n_files"), lit(nDvs).as("n_dvs"))
          .orderBy($"id")
      }),

    // ------ Iceberg v3 REPEATED row-level ops on one file (DV merge)
    // Two stacked DELETEs and an UPDATE on a partitioned v3 table hit
    // the same data files: each later op MERGES the prior deletion
    // vector (union of positions, one replacement Puffin blob) and
    // REWRITES the delete manifest so the superseded entry drops —
    // v3's one-DV-per-file rule held across the whole lifecycle. Pins:
    // the surviving rows + images, zero live positional entries, and
    // the per-file DV-entry count across ALL active delete manifests.
    Q("q234_iceberg_dv_merge", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 % 12 = 0 THEN 'u-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             o_orderkey % 3 AS b,
             0 AS n_pos, 1 AS max_dv_per_file
      FROM o WHERE rn0 % 10 <> 3 AND rn0 % 15 <> 2
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{AvroOcf, IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q234", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
              $"rn0", ($"id" % 3).as("b")), t, partitionBy = Seq("b"),
            formatVersion = 3)
          IcebergWriter.writeDelete(s, t, col("rn0") % 10 === 3)
          IcebergWriter.writeDelete(s, t, col("rn0") % 15 === 2)
          IcebergWriter.writeUpdate(s, t, col("rn0") % 12 === 0,
            Map("text" -> concat(lit("u-"), col("rn0"))))
        }
        val t = s"$table/table"
        val shapes = IcebergTable.deleteShapes(s, t)
        // the invariant pin: DV entries per referenced data file across
        // every ACTIVE delete manifest (O(manifests) driver metadata)
        val metaTxt = new String(java.nio.file.Files.readAllBytes(
          new java.io.File(s"$t/metadata").listFiles()
            .filter(_.getName.endsWith(".metadata.json"))
            .maxBy(f => f.getName.stripPrefix("v")
              .stripSuffix(".metadata.json").toLong).toPath), "UTF-8")
        val listPath = """"manifest-list": "([^"]+)"""".r
          .findAllMatchIn(metaTxt).map(_.group(1)).toSeq.last
        val delMans = AvroOcf.readFilesLocal(s, Seq(listPath))
          .filter(col("content") === 1)
          .select(col("manifest_path")).collect().map(_.getString(0)).toSeq
        val maxDv = delMans.flatMap { mp =>
          AvroOcf.readFilesLocal(s, Seq(mp)).filter(col("status") =!= 2)
            .select(col("data_file.referenced_data_file"))
            .collect().map(_.getString(0))
        }.groupBy(identity).values.map(_.size).max
        IcebergTable.read(s, t)
          .select($"id", $"text", $"b",
            lit(shapes.posDeleteFiles.size).as("n_pos"),
            lit(maxDv).as("max_dv_per_file"))
          .orderBy($"id")
      }),

    // ------ Iceberg NESTED columns, full lifecycle (the q230 twin)
    // A nested-struct Iceberg table takes a mid-life NESTED RENAME
    // (meta.author -> meta.writer, metadata-only, field ids stable),
    // then UPDATE + MERGE + DELETE on nested predicates. Files written
    // BEFORE the rename resolve per file by name history and relabel
    // through one positional cast; files written after spell the new
    // name — both union under the current schema. The oracle recomputes
    // the whole cascade.
    Q("q235_iceberg_nested", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
           base AS (SELECT o_orderkey AS id,
                           'a' || CAST(rn0 % 7 AS VARCHAR) AS author,
                           rn0 AS score, rn0 % 3 AS n_tags
                    FROM o),
           upd AS (SELECT id,
                          CASE WHEN id % 4 = 0 THEN 'u-' || author
                               ELSE author END AS author,
                          CASE WHEN id % 4 = 0 THEN score + 100
                               ELSE score END AS score,
                          n_tags
                   FROM base),
           merged AS (SELECT * FROM upd
                      UNION ALL
                      SELECT o_orderkey + 100000, 'm', rn0, 1
                      FROM o WHERE rn0 % 10 = 0)
      SELECT id, author, score, n_tags FROM merged
      WHERE score <= 140
      ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q235", d) { dir =>
          val t = s"$dir/table"
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          def metaCol(author: Column) =
            struct(author.as("author"), $"rn0".as("score"))
          IcebergWriter.writeAppend(s, base.select($"id",
            metaCol(concat(lit("a"), ($"rn0" % 7).cast("string")))
              .as("meta"),
            when($"rn0" % 3 === 0, array().cast("array<string>"))
              .when($"rn0" % 3 === 1, array(lit("x")))
              .otherwise(array(lit("x"), lit("y"))).as("tags")), t)
          // mid-life NESTED RENAME: author -> writer, ids stable
          IcebergWriter.renameColumn(s, t, "meta.author", "writer")
          IcebergWriter.writeUpdate(s, t, col("id") % 4 === 0,
            Map("meta" -> struct(
              concat(lit("u-"), col("meta.writer")).as("writer"),
              (col("meta.score") + 100L).as("score"))))
          IcebergWriter.writeMerge(s, t,
            base.filter($"rn0" % 10 === 0).select(
              ($"id" + 100000).as("id"),
              struct(lit("m").as("writer"), $"rn0".as("score")).as("meta"),
              array(lit("z")).as("tags")), Seq("id"))
          IcebergWriter.writeDelete(s, t, col("meta.score") > 140L)
        }
        IcebergTable.read(s, s"$table/table")
          .select($"id", $"meta.writer".as("author"),
            $"meta.score".as("score"), size($"tags").as("n_tags"))
          .orderBy($"id")
      }),

    // ------ Iceberg Z-ORDERED compaction through a bucket transform
    // rewriteDataFiles(zorderBy) on a bucket(3, id)-partitioned table:
    // rows cluster by the z-value of `v` WITHIN each bucket value (the
    // transform expressions group the range shuffle), so every bucket
    // splits into several files with TIGHT disjoint v-bounds and the
    // manifest-stats scan planner prunes on v inside every bucket.
    // Pins: full row set byte-identical, >= 2 files per bucket
    // (`multi`), a v-range readWhere scanning strictly fewer files
    // (`pruned`), and the pruned scan's exact row count (`exact`).
    Q("q236_iceberg_zorder_bucket", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT o_orderkey AS id,
             rpad('doc-' || CAST(rn0 AS VARCHAR), 200, 'x') AS text,
             rn0 AS v,
             TRUE AS multi, TRUE AS pruned, TRUE AS exact
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q236", d) { dir =>
          val base = orderedKeys(s, d, 120)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s, base.select($"id",
            rpad(concat(lit("doc-"), $"rn0".cast("string")), 200, "x")
              .as("text"), $"rn0".as("v")), t,
            partitionBy = Seq("bucket(3, id)"))
          IcebergWriter.rewriteDataFiles(s, t,
            targetFileBytes = 1024, zorderBy = Seq("v"))
        }
        val t = s"$table/table"
        val all = IcebergTable.read(s, t)
        val files = all.inputFiles.toSeq
        val byBucket = files.flatMap { f =>
          f.split("p__id_bucket=").lift(1).map(_.split('/').head)
        }.groupBy(identity)
        val multi = byBucket.size == 3 && byBucket.values.forall(_.size >= 2)
        val prunedDf = IcebergTable.readWhere(s, t,
          Seq(org.apache.spark.sql.sources.LessThan("v", 20L)))
        val prunedOk = prunedDf.inputFiles.length < files.size
        val exact = prunedDf.count() == 20L
        all.select($"id", $"text", $"v", lit(multi).as("multi"),
          lit(prunedOk).as("pruned"), lit(exact).as("exact"))
          .orderBy($"id")
      }),

    // ------ Iceberg equality deletes ACROSS a rename (id-keyed files)
    // An eq delete lands BEFORE the key column renames, a second one
    // lands AFTER (keyed by the new name), and a writeMergeByKey stacks
    // on top — all three resolve because the delete files are ID-KEYED
    // (field ids survive renames; the name fallback is disabled under
    // renames). The oracle recomputes the kill+replace cascade.
    Q("q237_iceberg_eq_rename", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 100)
      SELECT * FROM (
        SELECT o_orderkey AS key, 'm-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE o_orderkey % 6 = 0
        UNION ALL
        SELECT o_orderkey AS key, 'doc-' || CAST(rn0 AS VARCHAR) AS text
        FROM o
        WHERE o_orderkey % 6 <> 0
          AND o_orderkey % 4 <> 1 AND o_orderkey % 10 <> 2
        UNION ALL
        SELECT o_orderkey + 100000 AS key, 'n-' || CAST(rn0 AS VARCHAR)
        FROM o WHERE rn0 % 20 = 0)
      ORDER BY key"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q237", d) { dir =>
          val base = orderedKeys(s, d, 100)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          // eq delete BEFORE the rename, keyed by the old name
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 4 === 1).select($"id"))
          IcebergWriter.renameColumn(s, t, "id", "key")
          // eq delete AFTER the rename, keyed by the new name
          IcebergWriter.writeEqualityDelete(s, t,
            base.filter($"id" % 10 === 2).select($"id".as("key")))
          // and the zero-scan merge on top — kill+append, id-keyed too
          IcebergWriter.writeMergeByKey(s, t,
            base.filter($"id" % 6 === 0)
              .select($"id".as("key"), concat(lit("m-"), $"rn0").as("text"))
              .unionByName(base.filter($"rn0" % 20 === 0)
                .select(($"id" + 100000).as("key"),
                  concat(lit("n-"), $"rn0").as("text"))), Seq("key"))
        }
        IcebergTable.read(s, s"$table/table")
          .select($"key", $"text").orderBy($"key")
      }),

    // ------ Iceberg snapshot REFS: a tag pins, the main branch follows
    // A dataset release tag (`v1`) pins the pre-mutation snapshot while
    // DELETE + append advance the table — the reproducible-training-run
    // shape: `readRef(v1)` serves the frozen corpus byte-for-byte,
    // `main` (advanced by every commit) serves the live one. The oracle
    // recomputes both states side by side.
    Q("q238_iceberg_refs", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 80)
      SELECT * FROM (
        SELECT 'tag' AS src, o_orderkey AS id,
               'doc-' || CAST(rn0 AS VARCHAR) AS text
        FROM o
        UNION ALL
        SELECT 'main' AS src, o_orderkey AS id,
               'doc-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE o_orderkey % 5 <> 0
        UNION ALL
        SELECT 'main' AS src, o_orderkey + 100000 AS id,
               'n-' || CAST(rn0 AS VARCHAR) AS text
        FROM o WHERE rn0 % 16 = 0)
      ORDER BY src, id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q238", d) { dir =>
          val base = orderedKeys(s, d, 80)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.select($"id", concat(lit("doc-"), $"rn0").as("text")), t)
          IcebergWriter.setRef(s, t, "v1",
            IcebergTable.currentSnapshotId(s, t).get)
          IcebergWriter.writeDelete(s, t, col("id") % 5 === 0)
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" % 16 === 0)
              .select(($"id" + 100000).as("id"),
                concat(lit("n-"), $"rn0").as("text")), t)
        }
        val t = s"$table/table"
        IcebergTable.readRef(s, t, "v1")
          .select(lit("tag").as("src"), $"id", $"text")
          .unionByName(IcebergTable.readRef(s, t, "main")
            .select(lit("main").as("src"), $"id", $"text"))
          .orderBy($"src", $"id")
      }),

    // ------ Iceberg v3 ROW LINEAGE (the q229 twin)
    // Two sorted appends stamp contiguous first_row_id ranges (a row's
    // id = first + position == rn0 by construction), then an UPDATE
    // kills matched rows by DV — data files untouched, so every
    // survivor's id is stable — and hands the images the fresh range
    // past the high-water mark. Pins: per-row stable ids, per-row
    // last-updated sequence (append 1/2, update 3), and the fresh
    // range's lo/hi/sum.
    Q("q239_iceberg_row_lineage", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
           u AS (SELECT count(*) AS k FROM o
                 WHERE o_orderkey % 5 = 0 AND rn0 >= 30)
      SELECT o_orderkey AS id,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30
                  THEN 'u-' || CAST(rn0 AS VARCHAR)
                  ELSE 'doc-' || CAST(rn0 AS VARCHAR) END AS text,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30
                  THEN NULL ELSE rn0 END AS stable_row_id,
             CASE WHEN o_orderkey % 5 = 0 AND rn0 >= 30 THEN 3
                  WHEN rn0 < 30 THEN 1 ELSE 2 END AS lus,
             60 AS fresh_lo,
             60 + (SELECT k FROM u) - 1 AS fresh_hi,
             (SELECT k FROM u) * 60 +
               ((SELECT k FROM u) * ((SELECT k FROM u) - 1)) // 2
               AS fresh_sum
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{IcebergTable, IcebergWriter}
        val table = Fixtures.dir("q239", d) { dir =>
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" < 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t,
            formatVersion = 3)
          IcebergWriter.writeAppend(s,
            base.filter($"rn0" >= 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t)
          IcebergWriter.writeUpdate(s, t,
            col("id") % 5 === 0 && col("rn0") >= 30,
            Map("text" -> concat(lit("u-"), col("rn0"))))
        }
        val withIds = IcebergTable.readWithRowIds(s, s"$table/table")
        val fresh = withIds.filter($"_last_updated_sequence_number" === 3L)
          .agg(org.apache.spark.sql.functions.min($"_row_id"),
            org.apache.spark.sql.functions.max($"_row_id"),
            org.apache.spark.sql.functions.sum($"_row_id")).head()
        withIds.select($"id", $"text",
          when($"_last_updated_sequence_number" === 3L,
            lit(null).cast("long"))
            .otherwise($"_row_id").as("stable_row_id"),
          $"_last_updated_sequence_number".as("lus"),
          lit(fresh.getLong(0)).as("fresh_lo"),
          lit(fresh.getLong(1)).as("fresh_hi"),
          lit(fresh.getLong(2)).as("fresh_sum"))
          .orderBy($"id")
      }),

    // ------ Delta COPY-ON-WRITE delete on a rowTracking table
    // A rewrite-mode DELETE (the above-the-DV-cap shape) on a tracked
    // table: every SURVIVOR's stable id and commit version persist
    // through the rewrite via the materialized row-id columns (minted
    // in the same commit); only the deleted rows' ids retire, and no
    // deletion vector is ever involved. Pins: per-row (id, rcv) across
    // the rewrite and the zero-DV invariant.
    Q("q240_delta_cow_row_tracking", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60)
      SELECT o_orderkey AS id,
             'doc-' || CAST(rn0 AS VARCHAR) AS text,
             rn0 AS stable_row_id,
             CASE WHEN rn0 < 30 THEN 0 ELSE 1 END AS rcv,
             0 AS n_dvs
      FROM o WHERE rn0 % 7 <> 2 ORDER BY id"""))(
      (s, d) => {
        import graft.sources.{DeltaTable, DeltaWriter}
        val table = Fixtures.dir("q240", d) { dir =>
          val base = orderedKeys(s, d, 60)
            .select($"doc_id".as("id"), $"rn0")
          val t = s"$dir/table"
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" < 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t,
            properties = Map("delta.enableRowTracking" -> "true"))
          DeltaWriter.writeAppend(s,
            base.filter($"rn0" >= 30)
              .select($"id", concat(lit("doc-"), $"rn0").as("text"), $"rn0")
              .repartition(1).sortWithinPartitions("rn0"), t)
          DeltaWriter.writeDelete(s, t, col("rn0") % 7 === 2,
            mode = "rewrite")
        }
        val snap = DeltaTable.snapshotState(s, s"$table/table")
        val nDvs = snap.files.count(_._3.isDefined)
        DeltaTable.readWithRowIds(s, s"$table/table")
          .select($"id", $"text", $"_row_id".as("stable_row_id"),
            $"_row_commit_version".as("rcv"), lit(nDvs).as("n_dvs"))
          .orderBy($"id")
      }),

    // ------------------------------------------------------- HF tokenizer.json encode
    // A hand-authored tokenizer.json (the huggingface/tokenizers file
    // format, byte-level BPE) over planted "ab"*k words: greedy merge
    // order gives the closed form floor(k/2) x "abab" + (k%2) x "ab", so
    // the oracle recomputes count, first/last ids, and the id sum. A
    // regex slip, a merge-order slip, or a byte-mapping slip breaks it.
    Q("q166_hf_tokenizer", Some("""
      WITH o AS (SELECT o_orderkey,
                        o_orderkey % 7 + 1 AS k
                 FROM orders ORDER BY o_orderkey LIMIT 200)
      SELECT o_orderkey AS id,
             (k + 1) // 2 AS n_tokens,
             CASE WHEN k >= 2 THEN 3 ELSE 2 END AS first_id,
             CASE WHEN k % 2 = 1 THEN 2 ELSE 3 END AS last_id,
             (k // 2) * 3 + (k % 2) * 2 AS id_sum
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.functions.HfTokenizer
        val spec = HfTokenizer.parse(
          """{"model": {"type": "BPE", "unk_token": null,
               "vocab": {"a": 0, "b": 1, "ab": 2, "abab": 3},
               "merges": ["a b", "ab ab"]},
             "pre_tokenizer": {"type": "ByteLevel",
               "add_prefix_space": false, "use_regex": true},
             "normalizer": null}""")
        val in = Tables.orders(s, d).orderBy($"o_orderkey").limit(200)
          .select($"o_orderkey".cast("long").as("doc_id"),
            repeat(lit("ab"), ($"o_orderkey" % 7 + 1).cast("int")).as("text"))
        HfTokenizer.encode(in, "doc_id", "text", spec)
          .select($"id", $"n_tokens",
            element_at($"token_ids", 1).cast("long").as("first_id"),
            element_at($"token_ids", -1).cast("long").as("last_id"),
            aggregate($"token_ids", lit(0L),
              (acc, x) => acc + x.cast("long")).as("id_sum"))
          .orderBy($"id")
      }),

    // ------------------------------------------------------- mojibake repair
    // The ftfy core case: UTF-8 bytes mis-decoded as Windows-1252 ("Ã©"
    // for "é") repair by re-encoding + strict UTF-8 decode; even rows are
    // planted broken (one of them DOUBLY broken), odd rows are clean and
    // must pass through untouched. The oracle recomputes the repaired
    // text from the same derivation.
    Q("q167_mojibake", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 200)
      SELECT o_orderkey AS id,
             CASE WHEN rn0 % 2 = 0 THEN 'café € naïve #' || CAST(rn0 AS VARCHAR)
                  ELSE 'clean ascii #' || CAST(rn0 AS VARCHAR) END AS text_fixed,
             rn0 % 2 = 0 AS changed
      FROM o ORDER BY id"""))(
      (s, d) => {
        import graft.functions.TextFunctions
        def mangle(x: String): String =
          new String(x.getBytes("UTF-8"), "windows-1252")
        val once = mangle("café € naïve #")
        val twice = mangle(once) // stacked: two repair rounds
        val in = orderedKeys(s, d, 200)
          .select($"doc_id",
            when($"rn0" % 2 === 0,
              concat(lit(""), when($"rn0" % 4 === 0, twice).otherwise(once),
                $"rn0".cast("string")))
              .otherwise(concat(lit("clean ascii #"), $"rn0".cast("string")))
              .as("text"))
        TextFunctions.fixMojibakeFlat(in, "doc_id", "text")
          .select($"id", $"text_fixed", $"changed")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- token-budget chunking
    // chunkByTokens under a real vocabulary: every doc is W copies of one
    // "ab"*k word (ceil(k/2) tokens each under the planted merges), so
    // greedy packing has the closed form words-per-chunk = budget//cost —
    // the oracle regenerates every chunk row, text included.
    Q("q168_token_chunks", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120),
           d AS (SELECT o_orderkey AS id,
                        o_orderkey % 5 + 1 AS k,
                        rn0 % 6 + 3 AS w
                 FROM o),
           p AS (SELECT id, k, w, (k + 1) // 2 AS t,
                        8 // ((k + 1) // 2) AS wpc
                 FROM d),
           c AS (SELECT id, k, w, t, wpc,
                        (w + wpc - 1) // wpc AS n_chunks
                 FROM p)
      SELECT id, CAST(i AS INTEGER) AS chunk_idx,
             least(wpc, w - i * wpc) * t AS n_tokens,
             rtrim(repeat(repeat('ab', CAST(k AS INT)) || ' ',
                          CAST(least(wpc, w - i * wpc) AS INT))) AS chunk
      FROM c, UNNEST(range(n_chunks)) AS r(i)
      ORDER BY id, chunk_idx"""))(
      (s, d) => {
        import graft.functions.HfTokenizer
        val spec = HfTokenizer.parse(
          """{"model": {"type": "BPE", "unk_token": null,
               "vocab": {"a": 0, "b": 1, "ab": 2, "abab": 3},
               "merges": ["a b", "ab ab"]},
             "pre_tokenizer": {"type": "Whitespace"}, "normalizer": null}""")
        val in = orderedKeys(s, d, 120)
          .selectExpr("doc_id",
            """trim(repeat(concat(repeat('ab', cast(doc_id % 5 + 1 as int)),
               ' '), cast(rn0 % 6 + 3 as int))) AS text""")
        HfTokenizer.chunkByTokens(in, "doc_id", "text", spec, maxTokens = 8)
          .select($"id", $"chunk_idx", $"n_tokens", $"chunk")
          .orderBy($"id", $"chunk_idx")
      }),

    // ------------------------------------------------------- sentence segmentation
    // Rule-based splitting (terminator run + optional closing quote, then
    // whitespace): docs are planted as k sentences cycling . ! ? and one
    // quoted terminator, so the oracle regenerates every (id, idx,
    // sentence) row.
    Q("q169_sentences", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 100),
           d AS (SELECT o_orderkey AS id, rn0 % 4 + 2 AS k FROM o)
      SELECT id, CAST(i AS INTEGER) AS sentence_idx,
             'sent ' || CAST(i AS VARCHAR) || ' end' ||
             CASE CAST(i % 4 AS INTEGER) WHEN 0 THEN '.' WHEN 1 THEN '!'
                  WHEN 2 THEN '?' ELSE '."' END AS sentence
      FROM d, UNNEST(range(k)) AS r(i)
      ORDER BY id, sentence_idx"""))(
      (s, d) => {
        import graft.functions.TextFunctions
        val in = orderedKeys(s, d, 100)
          .selectExpr("doc_id",
            """array_join(transform(sequence(0, cast(rn0 % 4 + 1 as int)),
               i -> concat('sent ', i, ' end',
                 case cast(i % 4 as int) when 0 then '.' when 1 then '!'
                      when 2 then '?' else '."' end)), ' ') AS text""")
        TextFunctions.splitSentencesFlat(in, "doc_id", "text")
          .select($"id", $"sentence_idx", $"sentence")
          .orderBy($"id", $"sentence_idx")
      }),

    // ------------------------------------------------------- linear quality classifier
    // fastText-style inference: mean of md5-hashed per-token weights +
    // bias through the logistic link — pure Column expressions over the
    // same 16-bit digest the samplers use, so DuckDB recomputes every
    // probability from the planted three-token docs.
    Q("q170_linear_score", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 200),
           t AS (SELECT o_orderkey AS id,
                        'alpha' AS t1,
                        'beta' || CAST(rn0 AS VARCHAR) AS t2,
                        'gamma' AS t3
                 FROM o),
           h AS (SELECT id, t1, t2, t3,
             ((strpos('0123456789abcdef', substr(md5(t1), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(t1), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(t1), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(t1), 4, 1)) - 1)) % 16 AS b1,
             ((strpos('0123456789abcdef', substr(md5(t2), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(t2), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(t2), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(t2), 4, 1)) - 1)) % 16 AS b2,
             ((strpos('0123456789abcdef', substr(md5(t3), 1, 1)) - 1) * 4096
            + (strpos('0123456789abcdef', substr(md5(t3), 2, 1)) - 1) * 256
            + (strpos('0123456789abcdef', substr(md5(t3), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(t3), 4, 1)) - 1)) % 16 AS b3
             FROM t),
           sc AS (SELECT id,
             -0.2 + ((b1 * 0.125 - 1.0) + (b2 * 0.125 - 1.0)
                     + (b3 * 0.125 - 1.0)) / 3 AS score
             FROM h)
      SELECT id, round(score, 6) AS score,
             round(1.0 / (1.0 + exp(-score)), 6) AS keep_prob
      FROM sc ORDER BY id"""))(
      (s, d) => {
        import graft.functions.TextFunctions
        val weights = (0 until 16).map(j => j * 0.125 - 1.0)
        val in = orderedKeys(s, d, 200)
          .select($"doc_id".as("id"),
            concat(lit("alpha beta"), $"rn0".cast("string"),
              lit(" gamma")).as("text"))
        in.select($"id",
            round(TextFunctions.linearTextScore($"text", weights, bias = -0.2),
              6).as("score"),
            round(TextFunctions.linearTextProb($"text", weights, bias = -0.2),
              6).as("keep_prob"))
          .orderBy($"id")
      }),

    // ------------------------------------------------------- multimodal: MP3 frame probe
    // Speech-corpus blobs yield sample rate / channels / duration from the
    // MPEG frame headers alone; the oracle recomputes the planted
    // parameters (1152 samples per MPEG-1 frame, 576 for MPEG-2).
    Q("q116_mp3_meta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
      p AS (SELECT rn0,
                   CASE WHEN rn0 % 3 = 0 THEN 44100
                        WHEN rn0 % 3 = 1 THEN 22050 ELSE 8000 END AS rate,
                   CASE WHEN rn0 % 2 = 0 THEN 2 ELSE 1 END AS chans,
                   CASE WHEN rn0 % 3 = 0 THEN 128
                        WHEN rn0 % 3 = 1 THEN 64 ELSE 16 END AS kbps,
                   CAST(10 + o_orderkey % 90 AS BIGINT) AS frames
            FROM o)
      SELECT rn0 AS id, rate AS sample_rate, chans AS channels,
             kbps AS bitrate_kbps, frames,
             CAST(frames AS DOUBLE)
               * (CASE WHEN rate = 44100 THEN 1152 ELSE 576 END) / rate
               AS duration_sec
      FROM p ORDER BY id"""))(
      (s, d) => {
        import graft.operators.Mp3
        val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(60)
          .select(($"o_orderkey" % 90).cast("long"))
          .collect().map(_.getLong(0))
        val rows = params.zipWithIndex.map { case (k, i) =>
          val rate = if (i % 3 == 0) 44100 else if (i % 3 == 1) 22050 else 8000
          val chans = if (i % 2 == 0) 2 else 1
          val kbps = if (i % 3 == 0) 128 else if (i % 3 == 1) 64 else 16
          (i.toLong, Mp3.writeStub(rate, chans, kbps, frames = (10 + k).toInt,
            xing = i % 4 == 0, id3Bytes = if (i % 5 == 0) 120 else 0))
        }.toSeq
        Mp3.mp3Meta(s.createDataFrame(rows).toDF("id", "payload"),
            "id", "payload")
          .select($"id", $"sample_rate", $"channels", $"bitrate_kbps",
            $"frames", $"duration_sec")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- multimodal: FLAC STREAMINFO probe
    // Lossless speech corpora (LibriSpeech) ship FLAC; STREAMINFO alone
    // yields rate/channels/bits and the EXACT duration.
    Q("q117_flac_meta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
      p AS (SELECT rn0,
                   CASE WHEN rn0 % 2 = 0 THEN 16000 ELSE 44100 END AS rate,
                   CAST(1 + rn0 % 2 AS INT) AS chans,
                   CAST(16000 + (o_orderkey % 997) * 160 AS BIGINT) AS samples
            FROM o)
      SELECT rn0 AS id, rate AS sample_rate, chans AS channels,
             16 AS bits_per_sample, samples AS total_samples,
             CAST(samples AS DOUBLE) / rate AS duration_sec
      FROM p ORDER BY id"""))(
      (s, d) => {
        import graft.operators.Flac
        val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(60)
          .select(($"o_orderkey" % 997).cast("long"))
          .collect().map(_.getLong(0))
        val rows = params.zipWithIndex.map { case (k, i) =>
          val rate = if (i % 2 == 0) 16000 else 44100
          (i.toLong, Flac.writeStub(rate, 1 + i % 2, 16, 16000 + k * 160))
        }.toSeq
        Flac.flacMeta(s.createDataFrame(rows).toDF("id", "payload"),
            "id", "payload")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- multimodal: OGG/Opus probe
    // Opus granules always count 48 kHz samples (RFC 7845); duration =
    // (last granule - pre-skip) / 48000 regardless of the input rate.
    Q("q118_ogg_meta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
      p AS (SELECT rn0,
                   CASE WHEN rn0 % 2 = 0 THEN 16000 ELSE 48000 END AS rate,
                   CAST(1 + rn0 % 2 AS INT) AS chans,
                   CAST(4800 + (o_orderkey % 997) * 480 AS BIGINT) AS granule
            FROM o)
      SELECT rn0 AS id, 'opus' AS codec, rate AS sample_rate,
             chans AS channels, 312 AS pre_skip,
             granule - 312 AS total_samples,
             CAST(granule - 312 AS DOUBLE) / 48000 AS duration_sec
      FROM p ORDER BY id"""))(
      (s, d) => {
        import graft.operators.Ogg
        val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(60)
          .select(($"o_orderkey" % 997).cast("long"))
          .collect().map(_.getLong(0))
        val rows = params.zipWithIndex.map { case (k, i) =>
          val rate = if (i % 2 == 0) 16000 else 48000
          (i.toLong, Ogg.writeStub("opus", rate, 1 + i % 2,
            granule = 4800 + k * 480, preSkip = 312))
        }.toSeq
        Ogg.oggMeta(s.createDataFrame(rows).toDF("id", "payload"),
            "id", "payload")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- text: Unicode script composition
    // The multilingual pre-filter: per-document script fractions +
    // dominant script over planted Cyrillic/Han/Arabic suffixes; the
    // oracle recounts every class with RE2 \p{Script} regexes, an
    // independent implementation of the Unicode script property.
    Q("q119_script_stats", Some("""
      WITH d AS (SELECT doc_id,
                        text || CASE CAST(doc_id % 4 AS INT)
                          WHEN 0 THEN ' Привет мир'
                          WHEN 1 THEN ' 你好世界 123'
                          WHEN 2 THEN ' مرحبا'
                          ELSE ' hello' END AS t
                 FROM documents),
      c AS (SELECT doc_id, CAST(length(t) AS BIGINT) AS n,
                   length(regexp_replace(t, '[^\p{Latin}]', '', 'g')) AS lat,
                   length(regexp_replace(t, '[^\p{Cyrillic}]', '', 'g')) AS cyr,
                   length(regexp_replace(t, '[^\p{Han}]', '', 'g')) AS han,
                   length(regexp_replace(t, '[^\p{Arabic}]', '', 'g')) AS ar,
                   length(regexp_replace(t, '[^0-9]', '', 'g')) AS dg,
                   length(regexp_replace(t, '\S', '', 'g')) AS sp
            FROM d)
      SELECT doc_id, n AS n_codepoints,
             CAST(lat AS DOUBLE) / n AS frac_latin,
             CAST(cyr AS DOUBLE) / n AS frac_cyrillic,
             CAST(han AS DOUBLE) / n AS frac_han,
             CAST(ar AS DOUBLE) / n AS frac_arabic,
             CAST(dg AS DOUBLE) / n AS frac_digit,
             CAST(sp AS DOUBLE) / n AS frac_space,
             CASE WHEN lat = 0 AND cyr = 0 AND han = 0 AND ar = 0 THEN 'none'
                  WHEN lat >= cyr AND lat >= han AND lat >= ar THEN 'latin'
                  WHEN cyr >= han AND cyr >= ar THEN 'cyrillic'
                  WHEN han >= ar THEN 'han'
                  ELSE 'arabic' END AS dominant_script
      FROM c ORDER BY doc_id"""))(
      (s, d) => {
        val derived = Tables.documents(s, d).select($"doc_id",
          concat($"text", expr("""CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN ' Привет мир'
            WHEN 1 THEN ' 你好世界 123'
            WHEN 2 THEN ' مرحبا'
            ELSE ' hello' END""")).as("t"))
        graft.functions.TextFunctions.scriptStats(derived, "doc_id", "t")
          .select($"doc_id", $"n_codepoints", $"frac_latin", $"frac_cyrillic",
            $"frac_han", $"frac_arabic", $"frac_digit", $"frac_space",
            $"dominant_script")
          .orderBy($"doc_id")
      }),

    // ------------------------------------------------------- dedup: MinHash signatures
    Q("q30_minhash_sig", Some(s"""
      WITH ${shingleCte("documents")}
      SELECT doc_id,
             $sigSelect
      FROM sh GROUP BY doc_id ORDER BY doc_id"""))(
      (s, d) => {
        val sig = Dedup.md5MinhashSignature($"text", MinhashSlots)
        Tables.documents(s, d)
          .filter(size(Dedup.tokens($"text")) >= 3)
          .select(($"doc_id" +: (0 until MinhashSlots).map(k =>
            element_at(sig, k + 1).as(s"sig_$k"))): _*)
          .orderBy($"doc_id")
      }),

    // ------------------------------------------------------- dedup: full LSH near-dup pipeline
    Q("q31_minhash_near_dups", Some(s"""
      WITH corpus AS ($corpusSql),
      ${shingleCte("corpus")},
      sig AS (SELECT doc_id,
             $sigSelect
             FROM sh GROUP BY doc_id),
      bands AS (
        ${(0 until Bands).map(b =>
          s"SELECT doc_id, $b AS band, md5(sig_${b * RowsPerBand} || ',' || sig_${b * RowsPerBand + 1}) AS bucket FROM sig")
          .mkString("\n        UNION ALL\n        ")}),
      cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
               WHERE a.doc_id < b.doc_id),
      sets AS (SELECT doc_id, list_distinct(list(s)) AS shs FROM sh GROUP BY doc_id),
      verified AS (
        SELECT id_a, id_b,
               len(list_intersect(sa.shs, sb.shs))::DOUBLE
                 / greatest(len(list_distinct(list_concat(sa.shs, sb.shs))), 1) AS j
        FROM cand
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b)
      SELECT id_a, id_b, round(j, 6) AS jaccard
      FROM verified WHERE j >= 0.5
      ORDER BY id_a, id_b"""))(
      (s, d) =>
        // The fully relational library pipeline (Dedup doc explains why the
        // array-HOF formulation is ~10x slower); md5 hashing keeps it
        // bit-identical to the DuckDB oracle.
        Dedup.minhashNearDupsRelational(corpus(s, d), "doc_id", "text",
            numHashes = MinhashSlots, bands = Bands, shingleSize = 3, threshold = 0.5)
          .orderBy($"id_a", $"id_b")),

    // ------------------------------------------------------- dedup: SimHash-16 fingerprint
    Q("q32_simhash16", Some(s"""
      WITH tok AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
      h AS (SELECT doc_id,
                   (strpos('0123456789abcdef', substr(md5(t), 1, 1)) - 1) * 4096
                 + (strpos('0123456789abcdef', substr(md5(t), 2, 1)) - 1) * 256
                 + (strpos('0123456789abcdef', substr(md5(t), 3, 1)) - 1) * 16
                 + (strpos('0123456789abcdef', substr(md5(t), 4, 1)) - 1) AS hv
            FROM tok),
      bits AS (SELECT doc_id, j,
                      sum(CASE WHEN (hv // CAST(power(2, j) AS INTEGER)) % 2 = 1
                               THEN 1 ELSE -1 END) AS c
               FROM h, (SELECT unnest(generate_series(0, 15)) AS j)
               GROUP BY doc_id, j)
      SELECT doc_id,
             CAST(sum(CASE WHEN c > 0 THEN power(2, j) ELSE 0 END) AS BIGINT) AS fp16
      FROM bits GROUP BY doc_id ORDER BY doc_id"""))(
      (s, d) => {
        def nib(t: Column, k: Int): Column =
          instr(lit("0123456789abcdef"), substring(md5(t), k, 1)) - 1
        def hv(t: Column): Column =
          nib(t, 1) * 4096 + nib(t, 2) * 256 + nib(t, 3) * 16 + nib(t, 4)
        def bitPm(t: Column, j: Int): Column =
          ((hv(t).divide(lit(1 << j))).cast("int") % 2) * 2 - 1
        val toks = Dedup.tokens($"text")
        val counters = (0 until 16).map(j =>
          aggregate(toks, lit(0), (acc, t) => acc + bitPm(t, j)))
        val fp = (0 until 16).map(j =>
          when(counters(j) > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
        Tables.documents(s, d)
          .select($"doc_id", fp.as("fp16"))
          .orderBy($"doc_id")
      }),

    // ------------------------------------------------------- similarity: hyperplane LSH buckets
    Q("q33_ann_lsh_buckets", Some("""
      WITH planes AS (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv
                      FROM embeddings WHERE vec_id BETWEEN 1 AND 4),
      b AS (SELECT e.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.pv) > 0
                            THEN power(2, p.pid - 1) ELSE 0 END) AS BIGINT) AS bucket
            FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id)
      SELECT bucket, count(*) AS n, min(vec_id) AS min_id
      FROM b GROUP BY bucket ORDER BY bucket"""))(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val planes = collectPlanes(emb, 1 to 4)
        emb.withColumn("bucket", Similarity.hyperplaneBucket($"embedding", planes))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"), min($"vec_id").as("min_id"))
          .orderBy($"bucket")
      }),

    // ------------------------------------------------------- similarity: IVF cell assignment
    Q("q34_ivf_cells", Some("""
      WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                 FROM embeddings WHERE vec_id BETWEEN 5 AND 8),
      z AS (SELECT e.vec_id, c.cid, unnest(e.embedding)::DOUBLE AS x, unnest(c.cv) AS y
            FROM embeddings e CROSS JOIN c),
      dist AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2
               FROM z GROUP BY vec_id, cid),
      r AS (SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
            FROM dist)
      SELECT cid AS cell, count(*) AS n, min(vec_id) AS min_id
      FROM r WHERE rn = 1 GROUP BY cell ORDER BY cell"""))(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val centroids = collectPlanes(emb, 5 to 8)
        emb.withColumn("cell",
            Similarity.ivfCell($"embedding", centroids) + 5)
          .groupBy($"cell")
          .agg(count(lit(1)).as("n"), min($"vec_id").as("min_id"))
          .orderBy($"cell")
      }),

    // ------------------------------------------------------- text: quality filter pipeline
    Q("q35_quality_filter", Some("""
      WITH scored AS (
        SELECT source,
               round((least(length(text)/500.0, 1.0)
                 + least((length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE
                          / greatest(length(text), 1)) * 20, 1.0)
                 + least((len(regexp_extract_all(text, '\b(the|a|of|and|to|in|is)\b'))::DOUBLE
                          / greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                     ELSE len(string_split_regex(trim(text), '\s+')) END, 1)) * 5,
                         1.0)) / 3.0, 6) AS quality
        FROM documents)
      SELECT source, count(*) AS n_kept, round(avg(quality), 6) AS avg_quality
      FROM scored WHERE quality >= 0.4
      GROUP BY source ORDER BY source"""))(
      (s, d) => {
        import graft.functions.{TextFunctions => TF}
        Tables.documents(s, d)
          .withColumn("quality", TF.qualityScore($"text"))
          .filter($"quality" >= 0.4)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), round(avg($"quality"), 6).as("avg_quality"))
          .orderBy($"source")
      }),

    // ------------------------------------------------------- dedup: representative selection on planted corpus
    Q("q36_dedup_reps", Some(s"""
      WITH corpus AS ($corpusSql),
      groups AS (SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_cnt
                 FROM corpus GROUP BY 1)
      SELECT count(*) AS n_groups,
             CAST(sum(dup_cnt - 1) AS BIGINT) AS n_dropped,
             CAST(sum(CASE WHEN dup_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
      FROM groups"""))(
      (s, d) => Dedup.exact(corpus(s, d), "text", "doc_id")
        .agg(count(lit(1)).as("n_groups"),
          sum($"dup_cnt" - 1).as("n_dropped"),
          sum(when($"dup_cnt" > 1, 1L).otherwise(0L)).as("n_dup_groups"))),

    // ------------------------------------------------------- ST3 R12: shard assignment for rate-limited sinks
    Q("q37_shard_assign", Some("""
      SELECT event_id % 5 AS shard,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n, round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))(
      (s, d) => Tables.events(s, d)
        .groupBy(($"event_id" % 5).as("shard"),
          date_trunc("DAY", $"ts").cast("timestamp_ntz").as("day"))
        .agg(count(lit(1)).as("n"), round(sum($"value"), 6).as("sum_value"))
        .orderBy($"shard", $"day")),

    // ------------------------------------------------------- R8 R10: splitter enumeration + path templating
    Q("q38_split_enumerate", Some("""
      SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             'out/' || event_type || '/' || strftime(date_trunc('day', ts), '%Y-%m-%d')
               || '.parquet' AS output_path,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2"""))(
      (s, d) => {
        val enriched = Tables.events(s, d)
          .withColumn("day", date_format(date_trunc("DAY", $"ts"), "yyyy-MM-dd"))
        val counted = enriched.groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
        Splitter.withOutputPaths(counted, "out/{event_type}/{day}.parquet")
          .select($"event_type", $"day", $"output_path", $"n")
          .orderBy($"event_type", $"day")
      }),

    // ------------------------------------------------------- J2 S3: unpivot -> channel merge round-trip
    Q("q39_channel_merge", Some(s"""
      WITH grid AS (${Queries.gridSql}),
      g AS (SELECT * FROM grid
            WHERE latitude BETWEEN 30 AND 50 AND longitude BETWEEN -10 AND 30),
      long AS (
        SELECT l_orderkey, l_linenumber, 'temperature' AS channel, temperature AS value FROM g
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'humidity' AS channel, humidity AS value FROM g)
      SELECT l_orderkey, l_linenumber,
             round(max(CASE WHEN channel = 'temperature' THEN value END), 6) AS temperature,
             round(max(CASE WHEN channel = 'humidity' THEN value END), 6) AS humidity
      FROM long GROUP BY 1, 2 ORDER BY 1, 2"""))(
      (s, d) => {
        val g = Queries.grid(s, d)
          .filter($"latitude".between(30, 50) && $"longitude".between(-10, 30))
        val long = g.selectExpr("l_orderkey", "l_linenumber",
          "stack(2, 'temperature', temperature, 'humidity', humidity) AS (channel, value)")
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem,
        // so the merge must combine deterministically: max, mirroring the oracle
        Mover.mergeChannels(long, Seq("l_orderkey", "l_linenumber"),
            "channel", "value", Seq("temperature", "humidity"), max(_))
          .select($"l_orderkey", $"l_linenumber",
            round($"temperature", 6).as("temperature"),
            round($"humidity", 6).as("humidity"))
          .orderBy($"l_orderkey", $"l_linenumber")
      })
  ) ++ Seq(regridQ, nearestQ, bilinearQ, matchDtQ, packedQ, haversineQ, sessionizeQ,
    embDupQ, corpusStatsQ, hashSampleQ, stratifiedCapQ, decontaminateQ,
    repetitionQ, quantizeQ, imageDupsQ, audioQ, piiQ, domainQ,
    semDedupQ, dupShingleQ, tfidfQ, lmQualityQ, packQ,
    chunkQ, domainCapQ, vocabQ, ccQ, mixQ, pqQ, adcQ, bpeQ, bpeEncodeQ, dsirQ,
    deaccumQ, climQ, spansQ, gopherQ, cutQ, curriculumQ, canonQ, recipeQ,
    pcaPqQ, ivfpqQ)

  // ------------------------------------------------------- pipeline: end-to-end recipe accounting
  // A full preprocessing recipe composed from the library's own operators —
  // Gopher rules -> deterministic 50% sample -> per-source cap (100, md5
  // order) — with the per-stage survivor accounting every corpus report
  // publishes. Each stage is the exact operator other queries verify alone;
  // this one verifies the COMPOSITION.
  private lazy val recipeQ = Q("q91_recipe_stages", Some(s"""
      WITH b AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nw,
               length(regexp_replace(trim(text), '\\s+', '', 'g')) AS chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                         x -> regexp_matches(x, '[A-Za-z]'))) END AS aw,
               length(text) - length(replace(text, '#', '')) AS hashes
        FROM documents),
      g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                  FROM (SELECT doc_id, $toksSql AS t FROM documents)
                  WHERE len(t) >= 2)),
      r AS (SELECT doc_id, 1 - CAST(count(DISTINCT s) AS DOUBLE) / count(*) AS dup2
            FROM g GROUP BY doc_id),
      kept AS (SELECT b.doc_id, b.source FROM b LEFT JOIN r USING (doc_id)
               WHERE b.nw BETWEEN 50 AND 100000
                 AND b.nw > 0 AND b.chars::DOUBLE / b.nw BETWEEN 3 AND 10
                 AND b.aw::DOUBLE / b.nw >= 0.8
                 AND b.hashes::DOUBLE / b.nw <= 0.1
                 AND COALESCE(r.dup2, 0) <= 0.3),
      sampled AS (SELECT doc_id, source FROM kept
                  WHERE ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
                       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
                       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1))
                      < CAST(round(0.5 * 65536) AS INT)),
      capped AS (SELECT doc_id FROM (
                   SELECT doc_id, row_number() OVER (PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
                   FROM sampled) WHERE rn <= 100)
      SELECT * FROM (
        SELECT 0 AS stage, 'all' AS name, count(*) AS n_docs FROM documents
        UNION ALL SELECT 1, 'gopher_keep', count(*) FROM kept
        UNION ALL SELECT 2, 'hash_sample_50', count(*) FROM sampled
        UNION ALL SELECT 3, 'source_cap_100', count(*) FROM capped)
      ORDER BY stage"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      import graft.operators.Sampling
      import org.apache.spark.sql.expressions.Window
      // ONE corpus pass: stage membership rides as boolean columns instead
      // of four count branches (the union-of-aggs form recomputed the
      // Gopher chain 3x — at 100 TB, two wasted full-corpus scans). The
      // flags are the SAME operators other queries verify alone: the
      // per-row Gopher rules (carried `source`, so no re-join), the
      // hashSample predicate (same md5Bucket16 expression + rate literal),
      // and the stratifiedCap window — partitioned by (source, samp) so
      // sampled rows rank exactly as the cap-on-sampled-only would.
      val docs = Tables.documents(s, d)
      val flagged = TF.gopherQualityRulesFlat(docs, "doc_id", "text",
          carry = Seq("source"))
        .withColumn("samp", $"keep" === 1 &&
          Sampling.md5Bucket16($"id".cast("string")) < math.round(0.5 * 65536).toInt)
      val w = Window.partitionBy($"source", $"samp")
        .orderBy(md5($"id".cast("string")), $"id".cast("string"))
      flagged
        .withColumn("rn", row_number().over(w))
        .withColumn("cap", $"samp" && $"rn" <= 100)
        .agg(count(lit(1)).as("n0"),
          sum(when($"keep" === 1, 1L).otherwise(0L)).as("n1"),
          sum(when($"samp", 1L).otherwise(0L)).as("n2"),
          sum(when($"cap", 1L).otherwise(0L)).as("n3"))
        .select(expr("stack(4, 0, 'all', n0, 1, 'gopher_keep', n1, " +
          "2, 'hash_sample_50', n2, 3, 'source_cap_100', n3) AS (stage, name, n_docs)"))
        .orderBy($"stage")
    })

  // ------------------------------------------------------- dedup: canonical per cluster
  // The keep-one materialization after q77's cluster closure: longest doc
  // (n_chars, doc_id tie-break) survives each cluster; per-cluster size.
  private lazy val canonQ = Q("q90_canonical_docs", Some("""
      WITH RECURSIVE e1 AS (
        SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
        WHERE doc_id % 10 < 3
          AND EXISTS (SELECT 1 FROM documents d2 WHERE d2.doc_id = documents.doc_id + 1)),
      e AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
      reach AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
      m AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src),
      lab AS (SELECT d.doc_id, d.n_chars,
                     LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster
              FROM documents d LEFT JOIN m ON m.src = d.doc_id),
      r AS (SELECT doc_id, n_chars, cluster,
                   row_number() OVER (PARTITION BY cluster
                                      ORDER BY n_chars DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY cluster) AS n_members
            FROM lab)
      SELECT cluster, doc_id AS keep_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(n_members AS BIGINT) AS n_members
      FROM r WHERE rn = 1 ORDER BY cluster"""))(
    (s, d) => {
      val docs = Tables.documents(s, d)
      val ids = docs.select($"doc_id")
      val e1 = ids.filter($"doc_id" % 10 < 3)
        .select($"doc_id".as("id_a"), ($"doc_id" + 1).as("id_b"))
        .join(ids.select($"doc_id".as("id_b")), Seq("id_b"), "left_semi")
      val labels = Dedup.connectedComponents(ids, "doc_id", e1)
      val sizes = labels.groupBy($"cluster").agg(count(lit(1)).as("n_members"))
      Dedup.canonicalPerCluster(labels, docs.select($"doc_id", $"n_chars"),
          "doc_id", "n_chars")
        .join(sizes, Seq("cluster"))
        .select($"cluster", $"doc_id".as("keep_id"), $"n_chars", $"n_members")
        .orderBy($"cluster")
    })

  // ------------------------------------------------------- sampling: curriculum buckets
  // Short-to-long curriculum: quintile tiers of token count via exact
  // quantile thresholds (Spark `percentile` ≡ DuckDB `quantile_cont`, the
  // q47 equivalence); per-tier doc counts and score band.
  private lazy val curriculumQ = Q("q89_curriculum", Some("""
      WITH s AS (SELECT doc_id,
                        CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                             ELSE len(string_split_regex(trim(text), '\s+')) END
                             AS DOUBLE) AS score
                 FROM documents),
      t AS (SELECT quantile_cont(score, [0.2, 0.4, 0.6, 0.8]) AS th FROM s),
      b AS (SELECT doc_id, score,
                   (CASE WHEN score > th[1] THEN 1 ELSE 0 END
                  + CASE WHEN score > th[2] THEN 1 ELSE 0 END
                  + CASE WHEN score > th[3] THEN 1 ELSE 0 END
                  + CASE WHEN score > th[4] THEN 1 ELSE 0 END) AS bucket
            FROM s, t)
      SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
             round(min(score), 6) AS min_score, round(max(score), 6) AS max_score,
             min(doc_id) AS first_doc
      FROM b GROUP BY bucket ORDER BY bucket"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      import graft.operators.Sampling
      val scored = Tables.documents(s, d)
        .select($"doc_id", TF.tokenCount($"text").cast("double").as("score"))
      Sampling.curriculumBuckets(scored, "score", k = 5)
        .groupBy($"bucket".cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          round(min($"score"), 6).as("min_score"),
          round(max($"score"), 6).as("max_score"),
          min($"doc_id").as("first_doc"))
        .orderBy($"bucket")
    })

  // ------------------------------------------------------- dedup: cut duplicated spans
  // The apply half of q86: remove every token inside a duplicated span,
  // re-join the survivors per doc (md5'd for the hash compare).
  private lazy val cutQ = Q("q88_cut_spans", Some(s"""
      WITH corpus AS ($corpusSql),
      toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
      sh AS (SELECT doc_id, CAST(i AS INT) AS pos, array_to_string(t[i:i+2], ' ') AS s
             FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                   FROM toks WHERE len(t) >= 3)),
      c AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
      m AS (SELECT doc_id, pos FROM sh JOIN c USING (s)),
      g AS (SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                        OR pos > lag(pos) OVER w + 3 THEN 1 ELSE 0 END AS brk
            FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      i AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM g),
      spans AS (SELECT doc_id, min(pos) AS start_tok, max(pos) + 2 AS end_tok
                FROM i GROUP BY doc_id, grp),
      tok AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, t[j] AS w
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS j
                    FROM toks)),
      kept AS (SELECT tok.doc_id, pos, w FROM tok
               WHERE NOT EXISTS (SELECT 1 FROM spans s
                                 WHERE s.doc_id = tok.doc_id
                                   AND tok.pos BETWEEN s.start_tok AND s.end_tok))
      SELECT doc_id, count(*) AS n_kept,
             md5(string_agg(w, ' ' ORDER BY pos)) AS clean_md5
      FROM kept GROUP BY doc_id ORDER BY doc_id"""))(
    (s, d) =>
      Dedup.removeDupSpans(corpus(s, d), "doc_id", "text", n = 3, minCount = 2)
        .select($"id".as("doc_id"), $"n_kept", md5($"clean_text").as("clean_md5"))
        .orderBy($"doc_id"))

  // ------------------------------------------------------- text: Gopher quality-rule verdict
  // The canonical pre-training rule filter: per-rule flags + conjunction.
  private lazy val gopherQ = Q("q87_gopher_rules", Some(s"""
      WITH b AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS nw,
               length(regexp_replace(trim(text), '\\s+', '', 'g')) AS chars,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(list_filter(string_split_regex(trim(text), '\\s+'),
                                         x -> regexp_matches(x, '[A-Za-z]'))) END AS aw,
               length(text) - length(replace(text, '#', '')) AS hashes
        FROM documents),
      g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                  FROM (SELECT doc_id, $toksSql AS t FROM documents)
                  WHERE len(t) >= 2)),
      r AS (SELECT doc_id, 1 - CAST(count(DISTINCT s) AS DOUBLE) / count(*) AS dup2
            FROM g GROUP BY doc_id),
      x AS (SELECT b.doc_id, b.nw,
              CASE WHEN b.nw BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_words,
              CASE WHEN b.nw > 0 AND b.chars::DOUBLE / b.nw BETWEEN 3 AND 10
                   THEN 1 ELSE 0 END AS r_mean_len,
              CASE WHEN b.nw > 0 AND b.aw::DOUBLE / b.nw >= 0.8
                   THEN 1 ELSE 0 END AS r_alpha,
              CASE WHEN b.nw > 0 AND b.hashes::DOUBLE / b.nw <= 0.1
                   THEN 1 ELSE 0 END AS r_symbol,
              CASE WHEN COALESCE(r.dup2, 0) <= 0.3 THEN 1 ELSE 0 END AS r_dup
            FROM b LEFT JOIN r USING (doc_id))
      SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
             CAST(r_words AS BIGINT) AS r_words,
             CAST(r_mean_len AS BIGINT) AS r_mean_len,
             CAST(r_alpha AS BIGINT) AS r_alpha,
             CAST(r_symbol AS BIGINT) AS r_symbol,
             CAST(r_dup AS BIGINT) AS r_dup,
             CAST(r_words * r_mean_len * r_alpha * r_symbol * r_dup AS BIGINT) AS keep
      FROM x ORDER BY doc_id"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      TF.gopherQualityRules(Tables.documents(s, d), "doc_id", "text")
        .select($"id".as("doc_id"), $"n_words", $"r_words", $"r_mean_len",
          $"r_alpha", $"r_symbol", $"r_dup", $"keep")
        .orderBy($"doc_id")
    })

  // ------------------------------------------------------- dedup: exact-substring spans
  // Lee et al. ExactSubstr semantics relationally: maximal ≥3-token spans
  // whose shingles occur ≥2 times corpus-wide, over the planted-dup corpus.
  private lazy val spansQ = Q("q86_dup_spans", Some(s"""
      WITH corpus AS ($corpusSql),
      toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
      sh AS (SELECT doc_id, CAST(i AS INT) AS pos, array_to_string(t[i:i+2], ' ') AS s
             FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                   FROM toks WHERE len(t) >= 3)),
      c AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 2),
      m AS (SELECT doc_id, pos FROM sh JOIN c USING (s)),
      g AS (SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                        OR pos > lag(pos) OVER w + 3 THEN 1 ELSE 0 END AS brk
            FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      i AS (SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS grp
            FROM g)
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_tok,
             CAST(max(pos) + 2 AS BIGINT) AS end_tok, count(*) AS n_dup_shingles
      FROM i GROUP BY doc_id, grp
      ORDER BY doc_id, start_tok"""))(
    (s, d) =>
      Dedup.dupSpans(corpus(s, d), "doc_id", "text", n = 3, minCount = 2)
        .select($"id".as("doc_id"), $"start_tok", $"end_tok", $"n_dup_shingles")
        .orderBy($"doc_id", $"start_tok"))

  // ------------------------------------------------------- weather: forecast de-accumulation
  // eccodes' stepRange differencing for accumulated products (total
  // precipitation): per-key ordered difference, negative diff = new
  // accumulation cycle yields the raw value.
  private lazy val deaccumQ = Q("q84_deaccumulate", Some("""
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
      d AS (SELECT user_id, event_id, ts_us, value,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_id) AS prev
            FROM e)
      SELECT user_id, event_id, ts_us,
             round(CASE WHEN prev IS NULL OR value < prev THEN value
                        ELSE value - prev END, 6) AS step_value
      FROM d ORDER BY user_id, ts_us, event_id"""))(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"), $"value")
      Mover.deaccumulate(ev, Seq("user_id"), Seq("ts_us", "event_id"), "value")
        .select($"user_id", $"event_id", $"ts_us",
          round($"step_value", 6).as("step_value"))
        .orderBy($"user_id", $"ts_us", $"event_id")
    })

  // ------------------------------------------------------- weather: climatology + anomaly
  // Hour-of-day climatology per event_type (the events-table stand-in for
  // grid-cell × day-of-year over years); anomaly = value - clim. The
  // climatology is one keys-sized hash agg broadcast back — the corpus
  // never shuffles.
  private lazy val climQ = Q("q85_climatology", Some("""
      WITH e AS (SELECT event_id, event_type,
                        CAST(extract(hour FROM ts) AS BIGINT) AS hh, value
                 FROM events),
      c AS (SELECT event_type, hh, avg(value) AS clim FROM e GROUP BY 1, 2)
      SELECT e.event_id, e.event_type, e.hh,
             round(c.clim, 6) AS clim, round(e.value - c.clim, 6) AS anomaly
      FROM e JOIN c USING (event_type, hh) ORDER BY e.event_id"""))(
    (s, d) => {
      val ev = Tables.events(s, d)
        .select($"event_id", $"event_type", hour($"ts").cast("long").as("hh"), $"value")
      Mover.climatologyAnomaly(ev, Seq($"event_type", $"hh"), "value")
        .select($"event_id", $"event_type", $"hh",
          round($"clim", 6).as("clim"), round($"anomaly", 6).as("anomaly"))
        .orderBy($"event_id")
    })

  // ------------------------------------------------------- sampling: DSIR importance weights
  // Importance weights toward the doc_id % 7 == 0 "target domain" (the q72
  // clean-subset convention): per-doc log-ratio of Laplace-smoothed hashed
  // unigram distributions, 64 md5 buckets.
  private lazy val dsirQ = {
    def bSql(expr: String) =
      s"""((strpos('0123456789abcdef', substr(md5($expr), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5($expr), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5($expr), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5($expr), 4, 1)) - 1)) % 64"""
    Q("q83_dsir_weights", Some(s"""
      WITH dtok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
      d AS (SELECT doc_id, ${bSql("w")} AS b FROM dtok WHERE w <> ''),
      db AS (SELECT doc_id, b, count(*) AS c FROM d GROUP BY doc_id, b),
      cr AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM db GROUP BY b),
      ttok AS (SELECT unnest($toksSql) AS w FROM documents WHERE doc_id % 7 = 0),
      t AS (SELECT ${bSql("w")} AS b FROM ttok WHERE w <> ''),
      ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM t GROUP BY b),
      lr AS (SELECT cr.b,
               ln((COALESCE(ct.ct, 0) + 1)::DOUBLE
                  / ((SELECT CAST(sum(ct) AS BIGINT) FROM ct) + 64)::DOUBLE)
             - ln((cr.cr + 1)::DOUBLE
                  / ((SELECT CAST(sum(cr) AS BIGINT) FROM cr) + 64)::DOUBLE) AS lr
             FROM cr LEFT JOIN ct USING (b))
      SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_toks,
             round(sum(db.c * lr.lr), 6) AS dsir
      FROM db JOIN lr USING (b)
      GROUP BY db.doc_id ORDER BY db.doc_id"""))(
      (s, d) => {
        import graft.operators.Sampling
        val docs = Tables.documents(s, d)
        Sampling.dsirWeights(docs, "doc_id", "text",
            docs.filter($"doc_id" % 7 === 0), "text", buckets = 64)
          .select($"id".as("doc_id"), $"n_toks", $"dsir")
          .orderBy($"doc_id")
      })
  }

  // ------------------------------------------------------- text: BPE merge-pair statistics
  // The first iteration of BPE tokenizer training: adjacent character-pair
  // frequencies over the distinct-word table, weighted by word frequency.
  private lazy val bpeQ = Q("q82_bpe_pairs", Some("""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                    FROM documents),
      words AS (SELECT w, count(*) AS freq FROM toks
                WHERE length(w) >= 2 GROUP BY w),
      pairs AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
                FROM (SELECT w, freq,
                             unnest(generate_series(1, length(w) - 1)) AS i
                      FROM words))
      SELECT pair, CAST(sum(freq) AS BIGINT) AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair LIMIT 30"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      TF.bpePairStats(Tables.documents(s, d), "text", 30)
    })

  // ------------------------------------------------------- text: BPE train + encode
  // Full tokenizer loop: 12 merges trained iteratively over the vocabulary
  // table (one corpus pass, then O(vocabulary) per round with a 1-row
  // driver collect), applied by the compiled greedy encoder; output is the
  // corpus subword-frequency table. Iterative merge training is not
  // SQL-expressible, so the driver records rows-only; exact output is
  // pinned by a committed golden (SamplingSpec) like q62.
  private lazy val bpeEncodeQ = Q("q92_bpe_encode", None)(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      val docs = Tables.documents(s, d)
      // exact two-level trainer: one vocab aggregation + driver-local
      // incremental merge loop (the production 32k-merge architecture) —
      // greedy order identical to the iterative path, golden-pinned
      val merges = TF.bpeTrainMergesExact(docs, "text", numMerges = 12)
      TF.bpeEncode(docs, "doc_id", "text", merges)
        .select(explode($"subwords").as("subword"))
        .groupBy($"subword").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"subword")
        .limit(50)
    })

  // ------------------------------------------------------- similarity: PQ ADC top-k search
  // The search half of IVF-PQ: query vec_id=1 stays uncompressed; the corpus
  // is searched through its PQ codes alone (two table lookups + one add per
  // row). The oracle recomputes code assignment AND the per-subspace
  // query-to-centroid distance tables from the same embeddings.
  private lazy val adcQ = Q("q81_pq_adc_topk", Some("""
      WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                 FROM embeddings WHERE vec_id BETWEEN 5 AND 8),
      qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 1),
      z0 AS (SELECT e.vec_id, c.cid, unnest(e.embedding[1:32])::DOUBLE AS x,
                    unnest(c.cv[1:32]) AS y
             FROM embeddings e CROSS JOIN c WHERE e.vec_id <> 1),
      d0 AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2 FROM z0 GROUP BY vec_id, cid),
      r0 AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM d0),
      a0 AS (SELECT vec_id, cid AS cell_0 FROM r0 WHERE rn = 1),
      z1 AS (SELECT e.vec_id, c.cid, unnest(e.embedding[33:64])::DOUBLE AS x,
                    unnest(c.cv[33:64]) AS y
             FROM embeddings e CROSS JOIN c WHERE e.vec_id <> 1),
      d1 AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2 FROM z1 GROUP BY vec_id, cid),
      r1 AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM d1),
      a1 AS (SELECT vec_id, cid AS cell_1 FROM r1 WHERE rn = 1),
      t0 AS (SELECT c.cid, unnest(qv.q[1:32]) AS x, unnest(c.cv[1:32]) AS y FROM c, qv),
      dt0 AS (SELECT cid, sum((x - y) * (x - y)) AS d2 FROM t0 GROUP BY cid),
      t1 AS (SELECT c.cid, unnest(qv.q[33:64]) AS x, unnest(c.cv[33:64]) AS y FROM c, qv),
      dt1 AS (SELECT cid, sum((x - y) * (x - y)) AS d2 FROM t1 GROUP BY cid)
      SELECT a0.vec_id, round(dt0.d2 + dt1.d2, 6) AS adc
      FROM a0 JOIN a1 USING (vec_id)
           JOIN dt0 ON dt0.cid = a0.cell_0
           JOIN dt1 ON dt1.cid = a1.cell_1
      ORDER BY dt0.d2 + dt1.d2, a0.vec_id LIMIT 10"""))(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // one collect serves query + codebook (ids are contiguous, ordered)
      val all8 = collectPlanes(emb, 1 to 8)
      val cb = all8.slice(4, 8)
      val query = all8.head
      Similarity.pqAdcTopK(emb.filter($"vec_id" =!= 1), "embedding", "vec_id",
          Seq(cb.map(_.slice(0, 32)), cb.map(_.slice(32, 64))), query, 10)
        .select($"vec_id", round($"adc", 6).as("adc"))
    })

  // ------------------------------------------------------- similarity: PCA -> PQ -> ADC pipeline
  // The FAISS OPQ-lite composition: whiten-project onto an offline-trained
  // rotation (a literal PcaModel — 4 Hadamard-row components over 64 dims,
  // exact-binary mean/eigenvalues so Spark and the oracle compute identical
  // doubles), then PQ-assign the 4-dim projection in two 2-dim subspaces,
  // then ADC-search against a literal query. Exercises pcaProject ->
  // pqCodes -> pqAdcTopK end-to-end under one oracle.
  private lazy val pcaPqQ = {
    val dim = 64
    val comps: Array[Array[Double]] = Array(1, 2, 4, 8).map(m =>
      Array.tabulate(dim)(i =>
        if (Integer.bitCount(i & m) % 2 == 0) 0.125 else -0.125))
    val mean = Array.tabulate(dim)(i => ((i % 5) - 2) * 0.0625)
    val eig = Array(4.0, 2.25, 1.0, 0.25)
    val sds = Array(2.0, 1.5, 1.0, 0.5) // sqrt(eig), all exact binary
    val mcs = comps.map(c => c.zip(mean).map { case (w, m) => w * m }.sum)
    val cbGrid: Seq[Seq[Float]] =
      Seq(Seq(-1f, -1f), Seq(-1f, 1f), Seq(1f, -1f), Seq(1f, 1f))
    val qry = Seq(0.25f, -0.5f, 0.75f, 0.125f)
    def arrLit(a: Array[Double]): String = a.mkString("[", ", ", "]::DOUBLE[]")
    val compVals = comps.indices.map(c =>
      s"($c, ${arrLit(comps(c))}, ${mcs(c)}, ${sds(c)})").mkString(",\n        ")
    val Seq(q0, q1, q2, q3) = qry.map(_.toDouble)
    Q("q93_pca_pq_adc", Some(s"""
      WITH comp AS (SELECT c, v, mc, sd FROM (VALUES
        $compVals) t(c, v, mc, sd)),
      zz AS (SELECT e.vec_id, comp.c, comp.mc, comp.sd,
                    unnest(e.embedding)::DOUBLE AS x, unnest(comp.v) AS y
             FROM embeddings e CROSS JOIN comp),
      z AS (SELECT vec_id, c, (sum(x * y) - mc) / sd AS zc
            FROM zz GROUP BY vec_id, c, mc, sd),
      p AS (SELECT vec_id,
                   max(CASE WHEN c = 0 THEN zc END) AS z0,
                   max(CASE WHEN c = 1 THEN zc END) AS z1,
                   max(CASE WHEN c = 2 THEN zc END) AS z2,
                   max(CASE WHEN c = 3 THEN zc END) AS z3
            FROM z GROUP BY vec_id),
      cb AS (SELECT code, u::DOUBLE AS u, w::DOUBLE AS w FROM (VALUES
        (0, -1.0, -1.0), (1, -1.0, 1.0), (2, 1.0, -1.0), (3, 1.0, 1.0)) t(code, u, w)),
      d0 AS (SELECT p.vec_id, cb.code,
                    (z0 - u) * (z0 - u) + (z1 - w) * (z1 - w) AS d2
             FROM p CROSS JOIN cb),
      r0 AS (SELECT vec_id, code, d2,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, code) AS rn
             FROM d0),
      a0 AS (SELECT vec_id, code AS code0 FROM r0 WHERE rn = 1),
      d1 AS (SELECT p.vec_id, cb.code,
                    (z2 - u) * (z2 - u) + (z3 - w) * (z3 - w) AS d2
             FROM p CROSS JOIN cb),
      r1 AS (SELECT vec_id, code, d2,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, code) AS rn
             FROM d1),
      a1 AS (SELECT vec_id, code AS code1 FROM r1 WHERE rn = 1),
      dt0 AS (SELECT code, ($q0 - u) * ($q0 - u) + ($q1 - w) * ($q1 - w) AS d2 FROM cb),
      dt1 AS (SELECT code, ($q2 - u) * ($q2 - u) + ($q3 - w) * ($q3 - w) AS d2 FROM cb)
      SELECT a0.vec_id, round(dt0.d2 + dt1.d2, 6) AS adc
      FROM a0 JOIN a1 USING (vec_id)
           JOIN dt0 ON dt0.code = a0.code0
           JOIN dt1 ON dt1.code = a1.code1
      ORDER BY dt0.d2 + dt1.d2, a0.vec_id LIMIT 10"""))(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = Similarity.PcaModel(mean, eig, comps)
        val proj = Similarity.pcaProject(emb, "embedding", model, whiten = true)
        Similarity.pqAdcTopK(proj, "pca", "vec_id", Seq(cbGrid, cbGrid), qry, 10)
          .select($"vec_id", round($"adc", 6).as("adc"))
      })
  }

  // ------------------------------------------------------- similarity: IVF-PQ residual coding
  // The actual FAISS IVFPQ layout: coarse-assign each vector to its nearest
  // centroid (embeddings 5..8, the q34 convention), PQ-encode the RESIDUAL
  // (v - centroid) in two 32-dim subspaces against codebooks from
  // embeddings 9..12, and ADC-search all cells for the query (vec_id 1)
  // through (cell, code) distance tables alone. The oracle recomputes the
  // coarse assignment, residual codes, and per-(cell, code) tables from the
  // same rows.
  private lazy val ivfpqQ = Q("q94_ivfpq_residual", Some("""
      WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                 FROM embeddings WHERE vec_id BETWEEN 5 AND 8),
      g AS (SELECT vec_id - 9 AS gid, embedding::DOUBLE[] AS gv
            FROM embeddings WHERE vec_id BETWEEN 9 AND 12),
      qv AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 1),
      e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 1),
      zc AS (SELECT e.vec_id, c.cid, unnest(e.embedding)::DOUBLE AS x, unnest(c.cv) AS y
             FROM e CROSS JOIN c),
      dc AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2 FROM zc GROUP BY vec_id, cid),
      rc AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM dc),
      a AS (SELECT vec_id, cid AS cell FROM rc WHERE rn = 1),
      z0 AS (SELECT e.vec_id, g.gid,
                    unnest(e.embedding[1:32])::DOUBLE AS x,
                    unnest(cc.cv[1:32]) AS y, unnest(g.gv[1:32]) AS w
             FROM e JOIN a USING (vec_id) JOIN c cc ON cc.cid = a.cell CROSS JOIN g),
      d0 AS (SELECT vec_id, gid, sum((x - y - w) * (x - y - w)) AS d2
             FROM z0 GROUP BY vec_id, gid),
      r0 AS (SELECT vec_id, gid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, gid) AS rn
             FROM d0),
      a0 AS (SELECT vec_id, gid AS code0 FROM r0 WHERE rn = 1),
      z1 AS (SELECT e.vec_id, g.gid,
                    unnest(e.embedding[33:64])::DOUBLE AS x,
                    unnest(cc.cv[33:64]) AS y, unnest(g.gv[33:64]) AS w
             FROM e JOIN a USING (vec_id) JOIN c cc ON cc.cid = a.cell CROSS JOIN g),
      d1 AS (SELECT vec_id, gid, sum((x - y - w) * (x - y - w)) AS d2
             FROM z1 GROUP BY vec_id, gid),
      r1 AS (SELECT vec_id, gid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, gid) AS rn
             FROM d1),
      a1 AS (SELECT vec_id, gid AS code1 FROM r1 WHERE rn = 1),
      t0 AS (SELECT c.cid, g.gid, unnest(qv.q[1:32]) AS x, unnest(c.cv[1:32]) AS y,
                    unnest(g.gv[1:32]) AS w
             FROM c CROSS JOIN g CROSS JOIN qv),
      dt0 AS (SELECT cid, gid, sum((x - y - w) * (x - y - w)) AS d2
              FROM t0 GROUP BY cid, gid),
      t1 AS (SELECT c.cid, g.gid, unnest(qv.q[33:64]) AS x, unnest(c.cv[33:64]) AS y,
                    unnest(g.gv[33:64]) AS w
             FROM c CROSS JOIN g CROSS JOIN qv),
      dt1 AS (SELECT cid, gid, sum((x - y - w) * (x - y - w)) AS d2
              FROM t1 GROUP BY cid, gid)
      SELECT a.vec_id, round(dt0.d2 + dt1.d2, 6) AS adc
      FROM a JOIN a0 USING (vec_id) JOIN a1 USING (vec_id)
           JOIN dt0 ON dt0.cid = a.cell AND dt0.gid = a0.code0
           JOIN dt1 ON dt1.cid = a.cell AND dt1.gid = a1.code1
      ORDER BY dt0.d2 + dt1.d2, a.vec_id LIMIT 10"""))(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      // one collect serves query + centroids + codebooks (contiguous ids)
      val all12 = collectPlanes(emb, 1 to 12)
      val cents = all12.slice(4, 8)
      val gbooks = all12.slice(8, 12)
      val query = all12.head
      Similarity.pqAdcResidualTopK(emb.filter($"vec_id" =!= 1), "embedding",
          "vec_id", cents,
          Seq(gbooks.map(_.slice(0, 32)), gbooks.map(_.slice(32, 64))),
          query, 10, nprobe = 4)
        .select($"vec_id", round($"adc", 6).as("adc"))
    })

  // ------------------------------------------------------- similarity: product quantization
  // PQ code assignment over two 32-dim subspaces with 4-centroid codebooks
  // (embeddings 5..8 sliced, the q34 convention); per-(code_0, code_1)
  // occupancy — the cell histogram an IVF-PQ index build reports.
  private lazy val pqQ = Q("q79_pq_codes", Some("""
      WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
                 FROM embeddings WHERE vec_id BETWEEN 5 AND 8),
      z0 AS (SELECT e.vec_id, c.cid, unnest(e.embedding[1:32])::DOUBLE AS x,
                    unnest(c.cv[1:32]) AS y
             FROM embeddings e CROSS JOIN c),
      d0 AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2 FROM z0 GROUP BY vec_id, cid),
      r0 AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM d0),
      a0 AS (SELECT vec_id, cid - 5 AS code_0 FROM r0 WHERE rn = 1),
      z1 AS (SELECT e.vec_id, c.cid, unnest(e.embedding[33:64])::DOUBLE AS x,
                    unnest(c.cv[33:64]) AS y
             FROM embeddings e CROSS JOIN c),
      d1 AS (SELECT vec_id, cid, sum((x - y) * (x - y)) AS d2 FROM z1 GROUP BY vec_id, cid),
      r1 AS (SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
             FROM d1),
      a1 AS (SELECT vec_id, cid - 5 AS code_1 FROM r1 WHERE rn = 1)
      SELECT code_0, code_1, count(*) AS n, min(vec_id) AS min_id
      FROM a0 JOIN a1 USING (vec_id)
      GROUP BY code_0, code_1 ORDER BY code_0, code_1"""))(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = collectPlanes(emb, 5 to 8)
      Similarity.pqCodes(emb, "embedding", "vec_id",
          Seq(cb.map(_.slice(0, 32)), cb.map(_.slice(32, 64))))
        .groupBy($"code_0".cast("long").as("code_0"), $"code_1".cast("long").as("code_1"))
        .agg(count(lit(1)).as("n"), min($"vec_id").as("min_id"))
        .orderBy($"code_0", $"code_1")
    })

  // ------------------------------------------------------- sampling: source-mixture rebalance
  // Data mixing: per-source target rates (deterministic {0.25,0.5,0.75,1.0}
  // from the source name) applied as a map-side md5-bucket filter — integer
  // thresholds, so both engines compare exactly.
  private lazy val mixQ = Q("q78_source_mix", Some("""
      WITH b AS (SELECT doc_id, source,
          (1 + length(source) % 4) AS q4,
          (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS h16
        FROM documents)
      SELECT source, round(min(q4) / 4.0, 6) AS target_rate, count(*) AS n_kept
      FROM b WHERE h16 < q4 * 16384
      GROUP BY source ORDER BY source"""))(
    (s, d) => {
      import graft.operators.Sampling
      val withRate = Tables.documents(s, d)
        .withColumn("rate", (lit(1) + length($"source") % 4) / lit(4.0))
      Sampling.mixtureSample(withRate, $"doc_id", $"rate")
        .groupBy($"source")
        .agg(round(min($"rate"), 6).as("target_rate"), count(lit(1)).as("n_kept"))
        .orderBy($"source")
    })

  // ------------------------------------------------------- dedup: transitive cluster closure
  // Connected components over a pair list (chains 0-1-2-3 per decade): the
  // step that turns pairwise near-dups into keep-one-per-cluster groups.
  // The oracle walks the same graph with a recursive CTE; min-label
  // propagation must agree with full transitive closure.
  private lazy val ccQ = Q("q77_dedup_clusters", Some("""
      WITH RECURSIVE e1 AS (
        SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
        WHERE doc_id % 10 < 3
          AND EXISTS (SELECT 1 FROM documents d2 WHERE d2.doc_id = documents.doc_id + 1)),
      e AS (SELECT src, dst FROM e1 UNION SELECT dst, src FROM e1),
      reach AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
      m AS (SELECT src, min(dst) AS mn FROM reach GROUP BY src)
      SELECT d.doc_id, LEAST(d.doc_id, COALESCE(m.mn, d.doc_id)) AS cluster
      FROM documents d LEFT JOIN m ON m.src = d.doc_id
      ORDER BY d.doc_id"""))(
    (s, d) => {
      val docs = Tables.documents(s, d).select($"doc_id")
      val e1 = docs.filter($"doc_id" % 10 < 3)
        .select($"doc_id".as("id_a"), ($"doc_id" + 1).as("id_b"))
        .join(docs.select($"doc_id".as("id_b")), Seq("id_b"), "left_semi")
      Dedup.connectedComponents(docs, "doc_id", e1)
        .select($"id".as("doc_id"), $"cluster")
        .orderBy($"doc_id")
    })

  // ------------------------------------------------------- text: context-window chunking
  // Overlapping 16-token windows at stride 4; per-chunk start, token count,
  // and content hash. Chunks explode map-side — nothing shuffles until the
  // final ORDER BY.
  private lazy val chunkQ = Q("q74_chunk_windows", Some("""
      WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      c AS (SELECT doc_id, i AS start, t[i:i+15] AS ck
            FROM (SELECT doc_id, t,
                    unnest(generate_series(1, greatest(1, len(t) - 12), 4)) AS i
                  FROM t))
      SELECT doc_id, CAST(start AS BIGINT) AS start, CAST(len(ck) AS BIGINT) AS n_toks,
             md5(array_to_string(ck, ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, start"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      TF.chunkWindowsFlat(Tables.documents(s, d), "doc_id", "text", 16, 4)
        .select($"id".as("doc_id"), $"start".cast("long").as("start"),
          $"n_toks".cast("long").as("n_toks"),
          md5($"chunk").as("chunk_md5"))
        .orderBy($"doc_id", $"start")
    })

  // ------------------------------------------------------- sampling: per-domain cap
  // Composition query: extract each doc's first URL domain (q68's synthetic
  // augmentation), then keep at most 5 docs per domain in deterministic md5
  // order — the per-domain quota every crawl-derived corpus enforces.
  private lazy val domainCapQ = {
    import graft.functions.TextFunctions._
    Q("q75_domain_cap", Some(s"""
      WITH aug AS (SELECT doc_id,
             text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                  || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' plus http://cdn.example.net/lib.js?v=1'
                          ELSE '' END AS t
           FROM documents),
      dom AS (SELECT doc_id,
                lower(regexp_extract(regexp_extract_all(t, '$urlRe')[1], '$domainRe', 1)) AS domain
              FROM aug),
      r AS (SELECT doc_id, domain,
              row_number() OVER (PARTITION BY domain
                ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
            FROM dom)
      SELECT domain, doc_id FROM r WHERE rn <= 5 ORDER BY domain, doc_id"""))(
      (s, d) => {
        import graft.operators.Sampling
        val aug = concat($"text",
          lit(" see https://site"), ($"doc_id" % 20).cast("string"),
          lit(".example.org/p/"), $"doc_id".cast("string"),
          when($"doc_id" % 3 === 0, lit(" plus http://cdn.example.net/lib.js?v=1"))
            .otherwise(lit("")))
        val dom = Tables.documents(s, d)
          .select($"doc_id", urlDomain(element_at(extractUrls(aug), 1)).as("domain"))
        Sampling.stratifiedCap(dom, $"domain", $"doc_id", maxPerStratum = 5)
          .select($"domain", $"doc_id").orderBy($"domain", $"doc_id")
      })
  }

  // ------------------------------------------------------- text: vocabulary / Zipf stats
  // Per-source type-token accounting: hapax count and TTR flag templated
  // text; the token stream never shuffles (two-level agg).
  private lazy val vocabQ = Q("q76_vocab_stats", Some(s"""
      WITH tok AS (SELECT source, unnest($toksSql) AS w FROM documents),
      tc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY source, w)
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
             round(count(*)::DOUBLE / sum(c), 6) AS ttr
      FROM tc GROUP BY source ORDER BY source"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      TF.vocabStats(Tables.documents(s, d), "source", "text")
        .select($"g".as("source"), $"n_tokens", $"n_types", $"n_hapax", $"ttr")
        .orderBy($"source")
    })

  // ------------------------------------------------------- text: bigram-LM quality score
  // CCNet-style LM fluency signal: Laplace-smoothed bigram model trained on
  // the doc_id % 7 == 0 "clean" subset, every doc scored by mean bigram NLL.
  private lazy val lmQualityQ = Q("q72_lm_quality", Some(s"""
      WITH tt AS (SELECT $toksSql AS t FROM documents WHERE doc_id % 7 = 0),
      tb AS (SELECT array_to_string(t[i:i+1], ' ') AS s
             FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
                   FROM tt WHERE len(t) >= 2)),
      c2 AS (SELECT s, count(*) AS c2 FROM tb GROUP BY s),
      c1 AS (SELECT split_part(s, ' ', 1) AS w1, count(*) AS c1 FROM tb GROUP BY 1),
      v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM tt)),
      dt AS (SELECT doc_id, $toksSql AS t FROM documents),
      db AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
             FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                   FROM dt WHERE len(t) >= 2)),
      j AS (SELECT db.doc_id,
                   ln((COALESCE(c1.c1, 0) + (SELECT v FROM v))::DOUBLE
                      / (COALESCE(c2.c2, 0) + 1)::DOUBLE) AS nll
            FROM db LEFT JOIN c2 USING (s)
                    LEFT JOIN c1 ON c1.w1 = split_part(db.s, ' ', 1))
      SELECT doc_id, count(*) AS n_bigrams, round(avg(nll), 6) AS avg_nll
      FROM j GROUP BY doc_id ORDER BY doc_id"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      val docs = Tables.documents(s, d)
      TF.bigramLmScore(docs, "doc_id", "text",
          docs.filter($"doc_id" % 7 === 0), "text")
        .select($"id".as("doc_id"), $"n_bigrams", $"avg_nll")
        .orderBy($"doc_id")
    })

  // ------------------------------------------------------- sampling: sequence packing
  // Training-example assembly: hash-shard docs, floor(prefix-tokens / 512)
  // bin assignment within each shard; per-bin doc/token totals.
  private lazy val packQ = Q("q73_pack_sequences", Some("""
      WITH t AS (SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS tc,
                   ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
                  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
                  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 8 AS shard
                 FROM documents),
      c AS (SELECT doc_id, shard, tc,
                   COALESCE(sum(tc) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
            FROM t)
      SELECT CAST(shard AS BIGINT) AS shard, CAST(cum // 512 AS BIGINT) AS bin,
             count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS sum_tokens
      FROM c GROUP BY 1, 2 ORDER BY shard, bin"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      import graft.operators.Sampling
      val withTc = Tables.documents(s, d)
        .select($"doc_id", TF.tokenCount($"text").cast("long").as("tc"))
      Sampling.packSequences(withTc, $"doc_id", $"tc",
          maxTokensPerBin = 512L, shards = 8)
        .groupBy($"shard".cast("long").as("shard"), $"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"tc").as("sum_tokens"))
        .orderBy($"shard", $"bin")
    })

  // ------------------------------------------------------- similarity: SemDeDup survivor set
  // Semantic dedup on the q46 planted-duplicate corpus: a vector survives
  // iff it has no cosine-0.99 near-dup with a smaller id in its LSH bucket
  // (keep-earliest, pairwise NOT EXISTS — order-independent).
  private lazy val semDedupQ = Q("q69_semdedup", Some("""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
      np AS (SELECT GREATEST(1, LEAST(16,
                      LENGTH(bin((count(*) + 63) // 64 - 1)))) AS n
             FROM corpus),
      planes AS (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv
                 FROM embeddings WHERE vec_id BETWEEN 1 AND (SELECT n FROM np)),
      b AS (SELECT c.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(c.embedding::DOUBLE[], p.pv) > 0
                            THEN power(2, p.pid - 1) ELSE 0 END) AS BIGINT) AS bucket
            FROM corpus c CROSS JOIN planes p GROUP BY c.vec_id),
      pairs AS (SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
                FROM b a JOIN b bb ON a.bucket = bb.bucket
                WHERE a.vec_id < bb.vec_id),
      dropped AS (SELECT DISTINCT id_b FROM pairs
                  JOIN corpus ca ON ca.vec_id = id_a
                  JOIN corpus cb ON cb.vec_id = id_b
                  WHERE round(list_dot_product(ca.embedding::DOUBLE[], cb.embedding::DOUBLE[])
                        / (sqrt(list_dot_product(ca.embedding::DOUBLE[], ca.embedding::DOUBLE[]))
                           * sqrt(list_dot_product(cb.embedding::DOUBLE[], cb.embedding::DOUBLE[]))),
                        6) >= 0.99)
      SELECT vec_id FROM corpus
      WHERE vec_id NOT IN (SELECT id_b FROM dropped)
      ORDER BY vec_id"""))(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select($"vec_id", $"embedding")
        .union(emb.filter($"vec_id" % 100 === 0)
          .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
      // corpus size in ONE aggregate job over the base table (the union's
      // count is base + planted copies by construction) instead of a count
      // over the two-scan union
      val cnts = emb.agg(count(lit(1)),
        count(when($"vec_id" % 100 === 0, 1))).head()
      val nPlanes = Similarity.planeCountFor(cnts.getLong(0) + cnts.getLong(1),
        targetBucketSize = 64, maxPlanes = 16)
      Similarity.semDedupSurvivors(corpus, "embedding", "vec_id",
          collectPlanes(emb, 1 to nPlanes), threshold = 0.99)
        .select($"vec_id").orderBy($"vec_id")
    })

  // ------------------------------------------------------- dedup: cross-doc duplicate shingles
  // CCNet-style boilerplate signal: per doc, the fraction of its distinct
  // 3-shingles that occur in at least one other document.
  private lazy val dupShingleQ = Q("q70_crossdoc_dup_shingles", Some(s"""
      WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
             FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                   FROM toks WHERE len(t) >= 3)),
      dfq AS (SELECT s, count(*) AS nd FROM sh GROUP BY s),
      j AS (SELECT sh.doc_id, CASE WHEN dfq.nd > 1 THEN 1 ELSE 0 END AS dup
            FROM sh JOIN dfq USING (s))
      SELECT doc_id, count(*) AS n_shingles, CAST(sum(dup) AS BIGINT) AS n_dup,
             round(sum(dup)::DOUBLE / count(*), 6) AS dup_frac
      FROM j GROUP BY doc_id ORDER BY doc_id"""))(
    (s, d) => {
      Dedup.crossDocDupShingleStats(Tables.documents(s, d), "doc_id", "text", n = 3)
        .select($"id".as("doc_id"), $"n_shingles", $"n_dup", $"dup_frac")
        .orderBy($"doc_id")
    })

  // ------------------------------------------------------- text: TF-IDF keyword extraction
  // Top-3 terms per doc by tf * ln(N/df); scores rounded before ranking so
  // the (score desc, term asc) order is reproducible across engines.
  private lazy val tfidfQ = Q("q71_tfidf_topk", Some(s"""
      WITH tok AS (SELECT doc_id, unnest($toksSql) AS term
                   FROM documents WHERE length(trim(text)) > 0),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
      scored AS (SELECT doc_id, term,
                        round(tf * ln((SELECT n FROM n)::DOUBLE / df), 6) AS tfidf
                 FROM tf JOIN dfq USING (term)),
      r AS (SELECT doc_id, term, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term) AS rk
            FROM scored)
      SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
      FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      TF.tfidfTopK(Tables.documents(s, d), "doc_id", "text", k = 3)
        .select($"id".as("doc_id"), $"term", $"tfidf", $"rk".cast("long").as("rk"))
        .orderBy($"doc_id", $"rk")
    })

  // ------------------------------------------------------- text: PII redaction (pre-training scrub)
  // Synthetic PII is appended deterministically in BOTH engines (the corpus
  // fixture has none), then counted and redacted with regexes restricted to
  // the Java-regex/RE2 common subset — the per-row scrub step every
  // training pipeline runs before tokenization.
  private lazy val piiQ = {
    import graft.functions.TextFunctions._
    Q("q67_pii_scrub", Some(s"""
      WITH aug AS (SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS t
           FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(t, '$emailRe')) AS n_emails,
             len(regexp_extract_all(t, '$phoneRe')) AS n_phones,
             len(regexp_extract_all(t, '$ipv4Re')) AS n_ips,
             md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '$emailRe', '<EMAIL>', 'g'),
                 '$phoneRe', '<PHONE>', 'g'),
                 '$ipv4Re', '<IP>', 'g')) AS redacted_md5
      FROM aug ORDER BY doc_id"""))(
      (s, d) => {
        val aug = concat($"text",
          lit(" contact user"), $"doc_id".cast("string"),
          lit("@example.com or +1-555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
          lit(" from 10."), ($"doc_id" % 256).cast("string"), lit(".0.1"))
        Tables.documents(s, d)
          .select($"doc_id", aug.as("t"))
          .select($"doc_id",
            piiEmailCount($"t").cast("long").as("n_emails"),
            piiPhoneCount($"t").cast("long").as("n_phones"),
            piiIpCount($"t").cast("long").as("n_ips"),
            md5(redactPii($"t")).as("redacted_md5"))
          .orderBy($"doc_id")
      })
  }

  // ------------------------------------------------------- text: URL extraction + per-domain stats
  // C4-style domain accounting: extract URLs, key by registrable host,
  // aggregate url/doc counts per domain — the table that drives per-domain
  // caps and blocklist joins. Deterministic URLs appended in both engines.
  private lazy val domainQ = {
    import graft.functions.TextFunctions._
    Q("q68_domain_stats", Some(s"""
      WITH aug AS (SELECT doc_id,
             text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                  || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' plus http://cdn.example.net/lib.js?v=1'
                          ELSE '' END AS t
           FROM documents),
      u AS (SELECT doc_id, unnest(regexp_extract_all(t, '$urlRe')) AS url FROM aug)
      SELECT lower(regexp_extract(url, 'https?://([^/?#:\\s]+)', 1)) AS domain,
             count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
      FROM u GROUP BY 1 ORDER BY domain"""))(
      (s, d) => {
        val aug = concat($"text",
          lit(" see https://site"), ($"doc_id" % 20).cast("string"),
          lit(".example.org/p/"), $"doc_id".cast("string"),
          when($"doc_id" % 3 === 0, lit(" plus http://cdn.example.net/lib.js?v=1"))
            .otherwise(lit("")))
        Tables.documents(s, d)
          .select($"doc_id", aug.as("t"))
          .select($"doc_id", explode(extractUrls($"t")).as("url"))
          .select($"doc_id", urlDomain($"url").as("domain"))
          .groupBy($"domain")
          .agg(count(lit(1)).as("n_urls"), countDistinct($"doc_id").as("n_docs"))
          .orderBy($"domain")
      })
  }

  // ------------------------------------------------------- multimodal: real WAV audio decode
  // The codec round-trip IS the test (same pattern as the GRIB packing
  // queries q61/q64): per-doc square-wave PCM is encoded to real RIFF/WAVE
  // bytes — every 5th with a LIST chunk ahead of fmt, exercising the
  // chunk-walk — then decoded by Wav.decode, which must parse the container
  // correctly for sample_rate/channels/duration/rms/zero_crossings to match
  // the oracle's closed-form values. Sample rates are 8k/16k/32k so
  // 1000/rate is binary-exact and round(,3) agrees across engines.
  private lazy val audioQ = Q("q66_audio_meta", Some("""
      WITH p AS (SELECT doc_id,
             8000 * CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS sample_rate,
             1 + doc_id % 2 AS channels,
             800 + doc_id % 100 AS n_frames,
             CAST(1000 + (doc_id % 50) * 100 AS DOUBLE) AS amp
           FROM documents)
      SELECT doc_id, sample_rate, channels, n_frames,
             round(n_frames * 1000.0 / sample_rate, 3) AS duration_ms,
             round(amp, 3) AS rms,
             (n_frames - 1) // 4 AS zero_crossings
      FROM p ORDER BY doc_id"""))(
    (s, d) => {
      import org.apache.spark.sql.Encoders
      val ids = Tables.documents(s, d).select($"doc_id".cast("long"))
        .as[Long](Encoders.scalaLong)
      val media = ids.map { id =>
        val rate = (8000L << (if (id % 3 == 0) 0 else if (id % 3 == 1) 1 else 2)).toInt
        val channels = (1 + id % 2).toInt
        val nFrames = (800 + id % 100).toInt
        val amp = (1000 + (id % 50) * 100).toShort
        val samples = new Array[Short](nFrames * channels)
        var i = 0
        while (i < nFrames) {
          val v: Short = if ((i / 4) % 2 == 0) amp else (-amp).toShort
          var c = 0
          while (c < channels) { samples(i * channels + c) = v; c += 1 }
          i += 1
        }
        (id, Wav.encode(Wav.Audio(rate, channels, samples),
          withListChunk = id % 5 == 0))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        .toDF("doc_id", "content")
      val decoded = Multimodal.decodeAudio(
        Multimodal.asMedia(media, "doc_id", "content"))
      decoded.select($"id".as("doc_id"),
          $"sampleRate".cast("long").as("sample_rate"),
          $"channels".cast("long").as("channels"),
          $"nFrames".as("n_frames"),
          round($"durationMs", 3).as("duration_ms"),
          round($"rms", 3).as("rms"),
          $"zeroCrossings".as("zero_crossings"))
        .orderBy($"doc_id")
    })

  // ------------------------------------------------------- multimodal: real JDK image decode + dHash near-dups
  // No DuckDB oracle can decode PNG bytes, so this records the weaker
  // rows-only check; the pixel-level correctness lives in MultimodalSpec
  // (encoding-invariance PNG==BMP, locality, banded-LSH recall).
  private lazy val imageDupsQ = Q("q62_image_near_dups", None)(
    (s, d) => {
      import org.apache.spark.sql.Encoders
      val orders = Tables.orders(s, d).orderBy($"o_orderkey").limit(96)
        .select($"o_orderkey".cast("long")).as[java.lang.Long](Encoders.LONG)
      // deterministic per-row PNG: structure from the group id, brightness
      // from the member id — members of a group are near-dups of each other
      // fanOut (r19): the limit collapses to ONE partition, serializing the
      // per-row PNG encode + decode + perceptual hash below; spreading 96
      // ids first parallelizes the whole media pipeline (no-op at scale)
      val media = graft.operators.ScaleToolkit.fanOut(orders.toDF())
        .as[java.lang.Long](Encoders.LONG).map { id =>
        val grp = (id % 8L).toInt
        val shift = ((id / 8L) % 6L).toInt
        val img = new java.awt.image.BufferedImage(48, 32,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 48) {
            val stripe = if ((x / (2 + grp)) % 2 == 0) 40 else 0
            val v = x * 170 / 48 + stripe + shift
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id.toLong, bos.toByteArray)
      }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
        .toDF("doc_id", "content")
      val decoded = Multimodal.decode(
        Multimodal.asMedia(media, "doc_id", "content"))
      Multimodal.imageNearDups(decoded, maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    })

  // ------------------------------------------------------- text: within-doc repetition (Gopher-style filter signal)
  private lazy val repetitionQ = Q("q59_repetition", Some(s"""
      WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
      g AS (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS s
            FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
                  FROM toks WHERE len(t) >= 2)),
      r AS (SELECT doc_id, count(*) AS n, count(DISTINCT s) AS nd FROM g GROUP BY doc_id)
      SELECT d.doc_id,
             round(CASE WHEN r.doc_id IS NULL THEN 0
                        ELSE 1 - CAST(nd AS DOUBLE) / n END, 6) AS dup2
      FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
      ORDER BY d.doc_id"""))(
    (s, d) =>
      Tables.documents(s, d)
        .select($"doc_id",
          round(graft.functions.TextFunctions.dupNgramRatio($"text", 2), 6).as("dup2"))
        .orderBy($"doc_id"))

  // ------------------------------------------------------- similarity: int8 scalar quantization
  // The quantized vector is serialized to a comma-joined string on BOTH
  // engines: the correctness harness canonicalizes results by sorting and
  // hashing column values, which a raw array column defeats (round-3 q60
  // failed with pandas "unhashable type: numpy.ndarray").
  private lazy val quantizeQ = Q("q60_embedding_quantize", Some("""
      WITH m AS (SELECT vec_id,
                        list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS mx
                 FROM embeddings)
      SELECT e.vec_id,
             round(m.mx / 127, 6) AS scale,
             array_to_string(
               CASE WHEN m.mx = 0 THEN list_transform(e.embedding::DOUBLE[], x -> 0)
                    ELSE list_transform(e.embedding::DOUBLE[],
                                        x -> CAST(round(x * 127 / m.mx) AS INTEGER))
               END, ',') AS q
      FROM embeddings e JOIN m USING (vec_id)
      ORDER BY e.vec_id"""))(
    (s, d) =>
      Tables.embeddings(s, d)
        .select($"vec_id", Similarity.quantizeInt8($"embedding").as("qz"))
        .select($"vec_id", round($"qz.scale", 6).as("scale"),
          array_join($"qz.q".cast("array<string>"), ",").as("q"))
        .orderBy($"vec_id"))

  // ------------------------------------------------------- sampling: deterministic hash sample
  // Hash-derived (not RNG) so the sampled set is reproducible across runs,
  // retries, and engines — the DuckDB oracle runs the identical nibble
  // arithmetic over md5.
  private lazy val hashSampleQ = Q("q56_hash_sample", Some("""
      WITH b AS (SELECT doc_id,
          (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS h16
        FROM documents)
      SELECT doc_id FROM b WHERE h16 < 6554 ORDER BY doc_id"""))(
    (s, d) => {
      import graft.operators.Sampling
      Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 0.1)
        .select($"doc_id").orderBy($"doc_id")
    })

  // ------------------------------------------------------- sampling: capped stratified sample
  private lazy val stratifiedCapQ = Q("q57_stratified_cap", Some("""
      WITH r AS (SELECT doc_id, doc_id % 7 AS stratum,
                        row_number() OVER (PARTITION BY doc_id % 7
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
                 FROM documents)
      SELECT stratum, doc_id FROM r WHERE rn <= 10
      ORDER BY stratum, doc_id"""))(
    (s, d) => {
      import graft.operators.Sampling
      Sampling.stratifiedCap(
        Tables.documents(s, d).withColumn("stratum", $"doc_id" % 7),
        col("stratum"), col("doc_id"), 10)
        .select($"stratum", $"doc_id").orderBy($"stratum", $"doc_id")
    })

  // ------------------------------------------------------- decontamination: n-gram overlap vs benchmark
  // Every 97th document plays the benchmark set; any training doc sharing a
  // 3-word shingle with it (including the benchmark docs themselves) drops.
  private lazy val decontaminateQ = Q("q58_decontaminate", Some(s"""
      WITH btoks AS (SELECT doc_id, $toksSql AS t FROM documents WHERE doc_id % 97 = 0),
      bsh AS (SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS s
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                    FROM btoks WHERE len(t) >= 3)),
      ttoks AS (SELECT doc_id, $toksSql AS t FROM documents),
      tsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
                    FROM ttoks WHERE len(t) >= 3)),
      bad AS (SELECT DISTINCT tsh.doc_id FROM tsh JOIN bsh USING (s))
      SELECT doc_id FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id"""))(
    (s, d) => {
      import graft.operators.Sampling
      val docs = Tables.documents(s, d)
      // Bloom-prefiltered path: identical result (no false negatives; false
      // positives die in the exact join), but clean shingles skip the join
      Sampling.decontaminateBloom(docs, "doc_id", "text",
          docs.filter($"doc_id" % 97 === 0), "doc_id", "text", n = 3,
          expectedShingles = 100000L)
        .select($"doc_id").orderBy($"doc_id")
    })

  /** Corpus statistics per source: token-count distribution via exact
    * interpolated percentiles (both engines use linear interpolation;
    * round(6) absorbs formulation ulps). */
  private lazy val corpusStatsQ = Q("q47_corpus_stats", Some("""
      WITH t AS (
        SELECT source,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) AS toks
        FROM documents)
      SELECT source, count(*) AS n_docs,
             round(avg(toks), 6) AS avg_tokens,
             round(quantile_cont(toks, 0.5), 6) AS p50_tokens,
             round(quantile_cont(toks, 0.95), 6) AS p95_tokens,
             round(min(toks), 6) AS min_tokens, round(max(toks), 6) AS max_tokens
      FROM t GROUP BY source ORDER BY source"""))(
    (s, d) => {
      import graft.functions.{TextFunctions => TF}
      // exact percentiles for the oracle; TF.corpusStats(exact = false) is
      // the approx_percentile (t-digest) path for unbounded groups
      TF.corpusStats(Tables.documents(s, d), "source", "text", exact = true)
        .orderBy($"source")
    })

  /** Embedding-cosine near-dup pairs within hyperplane-LSH buckets, on a
    * corpus with planted duplicate vectors (every 100th vec copied). */
  private lazy val embDupQ = Q("q46_embedding_near_dups", Some("""
      WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
      np AS (SELECT GREATEST(1, LEAST(16,
                      LENGTH(bin((count(*) + 63) // 64 - 1)))) AS n
             FROM corpus),
      planes AS (SELECT vec_id AS pid, embedding::DOUBLE[] AS pv
                 FROM embeddings WHERE vec_id BETWEEN 1 AND (SELECT n FROM np)),
      b AS (SELECT c.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(c.embedding::DOUBLE[], p.pv) > 0
                            THEN power(2, p.pid - 1) ELSE 0 END) AS BIGINT) AS bucket
            FROM corpus c CROSS JOIN planes p GROUP BY c.vec_id),
      pairs AS (SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
                FROM b a JOIN b bb ON a.bucket = bb.bucket
                WHERE a.vec_id < bb.vec_id),
      scored AS (
        SELECT id_a, id_b,
               round(list_dot_product(ca.embedding::DOUBLE[], cb.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(ca.embedding::DOUBLE[], ca.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(cb.embedding::DOUBLE[], cb.embedding::DOUBLE[]))),
                 6) AS cos_sim
        FROM pairs
        JOIN corpus ca ON ca.vec_id = id_a
        JOIN corpus cb ON cb.vec_id = id_b)
      SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.99
      ORDER BY id_a, id_b"""))(
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = emb.select($"vec_id", $"embedding")
        .union(emb.filter($"vec_id" % 100 === 0)
          .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
      // plane count scales with the corpus (2^p buckets ~ N/64) — a fixed
      // count would make the within-bucket pairing quadratic in N; the
      // oracle computes the identical integer formula via LENGTH(bin(k-1)).
      // One aggregate job over the base table (union count = base + planted
      // copies by construction) instead of a count over the two-scan union.
      val cnts = emb.agg(count(lit(1)),
        count(when($"vec_id" % 100 === 0, 1))).head()
      val nPlanes = Similarity.planeCountFor(cnts.getLong(0) + cnts.getLong(1),
        targetBucketSize = 64, maxPlanes = 16)
      Similarity.cosineNearDupPairs(corpus, "embedding", "vec_id",
          collectPlanes(emb, 1 to nPlanes), threshold = 0.99)
        .orderBy($"id_a", $"id_b")
    })

  /** Stateful-op family: gap-based sessionization, batch mirror (the
    * streaming twin uses flatMapGroupsWithState — streaming/Sessionize). */
  private lazy val sessionizeQ = Q("q45_sessionize", Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
      x AS (SELECT user_id, ts_us, value,
                   CASE WHEN lag(ts_us) OVER w IS NULL
                        OR ts_us - lag(ts_us) OVER w > 3600000000 THEN 1 ELSE 0 END AS new_s
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      y AS (SELECT user_id, ts_us, value,
                   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                         ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
            FROM x)
      SELECT user_id, session_idx, count(*) AS n_events,
             min(ts_us) AS start_us, max(ts_us) AS end_us,
             round(sum(value), 6) AS sum_value
      FROM y GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))(
    (s, d) => {
      import graft.streaming.Sessionize
      val ev = Tables.events(s, d)
        .select($"user_id", expr("ts_ns div 1000").as("ts_us"), $"value")
      Sessionize.summarizeBatch(ev, "user_id", "ts_us", "value", gapSeconds = 3600)
        .orderBy($"user_id", $"session_idx")
    })

  /** Custom codegen Expression (§2.11): distances from London, top-50
    * closest grid points. Both engines evaluate the same double formula;
    * libm ulp differences are absorbed by round(…, 4) (~10 m). */
  private lazy val haversineQ = Q("q44_haversine", Some(s"""
      WITH grid AS (${Queries.gridSql}),
      g AS (SELECT DISTINCT latitude, longitude FROM grid),
      d AS (SELECT latitude, longitude,
                   2 * 6371.0088 * asin(least(1.0, sqrt(
                     pow(sin(radians(latitude - 51.5074) / 2), 2)
                     + cos(radians(51.5074)) * cos(radians(latitude))
                       * pow(sin(radians(longitude - (-0.1278)) / 2), 2)))) AS dist_km
            FROM g)
      SELECT latitude, longitude, round(dist_km, 4) AS dist_km
      FROM d ORDER BY dist_km, latitude, longitude LIMIT 50"""))(
    (s, d) => {
      import graft.functions.HaversineDistance
      Queries.grid(s, d)
        .select($"latitude", $"longitude").distinct()
        .withColumn("dist_km", round(HaversineDistance(
          $"latitude", $"longitude", lit(51.5074), lit(-0.1278)), 4))
        .orderBy($"dist_km", $"latitude", $"longitude")
        .limit(50)
    })

  /** R13: conservative regrid 0.05° -> 1° as one hash aggregation. */
  private lazy val regridQ = Q("q40_regrid_conservative", Some(s"""
      WITH grid AS (${Queries.gridSql})
      SELECT floor(latitude / 1.0) * 1.0 AS lat_cell,
             floor(longitude / 1.0) * 1.0 AS lon_cell,
             count(*) AS n_samples,
             round(avg(temperature), 6) AS temperature
      FROM grid GROUP BY 1, 2 ORDER BY 1, 2"""))(
    (s, d) => {
      import graft.operators.Regrid
      Regrid.conservative(Queries.grid(s, d), "latitude", "longitude", 1.0, Seq("temperature"))
        .select($"lat_cell", $"lon_cell", $"n_samples",
          round($"temperature", 6).as("temperature"))
        .orderBy($"lat_cell", $"lon_cell")
    })

  /** R13 nearest-neighbor regrid: off-grid target points take the values of
    * their nearest 0.05-degree source cell — an integer cell-index hash
    * join (regrid.py's common non-conservative mode, relationally). */
  private lazy val nearestQ = Q("q49_regrid_nearest", Some(s"""
      WITH grid AS (${Queries.gridSql}),
      src AS (SELECT CAST(round(latitude / 0.05) AS BIGINT) AS la_i,
                     CAST(round(longitude / 0.05) AS BIGINT) AS lo_i,
                     round(avg(temperature), 6) AS temperature
              FROM grid GROUP BY 1, 2),
      tgt AS (SELECT DISTINCT latitude + 0.013 AS latitude,
                              longitude + 0.017 AS longitude
              FROM grid WHERE l_orderkey % 20 = 0)
      SELECT round(latitude, 6) AS latitude, round(longitude, 6) AS longitude,
             temperature
      FROM tgt JOIN src ON src.la_i = CAST(round(latitude / 0.05) AS BIGINT)
                       AND src.lo_i = CAST(round(longitude / 0.05) AS BIGINT)
      ORDER BY latitude, longitude"""))(
    (s, d) => {
      import graft.operators.Regrid
      // r19 note: a broadcast semi-join prefilter of the source by the
      // target's distinct cell set (guide §3.2) was measured here and
      // REJECTED — identical results, but min-of-4 wall went 1.54 -> 2.40 s
      // at sf0.1 (the extra broadcast/persist jobs cost more than the 20x
      // smaller aggregation shuffle saves at this scale).
      val src = Queries.grid(s, d)
        .groupBy(Regrid.nearestIndex($"latitude", 0.05).as("la_i"),
          Regrid.nearestIndex($"longitude", 0.05).as("lo_i"))
        .agg(round(avg($"temperature"), 6).as("temperature"))
        .select(($"la_i" * 0.05).as("latitude"), ($"lo_i" * 0.05).as("longitude"),
          $"temperature")
      // off-grid probe points (known-populated cells shifted off-center)
      val tgt = Queries.grid(s, d)
        .filter($"l_orderkey" % 20 === 0)
        .select(($"latitude" + 0.013).as("latitude"),
          ($"longitude" + 0.017).as("longitude"))
        .distinct()
      Regrid.nearest(src, tgt, "latitude", "longitude", 0.05, 0.05)
        .select(round($"latitude", 6).as("latitude"),
          round($"longitude", 6).as("longitude"), $"temperature")
        .orderBy($"latitude", $"longitude")
    })

  /** R13 bilinear regrid: off-grid targets interpolate their 4 surrounding
    * 1-degree anchors (corner-explode + equi-join on the Spark side; the
    * oracle recomputes the same weights directly). */
  private lazy val bilinearQ = Q("q51_regrid_bilinear", Some(s"""
      WITH grid AS (${Queries.gridSql}),
      src AS (SELECT floor(latitude) AS alat, floor(longitude) AS alon,
                     avg(temperature) AS v
              FROM grid GROUP BY 1, 2),
      tgt AS (SELECT DISTINCT alat + 0.3 AS tlat, alon + 0.7 AS tlon
              FROM src
              WHERE CAST(alat AS BIGINT) % 7 = 0 AND CAST(alon AS BIGINT) % 11 = 0),
      j AS (SELECT tlat, tlon, s.v,
                   (1 - abs(tlat - s.alat)) * (1 - abs(tlon - s.alon)) AS w
            FROM tgt JOIN src s
              ON (s.alat = floor(tlat) OR s.alat = floor(tlat) + 1)
             AND (s.alon = floor(tlon) OR s.alon = floor(tlon) + 1))
      SELECT tlat, tlon, round(sum(w * v) / sum(w), 6) AS v
      FROM j GROUP BY tlat, tlon
      ORDER BY tlat, tlon"""))(
    (s, d) => {
      import graft.operators.Regrid
      // persisted (r19): src feeds BOTH the target-point derivation and the
      // bilinear corner join — one grid scan + aggregation instead of two
      val src = Queries.grid(s, d)
        .groupBy(floor($"latitude").as("latitude"), floor($"longitude").as("longitude"))
        .agg(avg($"temperature").as("v"))
        .transform(graft.operators.ScaleToolkit.cached)
      val tgt = src
        .filter($"latitude".cast("long") % 7 === 0 && $"longitude".cast("long") % 11 === 0)
        .select(($"latitude" + 0.3).as("latitude"), ($"longitude" + 0.7).as("longitude"))
        .distinct()
      Regrid.bilinear(src, tgt, "latitude", "longitude", "v", 1.0)
        .select($"t_lat".as("tlat"), $"t_lon".as("tlon"), round($"v", 6).as("v"))
        .orderBy($"tlat", $"tlon")
    })

  /** S5/F17: strftime-template datetime extraction from file names. */
  private lazy val matchDtQ = Q("q42_match_datetime", Some("""
      SELECT uri,
             make_timestamp(
               CAST(regexp_extract(uri, 'era5_([0-9]{4})([0-9]{2})([0-9]{2})\.nc', 1) AS INT),
               CAST(regexp_extract(uri, 'era5_([0-9]{4})([0-9]{2})([0-9]{2})\.nc', 2) AS INT),
               CAST(regexp_extract(uri, 'era5_([0-9]{4})([0-9]{2})([0-9]{2})\.nc', 3) AS INT),
               0, 0, 0.0) AS file_time
      FROM (SELECT DISTINCT 'gs://wx/era5_' || strftime(o_orderdate, '%Y%m%d') || '.nc' AS uri
            FROM orders)
      ORDER BY uri"""))(
    (s, d) => {
      import graft.functions.MoverFunctions
      Tables.orders(s, d)
        .select(concat(lit("gs://wx/era5_"),
          date_format($"o_orderdate", "yyyyMMdd"), lit(".nc")).as("uri"))
        .distinct()
        .withColumn("file_time", MoverFunctions.matchDatetime($"uri", "era5_%Y%m%d.nc"))
        .orderBy($"uri")
    })

  /** F20: packed-int16 scale/offset decode with missing-value masking. */
  private lazy val packedQ = Q("q43_packed_decode", Some("""
      SELECT raw,
             round(CASE WHEN raw = -32767 THEN NULL
                   ELSE raw * CAST(0.01 AS DOUBLE) + CAST(5 AS DOUBLE) END, 6) AS decoded,
             count(*) AS n
      FROM (SELECT CAST(CASE WHEN l_partkey % 97 = 0 THEN -32767
                        ELSE l_partkey % 40000 - 20000 END AS INTEGER) AS raw
            FROM lineitem)
      GROUP BY raw ORDER BY raw"""))(
    (s, d) => {
      import graft.functions.MoverFunctions
      Tables.lineitem(s, d)
        .selectExpr("""CAST(CASE WHEN l_partkey % 97 = 0 THEN -32767
                       ELSE l_partkey % 40000 - 20000 END AS INTEGER) AS raw""")
        .groupBy($"raw").agg(count(lit(1)).as("n"))
        .select($"raw",
          round(MoverFunctions.packedDecode($"raw", 0.01, 5.0, -32767L), 6).as("decoded"),
          $"n")
        .orderBy($"raw")
    })


  /** Shared q212/q213 fixture: a CDF-enabled Delta table PARTITIONED by
    * `b`, one partitioned MERGE (matched keys all in partition 0,
    * inserts into partition 1), with partition 2's pre-merge file list
    * recorded in `untouched.txt` for the byte-identical pin. */
  private def q212Fixture(s: SparkSession, d: String): String =
    Fixtures.dir("q212", d) { dir =>
      import graft.sources.{DeltaTable, DeltaWriter}
      val base = orderedKeys(s, d, 120).select($"doc_id".as("id"), $"rn0")
      val t = s"$dir/table"
      DeltaWriter.writeAppend(s,
        base.select($"id", concat(lit("doc-"), $"rn0").as("text"),
          ($"id" % 3).as("b")), t, partitionBy = Seq("b"),
        properties = Map("delta.enableChangeDataFeed" -> "true"))
      val untouched = DeltaTable.readWhere(s, t,
        Seq(org.apache.spark.sql.sources.EqualTo("b", 2L)))
        .inputFiles.sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/untouched.txt"),
        untouched.mkString("\n").getBytes("UTF-8"))
      val upd = base.filter($"id" % 6 === 0)
        .select($"id", concat(lit("m-"), $"rn0").as("text"),
          ($"id" % 3).as("b"))
      val ins = base.filter($"rn0" % 10 === 0)
        .select(($"id" + 100000).as("id"),
          concat(lit("new-"), $"rn0").as("text"), lit(1L).as("b"))
      DeltaWriter.writeMerge(s, t, upd.unionByName(ins), Seq("id"))
    }

  /** Author the v0 commit of a COLUMN-MAPPED (name-mode) Delta table at
    * `t`: flat logical (id, text, bucket) mapped to physical (c1, c2,
    * c3), partitioned by `bucket`, change data feed on — the shape the
    * q214/q215 mapped row-level writes then operate on. */
  private def cmLogV0(t: String): Unit = {
    def f(n: String, ty: String, phys: String, id: Int) =
      s"""{"name":"$n","type":"$ty","nullable":true,""" +
        s""""metadata":{"delta.columnMapping.physicalName":"$phys",""" +
        s""""delta.columnMapping.id":$id}}"""
    val schemaStr =
      (s"""{"type":"struct","fields":[${f("id", "long", "c1", 1)},""" +
        s"""${f("text", "string", "c2", 2)},${f("bucket", "string", "c3", 3)}]}""")
        .replace("\\", "\\\\").replace("\"", "\\\"")
    new java.io.File(s"$t/_delta_log").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_delta_log/" + "0" * 20 + ".json"),
      (s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":["columnMapping"],""" +
        s""""writerFeatures":["columnMapping","changeDataFeed"]}}""" +
        "\n" +
        s"""{"metaData":{"id":"cm","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaStr","partitionColumns":["bucket"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"3",""" +
        s""""delta.enableChangeDataFeed":"true"},""" +
        s""""createdTime":0}}""").getBytes("UTF-8"))
  }

  /** (doc_id, rn0) fixture keys: the first `n` order keys with their rank,
    * built driver-side (a few hundred rows) so derived queries never need
    * a global window in the distributed plan. */
  private def orderedKeys(s: org.apache.spark.sql.SparkSession, d: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val ks = Tables.orders(s, d).orderBy(col("o_orderkey")).limit(n)
      .select(col("o_orderkey").cast("long")).collect().map(_.getLong(0))
    s.createDataFrame(
      s.sparkContext.parallelize(ks.zipWithIndex.map { case (k, i) =>
        org.apache.spark.sql.Row(k, i.toLong)
      }.toSeq, 4),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("rn0", LongType, nullable = false))))
  }

  /** Write `df` as exactly ONE parquet file at `target` — the fixture
    * helper for table-format logs/manifests that reference individual
    * files; the temp write dir is cleaned up. */
  private[graft] def singleParquet(df: DataFrame, target: String): String = {
    val tmp = target + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Option(new java.io.File(target).getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    target
  }

  /** Collect small plane/centroid vectors driver-side (they become literals
    * in the per-row expressions — broadcast-free). */
  private[graft] def collectPlanes(emb: DataFrame, ids: Range): Seq[Seq[Float]] = {
    import emb.sparkSession.implicits._
    val rows = emb.filter(col("vec_id").between(ids.head, ids.last))
      .orderBy(col("vec_id"))
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    // callers slice the result positionally (q81/q94 split one collect into
    // query + codebooks), which silently mis-slices if an id is missing or
    // duplicated — fail loudly instead
    require(rows.iterator.map(_._1).sameElements(ids.iterator.map(_.toLong)),
      s"collectPlanes: vec_ids ${ids.head}..${ids.last} must be present " +
        s"exactly once each; got [${rows.map(_._1).mkString(",")}]")
    rows.map(_._2).toSeq
  }

  private implicit class ColInterp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
