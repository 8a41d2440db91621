package graft

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.spark.sql.functions._

import graft.sources.ArrowIpc

class ArrowIpcSpec extends SparkSpec {
  import spark.implicits._

  /** Two-batch fixture through the shared writer: id bigint, score
    * float8, name utf8 (null at id 3), emb list<float8>. */
  private def writeFixture(path: String, zstd: Boolean): Unit =
    ArrowIpc.writeFixture(path,
      (0 until 10).map { id =>
        (id.toLong, id / 4.0,
          if (id == 3) None else Some(s"doc-$id"),
          (0 until 3).map(k => id * 10.0 + k))
      }, batchRows = 5, zstd = zstd)

  test("feather v2 / arrow ipc reads batches as tasks with full type mapping") {
    val dir = java.nio.file.Files.createTempDirectory("arrow").toString
    writeFixture(s"$dir/data.arrow", zstd = false)
    val df = ArrowIpc.read(spark, s"$dir/data.arrow").cache()
    assert(df.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("id", "long"), ("score", "double"), ("name", "string"),
        ("emb", "array")))
    assert(df.count() == 10)
    assert(df.rdd.getNumPartitions == 2) // one task per record batch
    val r7 = df.filter($"id" === 7).head()
    assert(r7.getDouble(1) == 1.75 && r7.getString(2) == "doc-7")
    assert(r7.getSeq[Double](3) == Seq(70.0, 71.0, 72.0))
    // declared nulls survive
    assert(df.filter($"id" === 3).head().isNullAt(2))
    df.unpersist()
  }

  test("zstd-compressed record batches decode through the bundled codec") {
    val dir = java.nio.file.Files.createTempDirectory("arrowz").toString
    writeFixture(s"$dir/z.arrow", zstd = true)
    val df = ArrowIpc.read(spark, s"$dir/z.arrow")
    assert(df.count() == 10)
    assert(df.agg(sum($"score")).as[Double].head() ==
      (0 until 10).map(_ / 4.0).sum)
  }

  test("multiple files share one schema; disagreement is a directed error") {
    val dir = java.nio.file.Files.createTempDirectory("arrowm").toString
    writeFixture(s"$dir/a.arrow", zstd = false)
    writeFixture(s"$dir/b.arrow", zstd = false)
    assert(ArrowIpc.read(spark, s"$dir/*.arrow").count() == 20)
    // a schema-divergent sibling: single int column
    val allocator = new RootAllocator()
    val v = new IntVector("only", allocator)
    val root = new VectorSchemaRoot(Seq(v.asInstanceOf[FieldVector]).asJava)
    val ch = java.nio.channels.Channels.newChannel(
      new java.io.FileOutputStream(s"$dir/c.arrow"))
    val w = new ArrowFileWriter(root, null, ch)
    w.start()
    v.allocateNew(1); v.setSafe(0, 42); v.setValueCount(1); root.setRowCount(1)
    w.writeBatch(); w.end(); w.close(); root.close(); allocator.close()
    intercept[IllegalArgumentException] {
      ArrowIpc.read(spark, s"$dir/*.arrow")
    }
  }
}
