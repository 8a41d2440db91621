package graft

import org.apache.spark.sql.functions._

import graft.sources.Safetensors

class SafetensorsSpec extends SparkSpec {
  import spark.implicits._

  test("multi-tensor file round-trips; rows fan out as row-range reads") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val emb = (0 until 50 * 4).map(k => (k % 97) / 8.0)
    val bias = Seq(0.25, -0.5, 1.0, 2.0)
    Safetensors.write(s"$dir/model.safetensors", Seq(
      ("emb.weight", Seq(50L, 4L), emb),
      ("bias", Seq(4L), bias)))
    val meta = Safetensors.readMeta(spark, s"$dir/model.safetensors")
    assert(meta.count() == 2)
    val mEmb = meta.filter($"tensor" === "emb.weight").head()
    assert(mEmb.getString(2) == "F32" && mEmb.getSeq[Long](3) == Seq(50L, 4L) &&
      mEmb.getLong(4) == 50L * 4 * 4)
    val df = Safetensors.read(spark, s"$dir/model.safetensors").cache()
    assert(df.filter($"tensor" === "emb.weight").count() == 50)
    val r7 = df.filter($"tensor" === "emb.weight" && $"row" === 7)
      .head().getSeq[Double](3)
    assert(r7 == (28 until 32).map(k => (k % 97) / 8.0))
    // 1-D tensor: one row per element, singleton values
    val b = df.filter($"tensor" === "bias").orderBy($"row")
      .select($"values").as[Seq[Double]].collect().toSeq
    assert(b == bias.map(Seq(_)))
    df.unpersist()
  }

  test("dtypes decode: F64, BF16, I8, U8, BOOL; rank-3 collapses trailing dims") {
    val dir = java.nio.file.Files.createTempDirectory("std").toString
    val vals = Seq(1.0, -2.0, 0.0, 3.5)
    Safetensors.write(s"$dir/f64.safetensors", Seq(("t", Seq(4L), vals)), "F64")
    assert(Safetensors.read(spark, s"$dir/f64.safetensors").orderBy($"row")
      .select(element_at($"values", 1)).as[Double].collect().toSeq == vals)
    // BF16 keeps the float32 top half: 1.0, -2.0, 0.0 are exact; 3.5 too
    Safetensors.write(s"$dir/bf16.safetensors", Seq(("t", Seq(4L), vals)), "BF16")
    assert(Safetensors.read(spark, s"$dir/bf16.safetensors").orderBy($"row")
      .select(element_at($"values", 1)).as[Double].collect().toSeq == vals)
    Safetensors.write(s"$dir/i8.safetensors",
      Seq(("t", Seq(3L), Seq(-128.0, 0.0, 127.0))), "I8")
    assert(Safetensors.read(spark, s"$dir/i8.safetensors").orderBy($"row")
      .select(element_at($"values", 1)).as[Double].collect().toSeq ==
      Seq(-128.0, 0.0, 127.0))
    Safetensors.write(s"$dir/bool.safetensors",
      Seq(("t", Seq(3L), Seq(0.0, 1.0, 5.0))), "BOOL")
    assert(Safetensors.read(spark, s"$dir/bool.safetensors").orderBy($"row")
      .select(element_at($"values", 1)).as[Double].collect().toSeq ==
      Seq(0.0, 1.0, 1.0))
    // rank-3 (2, 2, 3): rows = first dim, trailing dims flatten into values
    Safetensors.write(s"$dir/r3.safetensors",
      Seq(("t", Seq(2L, 2L, 3L), (0 until 12).map(_.toDouble))), "F32")
    val r3 = Safetensors.read(spark, s"$dir/r3.safetensors").orderBy($"row")
      .select($"values").as[Seq[Double]].collect().toSeq
    assert(r3 == Seq((0 until 6).map(_.toDouble), (6 until 12).map(_.toDouble)))
  }

  test("directed errors: bad header length, non-JSON header, span mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("ste").toString
    val junk = s"$dir/junk.safetensors"
    java.nio.file.Files.write(java.nio.file.Paths.get(junk),
      Array[Byte](-1, -1, -1, -1, -1, -1, -1, 0x7f) ++ "x".getBytes)
    intercept[Safetensors.UnsupportedSafetensors] {
      Safetensors.read(spark, junk)
    }
    val notJson = s"$dir/nj.safetensors"
    val body = "this is not json".getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(notJson),
      Array[Byte](body.length.toByte, 0, 0, 0, 0, 0, 0, 0) ++ body)
    intercept[Safetensors.UnsupportedSafetensors] {
      Safetensors.read(spark, notJson)
    }
    val badSpan = s"$dir/bs.safetensors"
    val hdr = """{"t":{"dtype":"F32","shape":[2],"data_offsets":[0,4]}}"""
      .getBytes("UTF-8")
    java.nio.file.Files.write(java.nio.file.Paths.get(badSpan),
      Array[Byte](hdr.length.toByte, 0, 0, 0, 0, 0, 0, 0) ++ hdr ++
        new Array[Byte](4))
    val e = intercept[Safetensors.UnsupportedSafetensors] {
      Safetensors.read(spark, badSpan)
    }
    assert(e.getMessage.contains("spans"))
    // truncated data buffer: directed error AT PLAN TIME, naming the tensor
    val full = s"$dir/full.safetensors"
    Safetensors.write(full, Seq(("w", Seq(8L, 4L), (0 until 32).map(_.toDouble))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(full))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cut.safetensors"),
      java.util.Arrays.copyOf(bytes, bytes.length - 16))
    val t = intercept[Safetensors.UnsupportedSafetensors] {
      Safetensors.read(spark, s"$dir/cut.safetensors")
    }
    assert(t.getMessage.contains("truncated") && t.getMessage.contains("w"))
  }
}
