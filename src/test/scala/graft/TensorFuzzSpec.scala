package graft

import org.apache.spark.sql.functions._

import graft.sources.{Npy, Safetensors}

/** Deterministic fuzz for the tensor-container readers: random shapes,
  * dtypes, and storage orders round-trip exactly (values are quantized so
  * every chosen dtype represents them losslessly). */
class TensorFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("npy round-trips random shapes, dtypes, and orders exactly") {
    val rng = new scala.util.Random(0xA117)
    val dir = java.nio.file.Files.createTempDirectory("npyfz").toString
    val descrs = Seq("<f8", "<f4", ">f8", ">f4", "<i8", "<i4", "<i2", "<i1",
      "<u1", "<u2", "|b1")
    (0 until 30).foreach { trial =>
      val descr = descrs(rng.nextInt(descrs.size))
      val rank = 1 + rng.nextInt(2)
      val rows = 1 + rng.nextInt(40)
      val cols = 1 + rng.nextInt(12)
      val shape = if (rank == 1) Seq(rows.toLong) else Seq(rows.toLong, cols.toLong)
      val n = shape.product.toInt
      def quantized(): Double = descr match {
        case "<f8" | ">f8" | "<f4" | ">f4" => (rng.nextInt(4001) - 2000) / 8.0
        case "<i8" | "<i4" => (rng.nextInt(200001) - 100000).toDouble
        case "<i2" => (rng.nextInt(60001) - 30000).toDouble
        case "<i1" => (rng.nextInt(256) - 128).toDouble
        case "<u1" => rng.nextInt(256).toDouble
        case "<u2" => rng.nextInt(65536).toDouble
        case "|b1" => rng.nextInt(2).toDouble
      }
      val vals = (0 until n).map(_ => quantized())
      val fortran = rank == 2 && rng.nextBoolean()
      val path = s"$dir/t$trial.npy"
      // the writer stores row-major input; fortran flag transposes storage
      val stored = if (!fortran) vals
        else (0 until cols).flatMap(c => (0 until rows).map(r => vals(r * cols + c)))
      Npy.write(path, shape, stored, descr = descr, fortranOrder = fortran)
      if (rank == 1) {
        val got = Npy.read(spark, path).orderBy($"idx")
          .select($"value").as[Double].collect().toSeq
        assert(got == vals, s"trial $trial ($descr rank 1)")
      } else {
        val got = Npy.read(spark, path).orderBy($"row")
          .select($"values").as[Seq[Double]].collect().toSeq
        val want = (0 until rows).map(r => (0 until cols).map(c => vals(r * cols + c)))
        assert(got == want, s"trial $trial ($descr ${rows}x$cols fortran=$fortran)")
      }
    }
  }

  test("safetensors round-trips random tensor sets incl. rank-3 and BF16") {
    val rng = new scala.util.Random(0x5AFE)
    val dir = java.nio.file.Files.createTempDirectory("stfz").toString
    val dtypes = Seq("F64", "F32", "BF16", "I64", "I32", "I16", "I8", "U8", "BOOL")
    (0 until 15).foreach { trial =>
      val nTensors = 1 + rng.nextInt(4)
      // one dtype per FILE (the writer's contract); values quantized to be
      // exact in that dtype
      val dtype = dtypes(rng.nextInt(dtypes.size))
      def q(): Double = dtype match {
        case "F64" | "F32" => (rng.nextInt(2001) - 1000) / 8.0
        case "BF16" => rng.nextInt(256).toDouble // 8 mantissa bits: exact
        case "I64" | "I32" => (rng.nextInt(100001) - 50000).toDouble
        case "I16" => (rng.nextInt(60001) - 30000).toDouble
        case "I8" => (rng.nextInt(256) - 128).toDouble
        case "U8" => rng.nextInt(256).toDouble
        case "BOOL" => rng.nextInt(2).toDouble
      }
      val tensors = (0 until nTensors).map { t =>
        val rank = 1 + rng.nextInt(3)
        val shape = (0 until rank).map(_ => (1 + rng.nextInt(6)).toLong)
        (s"t$t", shape, (0L until shape.product).map(_ => q()))
      }
      val path = s"$dir/m$trial.safetensors"
      Safetensors.write(path, tensors, dtype)
      val df = Safetensors.read(spark, path).cache()
      tensors.foreach { case (name, shape, vals) =>
        val rows = shape.head
        val rowElems = shape.drop(1).product.toInt
        val got = df.filter($"tensor" === name).orderBy($"row")
          .select($"values").as[Seq[Double]].collect().toSeq
        val want = (0L until rows).map { r =>
          (0 until rowElems).map(j => vals((r * rowElems + j).toInt))
        }
        assert(got == want, s"trial $trial tensor $name $dtype $shape")
      }
      df.unpersist()
    }
  }
}
