package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Iceberg's `bucket[N]` partition transform (table spec Appendix B):
  * `(murmur3_x86_32(encode(v)) & Int.MaxValue) % N`, where encode is
  * the spec's per-type byte form — int/long/date/timestamp widen to an
  * 8-byte LITTLE-ENDIAN long, strings hash their UTF-8 bytes, decimals
  * their minimal two's-complement BIG-endian unscaled value, binary its
  * raw bytes. Null buckets to null (a null partition value).
  *
  * The hash itself is the public 32-bit x86 MurmurHash3 with seed 0 —
  * implemented here rather than borrowed because Spark's internal
  * hashers diverge from the reference algorithm on tail bytes, and the
  * spec pins exact values (34 → 2017239379, "iceberg" → 1210000089, …)
  * that cross-writer bucket layouts depend on. */
case class IcebergBucketExpr(child: Expression, n: Int)
  extends UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = s"iceberg_bucket_$n"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | DateType | TimestampType |
      TimestampNTZType | StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket[$n] expects int/long/date/timestamp/string/decimal/" +
        s"binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergBucketExpr.ofLong(v.asInstanceOf[Int].toLong, n)
    case LongType | TimestampType | TimestampNTZType =>
      IcebergBucketExpr.ofLong(v.asInstanceOf[Long], n)
    case StringType => IcebergBucketExpr.ofBytes(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, n)
    case BinaryType =>
      IcebergBucketExpr.ofBytes(v.asInstanceOf[Array[Byte]], n)
    case _: DecimalType => IcebergBucketExpr.ofBytes(
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue.toByteArray, n)
    case other => throw new IllegalStateException(
      s"unreachable: $other passed checkInputDataTypes")
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = child.dataType match {
    case IntegerType | DateType => defineCodeGen(ctx, ev, c =>
      s"graft.functions.IcebergBucketExpr.ofLong((long)$c, $n)")
    case LongType | TimestampType | TimestampNTZType =>
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.IcebergBucketExpr.ofLong($c, $n)")
    case StringType => defineCodeGen(ctx, ev, c =>
      s"graft.functions.IcebergBucketExpr.ofBytes($c.getBytes(), $n)")
    case BinaryType => defineCodeGen(ctx, ev, c =>
      s"graft.functions.IcebergBucketExpr.ofBytes($c, $n)")
    case _: DecimalType => defineCodeGen(ctx, ev, c =>
      s"graft.functions.IcebergBucketExpr.ofBytes(" +
        s"$c.toJavaBigDecimal().unscaledValue().toByteArray(), $n)")
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcebergBucketExpr {
  /** Reference 32-bit x86 MurmurHash3, seed 0 — the exact function the
    * Iceberg spec pins with test vectors. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val len = data.length
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Integral family (int/long/date/timestamp) hashes the 8-byte
    * LITTLE-endian long — the spec's "hashLong" widening rule, which is
    * why bucket(int 34) == bucket(long 34). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def ofLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def ofBytes(b: Array[Byte], n: Int): Int =
    ((murmur3(b) & Int.MaxValue) % n)

  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(IcebergBucketExpr(expression(c), n))
  }
}
