package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-order dot product of two numeric arrays as a native Catalyst
  * `Expression` with whole-stage codegen.
  *
  * The array-HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * computes the same value but array lambda functions never enter codegen:
  * every element pays the expression-tree interpreter plus a lambda-variable
  * binding, which dominates the similarity pipelines (a 64-dim cosine is
  * three folds = 192 interpreted steps per pair). This compiles to a tight
  * primitive loop inside the enclosing stage's generated Java.
  *
  * Semantics are bit-identical to the HOF form it replaces: elements widen
  * to double, products accumulate in INDEX ORDER (fp-deterministic, not
  * reduction-tree order), result is NULL when either array is NULL, lengths
  * differ, or any element is NULL (`zip_with` null-padding semantics).
  *
  * Registered as SQL function `vec_dot` by [[graft.plans.GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }
  private def supported(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType | ShortType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(elemOf(left)) && supported(elemOf(right)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects ARRAY of FLOAT/DOUBLE/INT/BIGINT/SMALLINT, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def readElem(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def elemDouble(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (lt, rt) = (elemOf(left), elemOf(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elemDouble(lt, a, i) * elemDouble(rt, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${readElem(elemOf(left), a, i)} * ${readElem(elemOf(right), b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(DotProduct(expression(a), expression(b)))
  }
}

/** Squared L2 distance between two numeric arrays — same codegen shape,
  * null semantics, and fp-accumulation order as [[DotProduct]], with
  * `acc += d*d` over `d = x - y` per index (bit-identical to the
  * `zip_with((x-y)^2)` + fold form used by the IVF cell assignment, whose
  * exact doubles the argmin tie-break depends on).
  *
  * Registered as SQL function `vec_sqdist` by [[graft.plans.GraftExtensions]].
  */
case class SquaredDistance(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist"

  private def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }
  private def supported(t: DataType): Boolean = t match {
    case FloatType | DoubleType | IntegerType | LongType | ShortType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (supported(elemOf(left)) && supported(elemOf(right)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist expects ARRAY of FLOAT/DOUBLE/INT/BIGINT/SMALLINT, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def readElem(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  private def elemDouble(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (lt, rt) = (elemOf(left), elemOf(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elemDouble(lt, a, i) - elemDouble(rt, b, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = ${readElem(elemOf(left), a, i)} - ${readElem(elemOf(right), b, i)};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SquaredDistance {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(SquaredDistance(expression(a), expression(b)))
  }
}

/** 16-bit md5 bucket of a string as a native codegen expression — the hash
  * every deterministic-sampling operator keys on ([[graft.operators.Sampling]]).
  *
  * Bit-identical to the portable nibble-arithmetic column form the DuckDB
  * oracles replay (`instr(hex, substring(md5(k), i, 1))` folded over the
  * first four hex digits = the first two digest bytes big-endian), while
  * computing ONE digest and ZERO hex strings per row; the column form pays
  * an md5-to-hex allocation plus four UTF8String substring/instr scans. */
case class Md5Bucket16Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_bucket16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_bucket16 expects STRING, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    Md5Bucket16Expr.bucket(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Bucket16Expr.bucket($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Bucket16Expr {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 16 bits of md5(utf8 bytes), big-endian — called from generated
    * code; the digest instance is thread-local (MessageDigest is stateful). */
  def bucket(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xff) << 8) | (d(1) & 0xff)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(Md5Bucket16Expr(expression(c)))
  }
}
