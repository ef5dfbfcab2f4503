package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fused kernel for symmetric int8 embedding quantization — the
  * codegen'd form of `Similarity.quantizeInt8Builtin` (the differential
  * twin): `scale = 127 / max|x|`, `code_i = floor(x_i·scale + 0.5)` as one
  * two-pass loop over the `ArrayData` buffer.
  *
  * Why an Expression: the builtin formulation runs THREE higher-order
  * passes per row (`transform` to |x|, `array_max`, `transform` to codes),
  * each allocating an intermediate array and invoking an interpreted
  * lambda per element. Quantization runs corpus-wide (it is the storage
  * path every embedding takes before ANN serving), so the allocation-free
  * fused loop matters the same way the cosine kernel does.
  *
  * Semantics pinned to the builtin twin (the differential contract):
  *   - null INPUT → `struct(0.0, null)` (the struct itself is never null,
  *     exactly like `struct(when(...), transform(null))`)
  *   - empty array / all-null elements → `struct(0.0, [])` / all-null codes
  *     with scale 0.0 (array_max over no non-null values is null)
  *   - null ELEMENT → null code at that position; non-null elements still
  *     quantize (array_max skips nulls)
  *   - max|x| uses `java.lang.Double.compare` ordering — NaN ranks largest,
  *     matching Spark's array_max ordering
  *   - zero max → scale 0.0, all codes 0 (floor(0·x + 0.5) = 0)
  *   - codes are exact integers in [-127, 127] by construction; the final
  *     narrowing matches Cast(double → byte) on that in-range domain
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8Quantize.outType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(et, _)
          if et.isInstanceOf[NumericType] && !et.isInstanceOf[DecimalType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quantize expects a non-decimal numeric array, got ${other.simpleString}")
    }

  // struct(0.0, null) on null input — the expression's own output is never null
  override def nullable: Boolean = false

  private def elemType: NumericType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return InternalRow(0.0, null)
    val arr = v.asInstanceOf[ArrayData]
    val t = elemType
    val n = arr.numElements()
    var mabs = 0.0
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = math.abs(toDouble(arr, i, t))
        if (!any || java.lang.Double.compare(x, mabs) > 0) mabs = x
        any = true
      }
      i += 1
    }
    val scale = if (!any || mabs == 0.0) 0.0 else 127.0 / mabs
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        codes(i) = math.floor(toDouble(arr, i, t) * scale + 0.5).toLong.toByte
      i += 1
    }
    InternalRow(scale, new GenericArrayData(codes))
  }

  private def toDouble(arr: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType   => arr.getFloat(i).toDouble
    case DoubleType  => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case _           => 0.0
  }

  private def getter(t: NumericType, arr: String, i: String): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case _           => s"0.0d"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val t = elemType
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val mabs = ctx.freshName("mabs")
    val any = ctx.freshName("any")
    val x = ctx.freshName("x")
    val scale = ctx.freshName("scale")
    val codes = ctx.freshName("codes")
    val row = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
    val gad = classOf[GenericArrayData].getName
    ev.copy(code = code"""
      |${childGen.code}
      |InternalRow ${ev.value} = null;
      |if (${childGen.isNull}) {
      |  ${ev.value} = new $row(new Object[]{ java.lang.Double.valueOf(0.0d), null });
      |} else {
      |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${childGen.value};
      |  int $n = $arr.numElements();
      |  double $mabs = 0.0; boolean $any = false;
      |  for (int $i = 0; $i < $n; $i++) {
      |    if (!$arr.isNullAt($i)) {
      |      double $x = java.lang.Math.abs(${getter(t, arr, i)});
      |      if (!$any || java.lang.Double.compare($x, $mabs) > 0) $mabs = $x;
      |      $any = true;
      |    }
      |  }
      |  double $scale = (!$any || $mabs == 0.0d) ? 0.0d : 127.0d / $mabs;
      |  Object[] $codes = new Object[$n];
      |  for (int $i = 0; $i < $n; $i++) {
      |    if (!$arr.isNullAt($i)) {
      |      $codes[$i] = java.lang.Byte.valueOf((byte) (long) java.lang.Math.floor(
      |        ${getter(t, arr, i)} * $scale + 0.5d));
      |    }
      |  }
      |  ${ev.value} = new $row(new Object[]{
      |    java.lang.Double.valueOf($scale), new $gad($codes) });
      |}
      |""".stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Quantize {
  /** `struct(scale double, codes array<tinyint>)` — byte codes are the
    * operator's entire point (4× smaller than float32).
    */
  val outType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = true), nullable = true)))
}
