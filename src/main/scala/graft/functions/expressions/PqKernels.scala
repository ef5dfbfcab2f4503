package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels — the third ANN access path next to LSH and
  * IVF (see [[graft.operators.Similarity]]): vectors are split into `m`
  * subvectors, each encoded as the id of its nearest subspace centroid
  * (1 byte), and query–document distance is approximated by `m` table
  * lookups (ADC — asymmetric distance computation) instead of a full
  * `dim`-wide arithmetic pass. At 100 TB the corpus stores m bytes per
  * vector (64× smaller than float64) and pair scoring is O(m), not O(dim).
  *
  * All arithmetic is deterministic IEEE double, accumulated in fixed
  * ascending order (subspace-major, then dimension / centroid id), with
  * strict `<` argmin (first minimum wins) — the DuckDB oracle replays every
  * step bit-identically.
  */
object PqOps {

  /** Read a float/double array column into doubles. */
  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  /** Codes: per subspace, the 0-based id of the L2²-nearest centroid (ties →
    * smallest id). Null on dimension mismatch.
    */
  def encode(vec: ArrayData, isFloat: Boolean, cb: Array[Array[Array[Double]]]): ArrayData = {
    val v = toDoubles(vec, isFloat)
    val m = cb.length
    val sub = cb(0)(0).length
    if (v.length != m * sub) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cents = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0.0
        var t = 0
        while (t < sub) { val diff = v(s * sub + t) - c(t); d += diff * diff; t += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance table for one query: `m·k` doubles, entry `s·k + j` =
    * L2²(query subvector s, centroid j of subspace s). Computed once per
    * query row; every corpus pair then costs `m` lookups. Null on dimension
    * mismatch.
    */
  def distTable(vec: ArrayData, isFloat: Boolean, cb: Array[Array[Array[Double]]]): ArrayData = {
    val v = toDoubles(vec, isFloat)
    val m = cb.length
    val k = cb(0).length
    val sub = cb(0)(0).length
    if (v.length != m * sub) return null
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val c = cb(s)(j)
        var d = 0.0
        var t = 0
        while (t < sub) { val diff = v(s * sub + t) - c(t); d += diff * diff; t += 1 }
        out(s * k + j) = d
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Approximate distance: Σ_s table[s·k + codes[s]], summed in ascending
    * subspace order (fixed association — cross-engine exact). Null when the
    * table length is not a multiple of the code length or a code is out of
    * range.
    */
  def adcScore(table: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0 || table.numElements() % m != 0) return null
    val k = table.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val j = codes.getByte(s).toInt
      if (j < 0 || j >= k) return null
      acc += table.getDouble(s * k + j)
      s += 1
    }
    acc
  }
}

private[expressions] trait FloatArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects array<float|double>, got ${other.simpleString}")
  }
  protected def elemIsFloat: Boolean =
    self.child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** PQ codes (array<tinyint>, length m) for a vector against a fixed codebook
  * `[m][k][subdim]`. Null vector or wrong dimension → null.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with FloatArrayInput {
  require(codebook.nonEmpty && codebook.forall(s => s.nonEmpty && s.length <= 127),
    "PQ codebook must have 1..127 centroids per subspace (codes are signed bytes)")

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], elemIsFloat, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.PqOps.encode($c, $elemIsFloat, $cbRef);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC distance table (array<double>, length m·k) for a query vector. */
case class PqDistTable(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with FloatArrayInput {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PqOps.distTable(input.asInstanceOf[ArrayData], elemIsFloat, codebook)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.PqOps.distTable($c, $elemIsFloat, $cbRef);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Approximate query–document distance: m table lookups (the ADC hot loop). */
case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects (array<double>, array<tinyint>), got (${l.simpleString}, ${r.simpleString})")
  }

  override protected def nullSafeEval(table: Any, codes: Any): Any =
    PqOps.adcScore(table.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => s"""
      java.lang.Double ${ev.value}$$box = graft.functions.expressions.PqOps.adcScore($t, $c);
      ${ev.isNull} = ${ev.value}$$box == null;
      if (!${ev.isNull}) ${ev.value} = ${ev.value}$$box.doubleValue();""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
