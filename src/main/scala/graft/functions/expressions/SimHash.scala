package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SimHash fingerprint over an array of 64-bit token hashes.
  *
  * Semantics (identical to the higher-order-function formulation it
  * replaces, and to the DuckDB oracle): for bit i in [0, bits),
  * `vote_i = Σ_tokens ((h >> i) & 1) * 2 − 1`; fingerprint bit i is set iff
  * `vote_i > 0`. Empty array → fingerprint 0; null array → null; null
  * elements are skipped.
  *
  * Why native: the expression-composition version is `bits` separate
  * `aggregate()` lambdas, i.e. O(bits × tokens) interpreted lambda calls and
  * a giant codegen unit per query. This kernel is one fused nested loop with
  * an int[] vote buffer — O(bits × tokens) simple ALU ops, no allocation
  * beyond the buffer, tiny generated code.
  */
case class SimHash(child: Expression, bits: Int = 60) extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<bigint>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = arr.getLong(t)
        var i = 0
        while (i < bits) {
          votes(i) += (((h >> i) & 1L) * 2L - 1L).toInt
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[$bits];
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h = $a.getLong($t);
         |    for (int $i = 0; $i < $bits; $i++) {
         |      $votes[$i] += (int) (((($h >> $i) & 1L) * 2L) - 1L);
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  if ($votes[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
