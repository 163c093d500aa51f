package graft.functions

import org.apache.spark.sql.{graftshim, Column}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object SimHashKernel {
  /** 64-bit SimHash of an array of token hashes, rendered as a 64-char
    * '1'/'0' string with bit b at string position b (LSB first) — the
    * exact output of the portable HOF spelling
    * (TextFunctions.simhashFromHashesSql) and of the DuckDB oracle
    * (PipelineOracles.simhash). Token hashes are 60-bit non-negative
    * (Sha256Prefix60), so arithmetic vs logical shift is immaterial.
    * Null elements cannot occur (hashes come from a non-null-producing
    * transform) and are counted as sign 0 == all-zero bits. */
  def simhash64(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (counts(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Native Catalyst expression for the SimHash fold. The portable HOF
  * spelling (aggregate over a 64-int accumulator with a zip_with add per
  * token) runs interpreted — higher-order functions never enter
  * whole-stage codegen — and was the q20/q33 constant-factor bottleneck
  * (8.2 s for 5,000 docs at sf0.1). This expression does the same
  * 64×n_token bit fold in one tight primitive loop and implements
  * doGenCode, so it rides inside the generated stage like any built-in.
  * Parity with the HOF spelling is pinned in PipelineSpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def column(c: Column): Column =
    graftshim.column(SimHash64(graftshim.expression(c)))
}
