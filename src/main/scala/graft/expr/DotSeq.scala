package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native sequential dot product over two embedding arrays — the
  * fourth custom-Expression tier entry (after [[SimHash60]],
  * [[NfcNormalize]] and [[EmbedLshSig48]]), replacing the interpreted
  * `aggregate(zip_with(x, y, (p, q) => p * q), 0.0, (s, v) => s + v)`
  * lambda tree in every cosine hot path (guide §4.1: higher-order
  * functions do not take part in whole-stage codegen — each candidate
  * pair paid an interpreter walk per element).
  *
  * Semantics are EXACTLY the lambda formulation the DuckDB oracles
  * mirror: the accumulation is the same left-to-right fold
  * ((0.0 + x₁y₁) + x₂y₂) + … — bit-identical doubles, so every
  * round(sim, 3) matches unchanged — and the null/length behavior is
  * the zip_with one (a missing or null element nulls the product,
  * which nulls the fold from that point on, i.e. the result).
  * Accepts array<float> or array<double> on either side; the
  * float→double widening is Spark's own cast.
  */
case class DotSeq(left: Expression, right: Expression) extends BinaryExpression {
  private def elem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }
  private def ok(e: Expression) =
    elem(e).contains(FloatType) || elem(e).contains(DoubleType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_seq requires array<float>/array<double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_seq"

  private def lFloat: Boolean = elem(left).contains(FloatType)
  private def rFloat: Boolean = elem(right).contains(FloatType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotSeqImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.expr.DotSeqImpl.dot($a, $b, $lFloat, $rFloat);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotSeq =
    copy(left = newLeft, right = newRight)
}

/** Shared by interpreted eval and generated code. */
object DotSeqImpl {
  /** Sequential fold Σ aᵢ·bᵢ; null exactly when the zip_with/aggregate
    * formulation is null (length mismatch or a null element). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var s = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
