package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the 48-bit sign-random-projection
  * LSH signature over an embedding column — the third custom-Expression
  * tier entry (after [[SimHash60]] and [[NfcNormalize]]), replacing the
  * equivalent 48 interpreted `aggregate`/`zip_with` lambda trees with
  * one tight JVM loop over the array.
  *
  * Semantics are EXACTLY the portable formulation the DuckDB oracle
  * mirrors (SparkEntry x28) and the column-path fallback computes:
  * components quantized to floor(x * 1e6) BIGINT micro-units BEFORE the
  * projection; hyperplane sign for (plane p, dim d) = +1 iff the first
  * 8 hex digits of md5("hp:p:d") are odd; bit p of the signature is the
  * sign of the exact integer dot product. The ±1 matrix is md5-derived
  * once per dimensionality and cached (the column path bakes the same
  * values in as plan literals).
  *
  * Accepts array<float> (the parquet embeddings) or array<double>
  * (derived views) — the float→double widening matches Spark's cast.
  */
case class EmbedLshSig48(child: Expression) extends UnaryExpression {
  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(et, _) => Some(et)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(FloatType) | Some(DoubleType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"embed_lsh_sig48 requires array<float> or array<double>, got ${child.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "embed_lsh_sig48"

  private def isFloat: Boolean = elemType.contains(FloatType)

  protected override def nullSafeEval(input: Any): Any =
    EmbedLshImpl.sig48(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.EmbedLshImpl.sig48($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): EmbedLshSig48 =
    copy(child = newChild)
}

/** Shared by interpreted eval and generated code. */
object EmbedLshImpl {
  final val Bits = 48

  /** ±1 sign for plane p, dim d — first 8 hex digits of md5("hp:p:d")
    * odd ⇒ +1 (identical to TrainingOps.hyperplaneSign / the oracle). */
  private def signOf(p: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest(s"hp:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex digits = first 4 bytes big-endian; parity = low bit of byte 3
    if ((dig(3) & 1) == 1) 1L else -1L
  }

  // sign matrix cached per dimensionality: signs(p * dims + d)
  private val cache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def signs(dims: Int): Array[Long] =
    cache.computeIfAbsent(dims, { _ =>
      val m = new Array[Long](Bits * dims)
      var p = 0
      while (p < Bits) {
        var d = 0
        while (d < dims) { m(p * dims + d) = signOf(p, d); d += 1 }
        p += 1
      }
      m
    })

  def sig48(arr: ArrayData, isFloat: Boolean): Long = {
    val dims = arr.numElements()
    val q = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      q(d) = math.floor(x * 1000000d).toLong
      d += 1
    }
    val m = signs(dims)
    var sig = 0L
    var p = 0
    while (p < Bits) {
      var dot = 0L
      var i = 0
      val base = p * dims
      while (i < dims) { dot += q(i) * m(base + i); i += 1 }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
