package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 60-bit SimHash fingerprint —
  * the custom-operator tier (b) of the Spark-first preference order:
  * a codegen'd `Expression` instead of the equivalent (and much
  * slower) nested `aggregate`/`zip_with` lambda tree or a Scala UDF.
  *
  * Semantics are EXACTLY the portable formulation the DuckDB oracle
  * mirrors (SparkEntry x03): per word of the whitespace-collapsed
  * input (single-space split, trailing empties kept), the hash is the
  * first 15 hex digits of md5 (60 bits, fits signed 64-bit in every
  * engine); each bit accumulates +1/-1 votes over all word
  * occurrences; the sign bits assemble the fingerprint.
  *
  * Input must already be normalized (TrainingOps.normText) — the
  * lower/collapse/trim stages stay as built-in codegen'd columns.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  protected override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash60(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHashImpl.simhash60($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** JVM implementation shared by interpreted eval and generated code
  * (Scala object static forwarders make `SimHashImpl.simhash60(...)`
  * callable from Janino-generated Java). */
object SimHashImpl {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(utf8(word)) as a long — identical to
    * conv(substring(md5(w),1,15),16,10): bytes 0-6 big-endian plus the
    * high nibble of byte 7. */
  def wordHash60(word: String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def simhash60(norm: String): Long = {
    val votes = new Array[Int](60)
    var start = 0
    val n = norm.length
    var more = true
    while (more) {
      var end = norm.indexOf(' ', start)
      if (end < 0) { end = n; more = false }
      val h = wordHash60(norm.substring(start, end))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      start = end + 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sim |= 1L << b; b += 1 }
    sim
  }
}
