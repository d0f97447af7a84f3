package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the session's FunctionRegistry (private[sql]),
  * so library code can register native expressions on an already-built
  * session without requiring the spark.sql.extensions config. */
object GraftRegistry {
  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    // Register once per session: createOrReplaceTempFunction logs a
    // "replacing built-in function" WARN on every re-registration, and
    // TrainingOps calls this before each native-expression use — the
    // spam buried real warnings in Verify/Bench stderr (VERDICT r03
    // next #10). The builder for a given name never changes, so
    // skipping the replace is behavior-identical.
    if (!registry.functionExists(FunctionIdentifier(name)))
      registry.createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** Direct Column construction for the engine's native expressions, so
  * pure Column-builder helpers (no SparkSession in scope) can use them
  * without a registry round-trip. */
object GraftColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Sequential dot product ([[graft.expr.DotSeq]]) as a Column. */
  def dotSeq(a: Column, b: Column): Column =
    ExpressionUtils.column(graft.expr.DotSeq(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
