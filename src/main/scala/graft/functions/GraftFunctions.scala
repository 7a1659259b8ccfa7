package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of the library's native expressions.
  *
  * Two registration paths, mirroring how Spark libraries ship functions:
  *  - [[GraftFunctions.register]] for an existing session (temp function in
  *    the session's registry);
  *  - [[GraftExtensions]] for `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injected at session build, survives `newSession()`).
  */
object GraftFunctions {

  private[functions] val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDotFloat(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot_f expects 2 arguments, got ${other.length}")
  }

  private[functions] val vecDotInfo: ExpressionInfo = new ExpressionInfo(
    classOf[VecDotFloat].getName, null, "vec_dot_f",
    "vec_dot_f(a, b) - double-precision dot product of two ARRAY<FLOAT> columns.",
    "")

  /** Make `vec_dot_f` callable from `spark.sql` in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_f", vecDotBuilder, "scala_udf")
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("vec_dot_f"),
      GraftFunctions.vecDotInfo, GraftFunctions.vecDotBuilder))
}
