package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two `ARRAY<FLOAT>` columns, accumulated
  * in double precision left-to-right.
  *
  * Semantically identical to the pure-SQL formulation
  * `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  * (acc, v) -> acc + v)` — same element order, same IEEE operations, and
  * null on length mismatch (zip_with null-pads the shorter array, which
  * nulls the fold) — so it stays bit-for-bit comparable with the DuckDB
  * oracle — but it compiles to
  * a tight primitive loop inside whole-stage codegen instead of two
  * interpreted higher-order lambdas with a materialized intermediate array.
  * On a 100 TB embedding scan the interpreted lambda path allocates one
  * zipped array per row per comparison; this allocates nothing.
  *
  * This is the preference ladder of SURVEY.md §7.4 / the build contract in
  * action: built-ins where they suffice, a custom `Expression` with
  * `doGenCode` where the built-in's execution model (not its semantics) is
  * the bottleneck — and never an opaque Scala UDF.
  */
case class VecDotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  // nullable even when both inputs are non-null arrays: a null ELEMENT
  // nulls the result (matching the SQL fold), and the planner must not
  // elide the null check
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the zip_with fold (the shorter side
    // is null-padded, and a null element nulls the accumulator)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element nulls the whole product — same as the SQL fold,
      // where null * y propagates through the accumulator
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDotFloat {
  /** Column-API entry point: `vec_dot(col("a"), col("b"))`. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDotFloat(Bridge.expression(a), Bridge.expression(b)))
}
