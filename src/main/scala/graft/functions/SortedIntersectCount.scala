package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection SIZE of two ASC-SORTED `ARRAY<STRING>` columns by linear
  * merge — `size(array_intersect(a, b))` for pre-sorted, duplicate-free
  * inputs, without `array_intersect`'s per-call hash set.
  *
  * WHY: the dedup probe scores |candidate pairs| Jaccards per micro-batch,
  * and each `array_intersect` call builds (and garbage-collects) a hash
  * set over one side — measured as ~90% of the probe's score-join time at
  * 362k pairs (sf0.1 profile). The per-document sketch arrays are computed
  * once and reused across every pair the document appears in, so sorting
  * them once per DOCUMENT (array_sort at sketch time) buys a merge-scan
  * per PAIR with zero allocation — the classic sorted-postings-
  * intersection move, here as a whole-stage-codegen'd expression.
  *
  * CONTRACT: both inputs must be sorted ascending in Spark's UTF8String
  * binary order (`array_sort`) with no duplicate elements (`array_distinct`
  * upstream) and no null elements; a null element ENCOUNTERED by the
  * merge nulls the result (one past the shorter side's exhaustion is
  * never read — contract-violating input is best-effort, not validated).
  * Unsorted input
  * gives an UNDERCOUNT, not an error — callers own the sort, which is why
  * the expression lives next to its callers rather than in a public SQL
  * registry.
  *
  * Same preference ladder as [[VecDotFloat]]: a custom Expression with
  * `doGenCode` where the built-in's execution model — not its semantics —
  * is the bottleneck; never a Scala UDF.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<STRING> inputs, got $l and $r")
    }
  override def dataType: DataType = IntegerType
  // null elements null the result (a null never matches in array_intersect
  // either, but an ordered merge cannot place it — fail to null, loudly
  // visible, rather than undercount silently)
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point: both inputs must be `array_sort`ed,
    * duplicate-free `ARRAY<STRING>`. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
