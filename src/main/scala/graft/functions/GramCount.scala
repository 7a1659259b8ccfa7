package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** [[PhraseCount]] with the phrase as a COLUMN: the number of start
  * positions where `right`'s token array occurs contiguously inside
  * `left`'s — one compiled O(len × gram_len) scan with early-exit, inside
  * whole-stage codegen.
  *
  * WHY a second expression when [[PhraseCount]] exists: PhraseCount
  * compiles ONE driver-known phrase into the plan — right for query-time
  * phrases (`pf`). Percolation inverts that: the phrases are DATA (a
  * stored-query registry), so the matcher needs the gram as an ordinary
  * column — `docs crossJoin broadcast(grams)` then one compiled
  * containment scan per (doc, gram) pair. For small gram sets this
  * replaces the per-doc k-gram ARRAY EXPANSION (|doc tokens| slice
  * allocations per doc per length, through an interpreted higher-order
  * transform, then an array-keyed join) with a zero-allocation primitive
  * loop — the same HOF→codegen move that retired `q_multifield_pf`
  * (round 13).
  *
  * Semantics mirror the expansion join exactly, including the edges: an
  * EMPTY gram matches at every position (slice(ot,i,0) == [] for all i —
  * n+1 starts), and an array shorter than the gram counts 0. A null
  * INPUT nulls the result (BinaryExpression's default). Null ELEMENTS
  * compare null-safely — a null token matches only a null gram token —
  * because that is what the expansion's array-keyed join does (Spark's
  * complex-type equality is ordering-based, so [a, null] == [a, null]):
  * a tokenizer that emits nulls must see the SAME matches from both
  * dispatch branches, or registering a 33rd phrase would flip existing
  * docs' alerts (round-14 review finding). */
case class GramCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<STRING> inputs, got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "gram_count"

  override def nullSafeEval(a: Any, g: Any): Any =
    GramCount.compute(a.asInstanceOf[ArrayData], g.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, g) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.GramCount.compute($x, $g);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramCount {
  /** Column-API entry point. */
  def gram_count(tokens: Column, gram: Column): Column =
    Bridge.column(GramCount(Bridge.expression(tokens), Bridge.expression(gram)))

  /** The compiled kernel — called from generated code and `nullSafeEval`.
    * Null elements match null-safely (see the class doc); never returns
    * null itself (input-level nulls are the expression's concern). One
    * O(n+m) pre-pass detects null elements so the overwhelmingly common
    * null-free case runs the pure-equality loop with no per-position
    * null branches (the branchy loop measured ~1.5× slower on the
    * percolation scan). */
  def compute(x: ArrayData, g: ArrayData): java.lang.Long = {
    val n = x.numElements()
    val m = g.numElements()
    if (m == 0) // every slice(ot, i, 0) == []: n+1 starts (1 when n == 0)
      return java.lang.Long.valueOf(n + 1L)
    var hasNull = false
    var t = 0
    while (!hasNull && t < n) { hasNull = x.isNullAt(t); t += 1 }
    t = 0
    while (!hasNull && t < m) { hasNull = g.isNullAt(t); t += 1 }
    var count = 0L
    val last = n - m
    var i = 0
    if (!hasNull) {
      while (i <= last) {
        var j = 0
        var ok = true
        while (ok && j < m) {
          if (!x.getUTF8String(i + j).equals(g.getUTF8String(j))) ok = false
          j += 1
        }
        if (ok) count += 1
        i += 1
      }
    } else {
      while (i <= last) {
        var j = 0
        var ok = true
        while (ok && j < m) {
          val xn = x.isNullAt(i + j)
          val gn = g.isNullAt(j)
          if (xn != gn) ok = false
          else if (!xn && !x.getUTF8String(i + j).equals(g.getUTF8String(j)))
            ok = false
          j += 1
        }
        if (ok) count += 1
        i += 1
      }
    }
    java.lang.Long.valueOf(count)
  }
}
