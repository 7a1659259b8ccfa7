package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `regexp_replace` and `regexp_count` FUSED into one scan of the input:
  * (clean, n) where `clean` is the input with every non-overlapping match
  * of `pattern` replaced by `replacement` and `n` is the match count —
  * exactly the pair the PII scrub derives per category.
  *
  * WHY: the scrub chains three categories, and counting each category on
  * the text AS SEEN by its replace stage (mask earlier categories first —
  * the operator's masking-order contract) makes the built-in formulation
  * run SIX regex passes per row (three `regexp_replace` + three
  * `regexp_count`, each a full `Matcher.find()` scan; Catalyst's
  * subexpression elimination dedupes the shared replace PREFIXES but can
  * never merge a count with its replace twin — different expression
  * classes). One fused pass per category halves the regex work at
  * identical semantics: a single `find()` loop both appends replacements
  * and counts, so count-equals-replacements holds by construction, not by
  * keeping two expressions in sync.
  *
  * Pattern and replacement must be FOLDABLE (query constants — the PII
  * dialect is fixed at plan time); the compiled Pattern is built once per
  * plan and shipped as a codegen reference, never per row. Replacement
  * semantics are java.util.regex's `appendReplacement` with the raw
  * string — bit-identical to Spark's own `RegExpReplace` (which calls the
  * same API), including `$group` references. A null input nulls the
  * result (TernaryExpression's default). Interpreted/codegen parity is
  * spec-pinned against the built-in pair (RegexpReplaceCountSpec). */
case class RegexpReplaceCount(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, StringType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable STRING pattern, foldable " +
          s"STRING replacement), got ($a, $b, $c; foldable=" +
          s"${second.foldable}/${third.foldable})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace_count"

  @transient private lazy val compiled: Pattern =
    Pattern.compile(second.eval().asInstanceOf[UTF8String].toString)
  @transient private lazy val replacement: String =
    third.eval().asInstanceOf[UTF8String].toString

  override def nullSafeEval(t: Any, p: Any, r: Any): Any =
    RegexpReplaceCount.compute(t.asInstanceOf[UTF8String], compiled, replacement)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pat = ctx.addReferenceObj("rrcPattern", compiled,
      "java.util.regex.Pattern")
    val rep = ctx.addReferenceObj("rrcReplacement", replacement,
      "java.lang.String")
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = graft.functions.RegexpReplaceCount.compute($t, $pat, $rep);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RegexpReplaceCount {
  /** Column-API entry point: struct(clean STRING, n LONG). */
  def regexp_replace_count(text: Column, pattern: String,
                           replacement: String): Column =
    Bridge.column(RegexpReplaceCount(Bridge.expression(text),
      Bridge.expression(org.apache.spark.sql.functions.lit(pattern)),
      Bridge.expression(org.apache.spark.sql.functions.lit(replacement))))

  /** The fused kernel — one `find()` loop appends replacements AND
    * counts. Called from generated code and `nullSafeEval`. */
  def compute(text: UTF8String, pattern: Pattern,
              replacement: String): InternalRow = {
    val m = pattern.matcher(text.toString)
    val sb = new java.lang.StringBuffer
    var n = 0L
    while (m.find()) {
      m.appendReplacement(sb, replacement)
      n += 1
    }
    m.appendTail(sb)
    val out = new Array[Any](2)
    out(0) = UTF8String.fromString(sb.toString)
    out(1) = n
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}
