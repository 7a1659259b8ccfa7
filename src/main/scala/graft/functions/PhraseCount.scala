package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Contiguous-phrase occurrence count in a token array, in ONE compiled
  * pass: the number of start positions `i` where `toks(i) == phrase(0)`,
  * `toks(i+1) == phrase(1)`, … — Solr edismax `pf`'s phrase frequency
  * (`q_multifield_pf`). A single-term "phrase" degenerates to plain term
  * frequency, so this also serves the `qf` tf counts over pre-split token
  * arrays.
  *
  * WHY: the declarative forms — `size(filter(toks, t => t === term))` for
  * tf, `size(filter(sequence(1, n), i => element_at…))` for the phrase —
  * are higher-order functions, which Spark evaluates INTERPRETED
  * (CodegenFallback), knocking the whole projection out of whole-stage
  * codegen and disabling common-subexpression elimination around it. The
  * round-12 bench convicted exactly this: `q_multifield_pf` at 2.3 s vs
  * the structurally-identical `q_multifield_qf` at 0.3 s. This expression
  * is a compiled O(len × phrase_len) scan with early-exit per start
  * position (O(len) in practice), inside codegen.
  *
  * Null handling follows [[RunLengthStats]]: a null ELEMENT nulls the
  * result (split() never produces one; anything else is contract-violating
  * input that must be loudly visible, not silently miscounted). An array
  * shorter than the phrase counts 0.
  *
  * Same preference ladder as [[RunLengthStats]]/[[VecDotFloat]]: a custom
  * `Expression` with `doGenCode` where the built-in's execution model —
  * not its semantics — is the bottleneck; never a Scala UDF. */
case class PhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression {

  require(phrase.nonEmpty, "phrase_count needs at least one phrase token")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> input, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "phrase_count"

  @transient private lazy val utf8Phrase: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    PhraseCount.compute(a.asInstanceOf[ArrayData], utf8Phrase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE form of the array type — Class.getName's "[L…;" JVM
    // notation is not parseable by Janino in the generated cast
    val ref = ctx.addReferenceObj("phrase", utf8Phrase,
      classOf[UTF8String].getName + "[]")
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.PhraseCount.compute($x, $ref);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseCount {
  /** Column-API entry point. */
  def phrase_count(tokens: Column, phrase: Seq[String]): Column =
    Bridge.column(PhraseCount(Bridge.expression(tokens), phrase))

  /** The compiled kernel — called from generated code and `nullSafeEval`.
    * Returns null on a null element (contract-violating input). */
  def compute(x: ArrayData, phrase: Array[UTF8String]): java.lang.Long = {
    val n = x.numElements()
    val m = phrase.length
    var count = 0L
    var i = 0
    val last = n - m
    while (i < n) {
      if (x.isNullAt(i)) return null
      i += 1
    }
    i = 0
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (!x.getUTF8String(i + j).equals(phrase(j))) ok = false
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    java.lang.Long.valueOf(count)
  }
}
