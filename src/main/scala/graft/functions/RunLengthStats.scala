package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word- and adjacent-bigram frequency statistics of a token array in ONE
  * compiled pass: `(top_bigram_n, n_distinct_bigrams, top_word_n,
  * n_distinct_words)` — the Gopher/MassiveText repetition signals
  * (`q_repetition`, `TextAnalysis.topBigramFrac`/`topWordFrac`).
  *
  * WHY: the declarative form needs two higher-order `aggregate` folds over
  * two `array_sort`ed arrays plus a `transform` that materializes every
  * bigram as a concatenated string — all lambda expressions, which Spark
  * evaluates INTERPRETED (higher-order functions are the one expression
  * family outside whole-stage codegen), measured as the suite's slowest
  * key (1.4 s quiet at sf0.1). This expression sorts token indices with
  * compiled comparisons — bigram identity is the token PAIR, so no bigram
  * string is ever built — and run-scans once per array.
  *
  * Semantics match the lambda form exactly (RepetitionSpec pins the
  * equivalence property-style): a bigram is an adjacent token pair,
  * equal iff both tokens are equal; counts are occurrence counts. For
  * arrays with fewer than 2 elements the bigram stats are 0; for empty
  * arrays all stats are 0. A null ELEMENT nulls the result (split()
  * never produces one; anything else is contract-violating input that
  * must be loudly visible, not silently miscounted).
  *
  * Same preference ladder as [[VecDotFloat]]/[[SortedIntersectCount]]: a
  * custom `Expression` with `doGenCode` where the built-in's execution
  * model — not its semantics — is the bottleneck; never a Scala UDF. */
case class RunLengthStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<STRING> input, got $t")
  }
  override def dataType: DataType = RunLengthStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "run_length_stats"

  override def nullSafeEval(a: Any): Any =
    RunLengthStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = graft.functions.RunLengthStats.compute($x);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunLengthStats {
  val schema: StructType = StructType(Seq(
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false)))

  /** Column-API entry point. */
  def run_length_stats(tokens: Column): Column =
    Bridge.column(RunLengthStats(Bridge.expression(tokens)))

  /** The compiled kernel — called from generated code and `nullSafeEval`.
    * Returns null on a null element. */
  def compute(x: ArrayData): InternalRow = {
    val n = x.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      toks(i) = x.getUTF8String(i)
      i += 1
    }
    var topWord = 0L
    var distinctWords = 0L
    if (n > 0) {
      val ws = java.util.Arrays.copyOf(toks, n)
      java.util.Arrays.sort(ws.asInstanceOf[Array[AnyRef]])
      var run = 1L
      distinctWords = 1L
      topWord = 1L
      i = 1
      while (i < n) {
        if (ws(i).compareTo(ws(i - 1)) == 0) run += 1
        else { run = 1; distinctWords += 1 }
        if (run > topWord) topWord = run
        i += 1
      }
    }
    var topBigram = 0L
    var distinctBigrams = 0L
    if (n >= 2) {
      // sort bigram START INDICES by (token, next token): identity is the
      // pair, so no bigram string is ever materialized
      val idx = new Array[Integer](n - 1)
      i = 0
      while (i < n - 1) { idx(i) = Integer.valueOf(i); i += 1 }
      val cmp = new java.util.Comparator[Integer] {
        override def compare(a: Integer, b: Integer): Int = {
          val c0 = toks(a).compareTo(toks(b))
          if (c0 != 0) c0 else toks(a + 1).compareTo(toks(b + 1))
        }
      }
      java.util.Arrays.sort(idx, cmp)
      var run = 1L
      distinctBigrams = 1L
      topBigram = 1L
      i = 1
      while (i < n - 1) {
        if (cmp.compare(idx(i), idx(i - 1)) == 0) run += 1
        else { run = 1; distinctBigrams += 1 }
        if (run > topBigram) topBigram = run
        i += 1
      }
    }
    new GenericInternalRow(
      Array[Any](topBigram, distinctBigrams, topWord, distinctWords))
  }
}
