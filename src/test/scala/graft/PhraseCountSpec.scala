package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.PhraseCount

/** The codegen'd phrase counter must agree with the declarative HOF form
  * it replaced (the `q_multifield_pf` oracle contract depends on it), on
  * both the codegen and interpreted paths, including the overlap and
  * repeated-token edge cases. */
class PhraseCountSpec extends SparkSpec {
  import spark.implicits._

  /** The round-12 declarative form: count start positions where every
    * phrase slot matches — the semantics PhraseCount compiles. */
  private def hof(phrase: Seq[String]): String = {
    val conds = phrase.zipWithIndex
      .map { case (t, s) => s"element_at(toks, CAST(i + $s AS INT)) = '$t'" }
      .mkString(" AND ")
    s"CASE WHEN size(toks) < ${phrase.length} THEN 0L ELSE " +
      s"CAST(size(filter(sequence(1, size(toks) - ${phrase.length - 1}), " +
      s"i -> $conds)) AS LONG) END"
  }

  test("codegen path matches the declarative HOF form on random token arrays") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c")
    val rows = (0 until 200).map { _ =>
      Tuple1(Array.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    for (phrase <- Seq(Seq("a", "b"), Seq("a"), Seq("a", "a"), Seq("c", "b", "a"))) {
      val df = rows.toDF("toks")
        .select(PhraseCount.phrase_count(col("toks"), phrase).as("native"),
          expr(hof(phrase)).as("sql"))
      assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)),
        s"divergence for phrase $phrase")
    }
  }

  test("overlaps count per start position; repeated tokens need true adjacency") {
    def count(toks: Seq[String], phrase: Seq[String]): Long =
      Seq(Tuple1(toks.toArray)).toDF("toks")
        .select(PhraseCount.phrase_count(col("toks"), phrase)).head().getLong(0)
    assert(count(Seq("a", "a", "a"), Seq("a", "a")) === 2L,
      "'a a' occurs at starts 1 and 2 of 'a a a' — overlapping starts both count")
    assert(count(Seq("a", "b", "a"), Seq("a", "a")) === 0L,
      "'a a' needs ADJACENT positions, not two occurrences")
    assert(count(Seq("x"), Seq("x", "y")) === 0L, "array shorter than phrase")
    assert(count(Seq.empty, Seq("x")) === 0L, "empty array")
    assert(count(Seq("x", "y"), Seq("x")) === 1L, "1-token phrase is tf")
  }

  test("interpreted eval agrees with the plan result; a null element nulls") {
    val toks = Array("a", "b", "a", "b")
    val e = PhraseCount(
      Literal.create(toks, ArrayType(StringType)), Seq("a", "b"))
    val interpreted = e.nullSafeEval(
      new GenericArrayData(toks.map(UTF8String.fromString(_: String))))
    val viaPlan = Seq(Tuple1(toks)).toDF("toks")
      .select(PhraseCount.phrase_count(col("toks"), Seq("a", "b")))
      .head().getLong(0)
    assert(interpreted === java.lang.Long.valueOf(2L))
    assert(interpreted === viaPlan)
    // a null ELEMENT is contract-violating input (split never makes one):
    // the result nulls loudly rather than miscounting silently
    val r = Seq(Tuple1(Array[String]("a", null, "b"))).toDF("toks")
      .select(PhraseCount.phrase_count(col("toks"), Seq("a", "b"))).head()
    assert(r.isNullAt(0))
  }
}
