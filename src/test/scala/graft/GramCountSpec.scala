package graft

import org.apache.spark.sql.functions._
import graft.functions.{GramCount, PhraseCount}

/** The column-gram containment counter must agree with [[PhraseCount]]
  * (the literal-phrase twin whose semantics are already pinned against
  * the declarative HOF form) on every input, on both execution paths,
  * plus the edges PhraseCount cannot express: a data-driven gram column
  * and the empty gram (which the percolation expansion join defines as
  * matching every start). */
class GramCountSpec extends SparkSpec {
  import spark.implicits._

  test("agrees with PhraseCount on random token arrays and grams") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "b", "c")
    val rows = (0 until 200).map { _ =>
      Tuple1(Array.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    for (gram <- Seq(Seq("a", "b"), Seq("a"), Seq("a", "a"), Seq("c", "b", "a"))) {
      val df = rows.toDF("toks")
        .select(GramCount.gram_count(col("toks"), typedlit(gram)).as("bycol"),
          PhraseCount.phrase_count(col("toks"), gram).as("bylit"))
      assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)),
        s"divergence for gram $gram")
    }
  }

  test("the gram is genuinely a column: per-row grams from a join evaluate per pair") {
    val docs = Seq(
      (1L, Array("x", "y", "x", "y")),
      (2L, Array("y", "x"))).toDF("doc_id", "ot")
    val grams = Seq(Tuple1(Array("x", "y")), Tuple1(Array("y", "x")))
      .toDF("gram")
    val got = docs.join(broadcast(grams),
        GramCount.gram_count(col("ot"), col("gram")) > 0)
      .select(col("doc_id"), array_join(col("gram"), " ").as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "x y"), (1L, "y x"), (2L, "y x")))
  }

  test("edges: empty gram matches every start (slice semantics); null elements match null-safely") {
    def count(toks: Seq[String], gram: Seq[String]): Long =
      Seq(Tuple1(toks.toArray)).toDF("toks")
        .select(GramCount.gram_count(col("toks"),
          typedlit(gram).cast("array<string>"))).head().getLong(0)
    // the expansion join this replaces compares slice(ot, i, 0) == []
    // at positions 1..greatest(1, n+1): n+1 matches, 1 on an empty array
    assert(count(Seq("a", "b"), Nil) === 3L)
    assert(count(Seq.empty, Nil) === 1L)
    assert(count(Seq("a"), Seq("a", "b")) === 0L, "array shorter than gram")
    // Null ELEMENTS must behave exactly like the expansion's array-keyed
    // join (Spark's complex-type equality is ordering-based: null == null,
    // null != "x") — the dispatch is a physical choice, so a tokenizer
    // that emits nulls must see identical matches from both branches. A
    // doc with a null token still matches phrases in its null-free
    // regions, and the null-overlapping windows simply don't match.
    val r = Seq(Tuple1(Array[String]("a", "b", null, "a", "b"))).toDF("toks")
      .select(GramCount.gram_count(col("toks"), typedlit(Seq("a", "b")))).head()
    assert(r.getLong(0) === 2L,
      "null-free regions still match; the null-overlapping window does not")
    val g = Seq(Tuple1(Array[String]("a", null))).toDF("gram")
      .select(GramCount.gram_count(typedlit(Seq("a", "b")), col("gram"))).head()
    assert(g.getLong(0) === 0L, "a null gram token matches only a null doc token")
    // and null-safe EQUALITY: [a, null] occurs in [x, a, null, y]
    val eq = Seq(Tuple1(Array[String]("x", "a", null, "y"))).toDF("toks")
      .select(GramCount.gram_count(col("toks"),
        typedlit(Seq("a", null)).cast("array<string>"))).head()
    assert(eq.getLong(0) === 1L, "null matches null, as array equality does")
  }

  test("interpreted eval agrees with the codegen plan result") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(s: String*) = new GenericArrayData(
      s.toArray.map(UTF8String.fromString(_: String)))
    assert(GramCount.compute(arr("a", "b", "a", "b"), arr("a", "b")) ===
      java.lang.Long.valueOf(2L))
    val viaPlan = Seq(Tuple1(Array("a", "b", "a", "b"))).toDF("toks")
      .select(GramCount.gram_count(col("toks"), typedlit(Seq("a", "b"))))
      .head().getLong(0)
    assert(viaPlan === 2L)
  }
}
