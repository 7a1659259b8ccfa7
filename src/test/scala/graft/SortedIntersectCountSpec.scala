package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectCount

/** [[SortedIntersectCount]] must agree exactly with
  * `size(array_intersect(...))` on its contract inputs (sorted, distinct,
  * null-free) — checked on random arrays through the DataFrame (codegen)
  * path and the interpreted eval path. */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "d e", "", "zz", "y", "木", "木木", "x1")
    val rows = Seq.fill(300) {
      val a = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      val b = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(array_sort(array_distinct(col("a"))).as("sa"),
        array_sort(array_distinct(col("b"))).as("sb"))
      .select(
        SortedIntersectCount.sorted_intersect_count(col("sa"), col("sb")).as("got"),
        size(array_intersect(col("sa"), col("sb"))).as("want"))
      .collect()
    df.foreach(r => assert(r.getInt(0) === r.getInt(1), r))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def lit2(xs: Seq[String]) = Literal.create(xs, ArrayType(StringType))
    val e = SortedIntersectCount(
      lit2(Seq("a", "b", "c", "x")), lit2(Seq("b", "c", "d")))
    assert(e.eval(null) === 2)
    val empty = SortedIntersectCount(lit2(Seq.empty), lit2(Seq("a")))
    assert(empty.eval(null) === 0)
  }

  test("null element nulls the result; type mismatch is rejected") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
    val withNull = SortedIntersectCount(
      Literal.create(Seq("a", null), ArrayType(StringType)),
      Literal.create(Seq("a", "b"), ArrayType(StringType)))
    assert(withNull.eval(null) === null)
    val bad = SortedIntersectCount(
      Literal.create(Seq(1), ArrayType(IntegerType)),
      Literal.create(Seq("a"), ArrayType(StringType)))
    assert(!bad.checkInputDataTypes().isSuccess)
  }
}
