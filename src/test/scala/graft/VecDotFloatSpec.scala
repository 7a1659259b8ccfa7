package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import graft.functions.VecDotFloat

/** The native codegen'd dot product must be bit-identical to the pure-SQL
  * higher-order fold it replaces (the DuckDB oracle contract depends on
  * it), on both the codegen and interpreted paths. */
class VecDotFloatSpec extends SparkSpec {
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  test("codegen path matches the higher-order-function fold bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 64).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
      .select(VecDotFloat.vec_dot(col("a"), col("b")).as("native"), expr(hof).as("sql"))
    assert(df.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("interpreted eval agrees with codegen result") {
    val a = Array(0.1f, -0.5f, 3.25f)
    val b = Array(2.0f, 4.0f, -1.5f)
    val e = VecDotFloat(
      Literal.create(a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Literal.create(b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.nullSafeEval(new GenericArrayData(a), new GenericArrayData(b))
    val viaPlan = Seq((a, b)).toDF("a", "b")
      .select(VecDotFloat.vec_dot(col("a"), col("b"))).head().getDouble(0)
    assert(interpreted === viaPlan)
  }

  test("a null element nulls the result, same as the SQL fold") {
    val df = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](2.0f, 3.0f)))
      .toDF("a", "b")
      .select(VecDotFloat.vec_dot(col("a"), col("b")).as("native"), expr(hof).as("sql"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("mismatched lengths null the result, same as the SQL fold; type mismatch fails analysis") {
    // zip_with null-pads the shorter array, which nulls the fold — the
    // native expression must agree (codegen path via the DataFrame, and
    // the interpreted path via nullSafeEval).
    val df = Seq((Array(1f, 2f, 3f), Array(10f, 10f)))
      .toDF("a", "b")
      .select(VecDotFloat.vec_dot(col("a"), col("b")).as("native"), expr(hof).as("sql"))
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val e = VecDotFloat(
      Literal.create(Array(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Literal.create(Array(10f, 10f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.nullSafeEval(
      new GenericArrayData(Array(1f, 2f, 3f)), new GenericArrayData(Array(10f, 10f))) == null)
    intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(VecDotFloat.vec_dot(col("a"), col("b"))).head()
    }
  }
}
