package graft

import org.apache.spark.sql.functions._
import graft.functions.RegexpReplaceCount.regexp_replace_count
import graft.operators.Pii

/** The fused replace+count expression must agree with the BUILT-IN pair
  * (`regexp_replace` + `regexp_count`) on every input and on both
  * execution paths — it exists only to halve the PII scrub's regex
  * passes, so any divergence is a correctness bug, not a trade-off. */
class RegexpReplaceCountSpec extends SparkSpec {
  import spark.implicits._

  private def parityCheck(rows: Seq[String], pattern: String,
                          mask: String): Unit = {
    val df = rows.map(Tuple1(_)).toDF("text")
      .select(
        regexp_replace_count(col("text"), pattern, mask).as("fused"),
        regexp_replace(col("text"), pattern, mask).as("clean0"),
        regexp_count(col("text"), lit(pattern)).cast("long").as("n0"))
    val bad = df.filter(col("fused.clean") =!= col("clean0") ||
      col("fused.n") =!= col("n0")).count()
    assert(bad === 0L, s"fused diverges from builtin pair for /$pattern/")
  }

  test("agrees with regexp_replace + regexp_count on the PII dialect") {
    val rnd = new scala.util.Random(17)
    val frags = Seq("plain words ", "u7@ex.org ", "415-555-0199 ",
      "9123456789 ", "a@b.cd ", "no digits here ", "12345678 ",
      "x@y ", "999-999-9999999 ", "", "trailing@mail.example.com")
    val rows = (0 until 300).map { _ =>
      (0 until rnd.nextInt(6)).map(_ => frags(rnd.nextInt(frags.size))).mkString
    }
    parityCheck(rows, Pii.EmailRe, Pii.EmailMask)
    parityCheck(rows, Pii.PhoneRe, Pii.PhoneMask)
    parityCheck(rows, Pii.IdRe, Pii.IdMask)
  }

  test("edges: empty string, no match, all-match, null input") {
    val df = Seq(Some(""), Some("aaa"), Some("zzz"), None).toDF("text")
      .select(col("text"),
        regexp_replace_count(col("text"), "a+", "_").as("f"))
      .collect()
    assert(df(0).getStruct(1).getString(0) === "" &&
      df(0).getStruct(1).getLong(1) === 0L)
    assert(df(1).getStruct(1).getString(0) === "_" &&
      df(1).getStruct(1).getLong(1) === 1L, "one non-overlapping match")
    assert(df(2).getStruct(1).getString(0) === "zzz" &&
      df(2).getStruct(1).getLong(1) === 0L)
    assert(df(3).isNullAt(1), "null input nulls the struct")
  }

  test("interpreted eval agrees with the codegen plan result") {
    import org.apache.spark.unsafe.types.UTF8String
    val pat = java.util.regex.Pattern.compile(Pii.IdRe)
    val direct = graft.functions.RegexpReplaceCount.compute(
      UTF8String.fromString("ref 9123456789 and 12345 and 987654321."),
      pat, Pii.IdMask)
    assert(direct.getUTF8String(0).toString ===
      "ref <ID> and 12345 and <ID>.")
    assert(direct.getLong(1) === 2L)
    val viaPlan = Seq(Tuple1("ref 9123456789 and 12345 and 987654321."))
      .toDF("text")
      .select(regexp_replace_count(col("text"), Pii.IdRe, Pii.IdMask))
      .head().getStruct(0)
    assert(viaPlan.getString(0) === direct.getUTF8String(0).toString)
    assert(viaPlan.getLong(1) === direct.getLong(1))
  }

  test("q_pii_redact's fused form matches the r16 built-in formulation row for row") {
    // the exact pre-r17 query shape, reproduced inline — the fused query
    // must be indistinguishable on the fixture it is graded on
    val dir = "/root/testdata/sf0.001"
    val fused = SparkEntry.queries("q_pii_redact")(spark, dir)
    val d = graft.operators.Pii.decorated(Tables.documents(spark, dir))
    val builtin = d.select(col("doc_id") +: Pii.counts(col("text")) :+
        Pii.redact(col("text")).as("clean"): _*)
      .orderBy("doc_id")
    assert(fused.exceptAll(builtin).count() === 0L)
    assert(builtin.exceptAll(fused).count() === 0L)
  }
}
