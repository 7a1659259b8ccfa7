package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Tokenizer / shingle edge cases (SURVEY.md §5 item 4): empty text,
  * single tokens, sub-shingle-length docs must neither crash nor emit
  * phantom shingles. */
class TokenizerEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("docs shorter than the shingle width contribute no shingles") {
    val sh = TextAnalysis.shingles(docs(
      (0L, ""), (1L, "one"), (2L, "one two"), (3L, "one two three")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(sh.toSet === Set((3L, "one two three")))
  }

  test("empty text yields one empty whitespace token (split semantics), zero stop ratio") {
    val r = docs((0L, ""))
      .select(size(split(col("text"), " ")).as("n"),
        TextAnalysis.stopRatio(split(col("text"), " ")).as("sr"))
      .head()
    assert(r.getInt(0) === 1) // [""]
    assert(r.getDouble(1) === 0.0)
  }

  test("repeated-token docs: distinct-shingle count stays bounded") {
    val sh = TextAnalysis.shingles(docs((0L, "a a a a a a")))
    // 4 positions, all the same 3-gram — consumers dedupe
    assert(sh.count() === 4)
    assert(sh.distinct().count() === 1)
  }

  test("punctuation stays inside whitespace tokens; regex token count differs") {
    val r = docs((0L, "end. of, line"))
      .select(size(split(col("text"), " ")).cast("long").as("ws"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("long").as("alnum"))
      .head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 3L) // "end", "of", "line" — punctuation stripped
  }
}
