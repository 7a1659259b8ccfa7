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

  test("context-window chunking: coverage, overlap, and short-doc invariants") {
    // random-length docs: every token index is covered, consecutive
    // chunks overlap exactly w−s tokens (except possibly the last, which
    // may overlap more when the tail is short), and re-joining chunk k's
    // text equals the doc's own token slice — chunking loses nothing and
    // invents nothing
    val w = 5; val s = 3
    val rnd = new scala.util.Random(13)
    val texts = (0L until 8L).map { i =>
      val n = 1 + rnd.nextInt(14)
      i -> (0 until n).map(j => s"t${i}_$j").mkString(" ")
    }
    val got = TextAnalysis.chunks(docs(texts: _*), w, s)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    for ((id, text) <- texts) {
      val toksArr = text.split(" ")
      val ch = got(id).sortBy(_._2)
      // chunk count is the documented formula
      val expectN = math.ceil(math.max(toksArr.length - w, 0) / s.toDouble).toInt + 1
      assert(ch.length === expectN, s"doc $id: ${ch.length} chunks, expected $expectN")
      for ((_, k, nTok, ctext) <- ch) {
        val expect = toksArr.slice(k.toInt * s, k.toInt * s + w)
        assert(ctext === expect.mkString(" "), s"doc $id chunk $k text mismatch")
        assert(nTok === expect.length.toLong, s"doc $id chunk $k n_tok mismatch")
      }
      // coverage: the union of chunk index ranges is exactly [0, n)
      val covered = ch.flatMap { case (_, k, nTok, _) =>
        (k.toInt * s) until (k.toInt * s + nTok.toInt) }.toSet
      assert(covered === toksArr.indices.toSet, s"doc $id: coverage hole")
    }
    // a doc shorter than the window is one whole-doc chunk
    val one = TextAnalysis.chunks(docs((99L, "a b")), w, s).collect()
    assert(one.length === 1 && one.head.getString(3) === "a b")
  }
}
