package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.operators.{Analyzer, Index}

/** The analyzer seam: whitespace default unchanged, CJK bigram fallback
  * tokenizes space-free text (the reference is a Chinese-language system
  * whose tokenization lives in the Solr schema — a migration hits
  * space-free text on day one). */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(tk: graft.operators.Tokenizer, s: String): Seq[String] =
    Seq(s).toDF("text").select(tk.tokens(col("text")).as("t"))
      .head().getSeq[String](0)

  test("whitespace analyzer splits on single spaces") {
    assert(tokensOf(Analyzer.Whitespace, "merge sort scan") ===
      Seq("merge", "sort", "scan"))
  }

  test("cjk analyzer emits overlapping character bigrams for space-free text") {
    assert(tokensOf(Analyzer.Cjk, "我爱北京天安门") ===
      Seq("我爱", "爱北", "北京", "京天", "天安", "安门"))
    // length-1 and empty degenerate to a single term
    assert(tokensOf(Analyzer.Cjk, "门") === Seq("门"))
    assert(tokensOf(Analyzer.Cjk, "") === Seq(""))
  }

  test("cjk analyzer keeps whitespace behavior for spaced text") {
    assert(tokensOf(Analyzer.Cjk, "merge sort") === Seq("merge", "sort"))
    assert(tokensOf(Analyzer.Cjk, "北京 上海") === Seq("北京", "上海"))
  }

  test("synonym stage expands matched tokens in place, keeps the original") {
    val syn = Analyzer.SynonymExpanded(Analyzer.Whitespace,
      Seq("quick" -> Seq("fast", "speedy"), "combine" -> Seq("merge")))
    assert(tokensOf(syn, "a quick combine pass") ===
      Seq("a", "quick", "fast", "speedy", "combine", "merge", "pass"))
    // unmapped text is untouched
    assert(tokensOf(syn, "merge sort") === Seq("merge", "sort"))
    // composes with other stages (lowercase runs first here)
    val chained = Analyzer.SynonymExpanded(
      Analyzer.Lowercased(Analyzer.Whitespace), Seq("quick" -> Seq("fast")))
    assert(tokensOf(chained, "QUICK scan") === Seq("quick", "fast", "scan"))
  }

  test("expandQuery turns terms into OR groups; unmapped terms stay singleton") {
    assert(Analyzer.expandQuery(Seq("quick", "scan"),
      Seq("quick" -> Seq("fast"))) === Seq(Seq("quick", "fast"), Seq("scan")))
    // duplicate synonyms collapse
    assert(Analyzer.expandQuery(Seq("quick"),
      Seq("quick" -> Seq("quick", "fast"))) === Seq(Seq("quick", "fast")))
  }

  test("index-time synonym expansion makes postings match the synonym term") {
    val docs = Seq((0L, "the quick scan"), (1L, "plain merge")).toDF("doc_id", "text")
    val post = Index.postings(docs,
      Analyzer.SynonymExpanded(Analyzer.Whitespace, Seq("quick" -> Seq("fast"))))
    val fastDocs = post.filter(col("tok") === "fast")
      .select(explode(col("ids"))).collect().map(_.getLong(0)).toSeq
    assert(fastDocs === Seq(0L))
  }

  test("search over a CJK corpus via the seam finds bigram terms") {
    val zh = Seq(
      (0L, "我爱北京天安门"),
      (1L, "上海欢迎你"),
      (2L, "北京欢迎你")).toDF("doc_id", "text")
    val hits = zh.filter(array_contains(Analyzer.Cjk.tokens(col("text")), "北京"))
      .select("doc_id").as[Long].collect().sorted
    assert(hits === Array(0L, 2L))
    // postings through the seam carry the same terms
    val p = Index.postings(zh, Analyzer.Cjk)
      .filter(col("tok") === "欢迎").head()
    assert(p.getSeq[Long](1).sorted === Seq(1L, 2L))
  }

  test("analyzer chain stages compose: tokenize → lowercase → stop (text_general)") {
    val chain = Analyzer.textGeneral(Seq("the", "a"))
    assert(tokensOf(chain, "The Quick fox a THE") === Seq("quick", "fox"))
    // stages are independent: lowercase alone keeps stopwords
    assert(tokensOf(Analyzer.Lowercased(Analyzer.Whitespace), "The Quick") ===
      Seq("the", "quick"))
    // chain composes over ANY tokenizer, including the CJK one
    val cjkStop = Analyzer.StopFiltered(Analyzer.Cjk, Seq("北京"))
    assert(tokensOf(cjkStop, "我爱北京天安门") ===
      Seq("我爱", "爱北", "京天", "天安", "安门"))
    // search through a chained analyzer matches case-insensitively
    val df = Seq((0L, "Merge SORT"), (1L, "scan only")).toDF("doc_id", "text")
    val hits = df.filter(array_contains(
        Analyzer.textGeneral(Seq("the")).tokens(col("text")), "merge"))
      .select("doc_id").as[Long].collect()
    assert(hits === Array(0L))
  }

  test("the default analyzer leaves the fixture pipeline unchanged") {
    // Graft.search with the default tokenizer must equal the raw split
    // formulation on real fixture data.
    val g = Graft(spark, "/root/testdata/sf0.001")
    val viaSeam = g.search(all = Seq("merge")).select("doc_id").as[Long].collect().sorted
    val raw = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(array_contains(split(col("text"), " "), "merge"))
      .select("doc_id").as[Long].collect().sorted
    assert(viaSeam === raw && viaSeam.nonEmpty)
  }
}
