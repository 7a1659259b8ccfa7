package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** How text becomes terms — the seam the pre-defined Solr schema's
  * analyzer chain occupies in the reference ("提前定制好schemal",
  * /root/reference/README.md:33): the reference is a Chinese-language
  * system whose tokenization is configured in Solr, not hard-coded.
  * Implementations are pure Column expressions (codegen'd built-ins, no
  * UDFs), so every consumer keeps whole-stage codegen and the DuckDB
  * oracle-checkability of the term pipeline.
  */
trait Tokenizer {
  def name: String

  /** Tokenize a text column into `ARRAY<STRING>` terms. */
  def tokens(text: Column): Column
}

object Analyzer {

  /** Whitespace analyzer — the corpus default (the fixture corpus is
    * space-delimited; Solr's WhitespaceTokenizer shape). */
  case object Whitespace extends Tokenizer {
    val name = "whitespace"
    def tokens(text: Column): Column = split(text, " ")
  }

  /** Overlapping character bigrams — the standard CJK indexing unit
    * (Lucene's CJKAnalyzer emits exactly these for han runs). Texts of
    * length ≤ 1 yield the text itself as the single term.
    *
    * Implementation note: `substr(i, 2)` per position is O(len) PER CALL
    * on UTF8 strings (variable-width seek), turning the per-row analyzer
    * into O(len²) — measured 18 s for the corpus pass at sf0.1. Splitting
    * into a char array once and zipping it with its own tail is O(len):
    * `zip_with` evaluates its two slice children once per row, and the
    * lambda touches array elements only (0.25 s for the same pass). */
  private def bigrams(text: Column): Column = {
    val chars = split(text, "")
    when(length(text) <= 1, array(text))
      .otherwise(zip_with(
        slice(chars, lit(1), length(text) - 1),
        slice(chars, lit(2), length(text) - 1),
        (a, b) => concat(a, b)))
  }

  /** CJK-safe analyzer: text containing whitespace tokenizes by
    * whitespace; space-free text (the shape of Chinese/Japanese prose — a
    * real migration of the reference system hits this on day one) falls
    * back to character bigrams. The per-row branch is a codegen'd
    * conditional, so mixed corpora pay no second scan. */
  case object Cjk extends Tokenizer {
    val name = "cjk"
    def tokens(text: Column): Column =
      when(text.contains(" "), Whitespace.tokens(text)).otherwise(bigrams(text))
  }

  /** Lowercase filter stage — Solr's LowerCaseFilterFactory, the second
    * stage of the reference schema's text_general chain, composed over any
    * tokenizer. Still a pure Column expression: the transform lambda is
    * codegen'd per element. */
  final case class Lowercased(inner: Tokenizer) extends Tokenizer {
    val name = s"lowercased(${inner.name})"
    def tokens(text: Column): Column = transform(inner.tokens(text), lower(_))
  }

  /** Stopword filter stage — Solr's StopFilterFactory. Drops exact matches
    * against the (small, broadcast-as-literal) stopword list. */
  final case class StopFiltered(inner: Tokenizer, stopwords: Seq[String]) extends Tokenizer {
    require(stopwords.nonEmpty, "stopword filter needs at least one stopword")
    val name = s"stopfiltered(${inner.name})"
    def tokens(text: Column): Column = {
      val stops = array(stopwords.map(lit): _*)
      filter(inner.tokens(text), t => !array_contains(stops, t))
    }
  }

  /** Synonym-expansion stage — Solr's SynonymGraphFilterFactory, the
    * stage the reference schema's text_general deployment story routinely
    * includes (the pre-defined Solr schema, /root/reference/README.md:33):
    * each emitted token expands to itself plus its mapped synonyms, so a
    * doc saying "quick" is indexed (or a query asks) under "fast" too.
    * The map is analyzer CONFIG — small, literal-compiled into the plan
    * (Solr ships it as synonyms.txt, the same bounded-config shape) — and
    * the expansion is a codegen'd flatten∘transform: still a pure Column
    * expression, no UDF, no join. Index-time use composes it into the
    * chain; query-time use calls [[Analyzer.expandQuery]] on the (driver-
    * side literal) query terms instead, which leaves the index unchanged
    * — Solr's recommended deployment — and turns each query term into an
    * OR group. */
  final case class SynonymExpanded(inner: Tokenizer,
                                   synonyms: Seq[(String, Seq[String])]) extends Tokenizer {
    require(synonyms.nonEmpty, "synonym stage needs at least one mapping")
    require(synonyms.map(_._1).distinct.size == synonyms.size,
      "synonym map keys must be unique (merge multi-row mappings first)")
    val name = s"synonyms(${inner.name})"
    def tokens(text: Column): Column = {
      val m = map(synonyms.flatMap { case (k, vs) =>
        Seq(lit(k), array(vs.map(lit): _*)) }: _*)
      val none = expr("CAST(array() AS ARRAY<STRING>)")
      flatten(transform(inner.tokens(text),
        t => concat(array(t), coalesce(element_at(m, t), none))))
    }
  }

  /** Query-time synonym expansion: each query term becomes the OR group
    * {term} ∪ synonyms(term). Driver-side (query terms are literals) —
    * the index stays unexpanded, matching Solr's query-time synonym
    * deployment. */
  def expandQuery(terms: Seq[String],
                  synonyms: Seq[(String, Seq[String])]): Seq[Seq[String]] = {
    val m = synonyms.toMap
    terms.map(t => (t +: m.getOrElse(t, Nil)).distinct)
  }

  /** The reference schema's likely analyzer chain for latin text
    * (text_general: tokenize → lowercase → stop), assembled from the
    * stages above — demonstrates chain composition; pass your own
    * stopword list for a real corpus. */
  def textGeneral(stopwords: Seq[String]): Tokenizer =
    StopFiltered(Lowercased(Whitespace), stopwords)

  /** Default binding for the fixture corpus; every `SparkEntry` query pins
    * this (its expression is byte-identical to the previous hard-coded
    * `split(text, ' ')`, so the oracles are unchanged). */
  val default: Tokenizer = Whitespace

  /** Resolve a tokenizer from its pinned `_tokenizer` marker name — the
    * inverse of `Tokenizer.name` for the SELF-CONTAINED analyzers. Only
    * those are resolvable: a compound chain (`stopfiltered(…)`) carries
    * configuration its name does not (the stopword list), so marker-driven
    * operations (auto-rescale) must refuse it and make the operator pass
    * the real tokenizer instead of silently rebuilding stats with a
    * look-alike. */
  def named(name: String): Option[Tokenizer] = name match {
    case Whitespace.name => Some(Whitespace)
    case Cjk.name        => Some(Cjk)
    case _               => None
  }
}
